"""Tests: input validation, .mtbl codec, unique-kmer DB."""

import numpy as np

from metabuli_work_tpu.index.delta import decode_metamer_deltas, encode_metamer_deltas
from metabuli_work_tpu.io.validate import validate_fasta, validate_fastq

rng = np.random.default_rng(23)


def test_validate_fasta(tmp_path):
    ok_f = tmp_path / "ok.fna"
    ok_f.write_text(">a\nACGT\nACGT\n>b\nTTTT\n")
    assert validate_fasta(str(ok_f))[0]

    bad1 = tmp_path / "b1.fna"
    bad1.write_text("ACGT\n>a\nACGT\n")
    ok, msg = validate_fasta(str(bad1))
    assert not ok and "before first header" in msg

    bad2 = tmp_path / "b2.fna"
    bad2.write_text(">a\nACGT\n>a\nTTTT\n")
    ok, msg = validate_fasta(str(bad2))
    assert not ok and "duplicate" in msg

    bad3 = tmp_path / "b3.fna"
    bad3.write_text(">a\n>b\nACGT\n")
    assert not validate_fasta(str(bad3))[0]

    bad4 = tmp_path / "b4.fna"
    bad4.write_text(">a\nAC#T\n")
    ok, msg = validate_fasta(str(bad4))
    assert not ok and "invalid characters" in msg


def test_validate_fastq(tmp_path):
    ok_f = tmp_path / "ok.fq"
    ok_f.write_text("@r1\nACGT\n+\nIIII\n@r2\nTT\n+\nII\n")
    assert validate_fastq(str(ok_f))[0]

    bad = tmp_path / "bad.fq"
    bad.write_text("@r1\nACGT\n+\nIII\n")
    ok, msg = validate_fastq(str(bad))
    assert not ok and "quality length" in msg


def test_mtbl_roundtrip():
    n = 5000
    metamers = np.sort(rng.integers(0, 2**63, n, dtype=np.uint64))
    ids = rng.integers(0, 2**30, n, dtype=np.uint64)
    # joint (metamer, id) stream must be nondecreasing in 96-bit space
    order = np.lexsort((ids, metamers))
    metamers, ids = metamers[order], ids[order]
    chunks = encode_metamer_deltas(metamers, ids)
    m2, i2 = decode_metamer_deltas(chunks)
    assert np.array_equal(m2, metamers)
    assert np.array_equal(i2, ids.astype(np.uint32))


def test_mtbl_carry_case():
    # id wraps past 2^30 between entries with equal metamer -> carry logic
    metamers = np.array([5, 5, 6], dtype=np.uint64)
    ids = np.array([2**30 - 2, 2**30 - 1, 1], dtype=np.uint64)
    chunks = encode_metamer_deltas(metamers, ids)
    m2, i2 = decode_metamer_deltas(chunks)
    assert m2.tolist() == [5, 5, 6]
    assert i2.tolist() == [2**30 - 2, 2**30 - 1, 1]


def test_unique_kmer_db(tmp_path):
    from metabuli_work_tpu.uniref.db import build_unique_kmer_db

    aas = "ARNDCQEGHILKMFPSTWYV"
    shared = "".join(rng.choice(list(aas), size=40))
    p1 = shared + "".join(rng.choice(list(aas), size=30))
    p2 = shared + "".join(rng.choice(list(aas), size=30))
    fasta = tmp_path / "p.fna"
    fasta.write_text(f">P1\n{p1}\n>P2\n{p2}\n")
    vals, ids = build_unique_kmer_db(str(tmp_path / "udb"), str(fasta))
    # k-mers of the shared prefix must be absent
    from metabuli_work_tpu.ops.encode_aa import extract_protein_kmers

    km_shared, _ = extract_protein_kmers(shared)
    assert not np.isin(km_shared, vals).any()
    # unique tails present with correct ids
    km1, _ = extract_protein_kmers(p1[45:])
    hit = np.isin(km1, vals)
    assert hit.mean() > 0.9
    idx = np.searchsorted(vals, km1[hit])
    assert set(ids[idx].tolist()) == {0}
