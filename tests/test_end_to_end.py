"""End-to-end: build a mini-DB from synthetic genomes, classify sampled reads.

Synthetic analogue of BASELINE config 0 (single-genome mini-DB + simulated
reads): reads sampled from genome A must classify to species A, reads from
unrelated random sequence must stay unclassified.
"""

import os

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database
from metabuli_work_tpu.report import reporter

rng = np.random.default_rng(11)


def random_genome(n):
    return "".join(rng.choice(list("ACGT"), size=n))


def sample_read(genome, length=150):
    start = int(rng.integers(0, len(genome) - length))
    read = genome[start : start + length]
    if rng.random() < 0.5:
        comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
        read = "".join(comp[c] for c in reversed(read))
    return read


@pytest.fixture(scope="module")
def mini_db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("minidb")
    # taxonomy: two species in different genera
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [
        (1, 1, "no rank"), (2, 1, "superkingdom"),
        (10, 2, "genus"), (11, 10, "species"),
        (20, 2, "genus"), (21, 20, "species"),
    ]
    names = {1: "root", 2: "Bacteria", 10: "G1", 11: "Escherichia testi",
             20: "G2", 21: "Salmonella testi"}
    with open(d / "nodes.dmp", "w") as f:
        for tid, par, rank in nodes:
            f.write(f"{tid}\t|\t{par}\t|\t{rank}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for tid, nm in names.items():
            f.write(f"{tid}\t|\t{nm}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")

    genomes = {"ACC_A": (random_genome(12000), 11), "ACC_B": (random_genome(12000), 21)}
    fasta = tmp / "genomes.fna"
    with open(fasta, "w") as f:
        for acc, (seq, _) in genomes.items():
            f.write(f">{acc}\n{seq}\n")
    (tmp / "fastas.txt").write_text(str(fasta) + "\n")
    with open(tmp / "acc2taxid.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        for acc, (_, tid) in genomes.items():
            f.write(f"{acc}\t{acc}.1\t{tid}\t0\n")

    db_dir = tmp / "db"
    index = build_database(
        str(db_dir), str(tmp / "fastas.txt"), str(tmp / "acc2taxid.map"), str(d),
        mask_mode=0, write_reference_format=True,
    )
    assert index.size > 0
    return tmp, db_dir, genomes


def test_db_contents(mini_db):
    tmp, db_dir, genomes = mini_db
    from metabuli_work_tpu.index.format import import_reference_format, load_index

    index = load_index(str(db_dir))
    # sorted, unique per (value, species)
    assert np.all(np.diff(index.values.astype(np.uint64)) >= 0)
    pair = index.values.astype(np.uint64).astype(object) * 1000 + index.species.astype(object)
    assert len(set(pair.tolist())) == len(pair)
    # reference-format roundtrip matches the native arrays
    ref = import_reference_format(str(db_dir), index.taxonomy)
    assert np.array_equal(ref.values, index.values)
    assert np.array_equal(ref.taxids, index.taxids)


def test_classify_reads(mini_db):
    tmp, db_dir, genomes = mini_db
    reads_path = tmp / "reads.fna"
    truth = []
    with open(reads_path, "w") as f:
        for i in range(30):
            acc = "ACC_A" if i % 2 == 0 else "ACC_B"
            genome, tid = genomes[acc]
            f.write(f">read{i}\n{sample_read(genome)}\n")
            truth.append(tid)
        for i in range(30, 40):  # random reads: should be unclassified
            f.write(f">read{i}\n{random_genome(150)}\n")
            truth.append(0)

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5, batch_size=16)
    clf = Classifier(str(db_dir), params)
    results = clf.classify_file(str(reads_path))
    assert len(results) == 40

    tax = clf.taxonomy
    correct = 0
    for i, qr in enumerate(results):
        got = tax.orig_of(qr.result.classification) if qr.result.is_classified else 0
        if truth[i] == 0:
            assert got == 0, f"random read {i} classified to {got}"
        else:
            sp = tax.orig_of(tax.species_of(tax.to_internal(got))) if got else 0
            if sp == truth[i] or got == truth[i]:
                correct += 1
    assert correct >= 28, f"only {correct}/30 genome reads classified correctly"

    # reporting smoke test
    out = tmp / "out"
    cls_path, rpt_path, krona_path = reporter.write_all(str(out), "job", results, tax)
    assert os.path.getsize(cls_path) > 0
    lines = open(cls_path).read().splitlines()
    assert lines[0].startswith("#is_classified")
    assert len(lines) == 41
    rpt = open(rpt_path).read()
    assert "Escherichia testi" in rpt and "unclassified" in rpt


def test_classify_paired(mini_db):
    tmp, db_dir, genomes = mini_db
    g, tid = genomes["ACC_A"]
    r1 = tmp / "r1.fq"
    r2 = tmp / "r2.fq"
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(8):
            start = int(rng.integers(0, len(g) - 400))
            frag = g[start : start + 300]
            read1 = frag[:150]
            read2 = "".join(comp[c] for c in reversed(frag[-150:]))
            f1.write(f"@p{i}\n{read1}\n+\n{'I' * 150}\n")
            f2.write(f"@p{i}\n{read2}\n+\n{'I' * 150}\n")

    params = ClassifyParams(seq_mode=2, min_score=0.15, min_sp_score=0.5, batch_size=8)
    clf = Classifier(str(db_dir), params)
    results = clf.classify_file(str(r1), str(r2))
    assert len(results) == 8
    tax = clf.taxonomy
    ok = sum(
        1 for qr in results
        if qr.result.is_classified and tax.orig_of(tax.species_of(qr.result.classification)) == tid
    )
    assert ok >= 7
    assert all(qr.total_length == 300 for qr in results)
