"""Legacy (kmerFormat 1) extraction vs a naive scalar oracle.

Oracle simulates OldMetamerScanner semantics directly (reference
KmerScanner.h:120-182): forward frames read codons from seqEnd leftward
in normal orientation; reverse frames read reverse-complemented codons
from seqStart rightward; AA part packs base-21 big-endian in scan order.
"""

import numpy as np
import pytest

from naive_oracle import codon_info, max_covered, revcomp

rng = np.random.default_rng(17)


def naive_old_frame(seq, begin, used_len, forward):
    k = 8
    aa_len = used_len // 3
    seq_end = begin + used_len - 1
    out = []
    for w in range(aa_len - k + 1):
        aa_part = 0
        dna_part = 0
        ok = True
        for j in range(k):
            if forward:
                ci = seq_end - (w + j) * 3
                c3 = seq[ci - 2:ci + 1]
            else:
                ci = begin + (w + j) * 3
                c3 = revcomp(seq[ci:ci + 3])
            info = codon_info(c3)
            if info is None:
                ok = False
                break
            aa_part = aa_part * 21 + info[0]
            dna_part = (dna_part << 3) | info[1]
        if not ok:
            continue
        val = ((aa_part << 24) | (dna_part & 0xFFFFFF)) & 0xFFFFFFFFFFFFFFFF
        pos = seq_end - (w + k) * 3 + 1 if forward else begin + 3 * w
        out.append((val, pos))
    return out


def naive_old_six_frames(seq):
    L = len(seq)
    used = max_covered(L)
    out = []
    if used < 24:
        return out
    for frame in range(6):
        fwd = frame < 3
        begin = frame % 3 if fwd else (L % 3 - frame % 3) % 3
        for val, pos in naive_old_frame(seq, begin, used, fwd):
            out.append((val, pos, frame))
    return out


@pytest.mark.parametrize("length", [30, 150, 151, 152, 200])
@pytest.mark.parametrize("with_n", [False, True])
def test_jax_old_format_matches_naive(length, with_n):
    import jax.numpy as jnp

    from metabuli_work_tpu.ops import encode_jax

    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    seqs = ["".join(rng.choice(list(alpha), size=length, p=p)) for _ in range(3)]
    lmax = 96 * -(-length // 96)
    arr = np.full((3, lmax), ord("N"), dtype=np.uint8)
    lens = np.full(3, length, dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, :length] = np.frombuffer(s.encode(), dtype=np.uint8)

    kmers, pos, valid = encode_jax.extract_batch(
        jnp.asarray(arr), jnp.asarray(lens), kmer_format=1)
    kmers, pos, valid = np.asarray(kmers), np.asarray(pos), np.asarray(valid)
    for i, s in enumerate(seqs):
        want = sorted(naive_old_six_frames(s))
        got = []
        for f in range(6):
            sel = valid[i, f]
            got.extend(zip(kmers[i, f][sel].tolist(), pos[i, f][sel].tolist(),
                           [f] * int(sel.sum())))
        assert sorted(got) == want, f"read {i}"


def test_classify_old_format_db(tmp_path):
    """End-to-end: classify against a kmerFormat-1 (legacy encoding) DB."""
    import jax.numpy as jnp

    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.index.format import KmerIndex, save_index
    from metabuli_work_tpu.ops import encode_jax
    from metabuli_work_tpu.taxonomy import Taxonomy

    # taxonomy
    parent = np.array([0, 1, 1, 2, 2])
    rank_idx = np.array([0, 0, 1, 2, 2])
    tax = Taxonomy(parent, rank_idx, np.arange(5),
                   ["no rank", "genus", "species"],
                   ["unclassified", "root", "G", "SpA", "SpB"],
                   np.array([0, 1, 10, 11, 21]))

    # build an old-encoding index from two genomes (extract with format 1)
    genomes = {3: "".join(rng.choice(list("ACGT"), size=6000)),
               4: "".join(rng.choice(list("ACGT"), size=6000))}
    values, taxids = [], []
    for tid, g in genomes.items():
        lmax = 96 * -(-len(g) // 96)
        arr = np.full((1, lmax), ord("N"), np.uint8)
        arr[0, :len(g)] = np.frombuffer(g.encode(), np.uint8)
        km, _, val = encode_jax.extract_batch(
            jnp.asarray(arr), jnp.asarray(np.array([len(g)], np.int32)), kmer_format=1)
        km = np.asarray(km)[np.asarray(val)]
        values.append(np.unique(km))
        taxids.append(np.full(len(values[-1]), tid, np.int32))
    v = np.concatenate(values)
    t = np.concatenate(taxids)
    order = np.lexsort((t, v))
    v, t = v[order], t[order]
    keep = np.ones(len(v), bool)
    keep[1:] = (v[1:] != v[:-1]) | (t[1:] != t[:-1])
    index = KmerIndex(v[keep], t[keep], t[keep], tax,
                      {"kmer_format": 1, "syncmer": False, "smer_len": 5})
    db = tmp_path / "olddb"
    save_index(str(db), index)

    reads = tmp_path / "r.fna"
    with open(reads, "w") as f:
        for i in range(10):
            tid = 3 if i % 2 == 0 else 4
            g = genomes[tid]
            s = int(rng.integers(0, len(g) - 150))
            f.write(f">old{i}\n{g[s:s+150]}\n")

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5, batch_size=8)
    clf = Classifier(str(db), params)
    assert clf.kmer_format == 1
    res = clf.classify_file(str(reads))
    ok = sum(1 for i, q in enumerate(res)
             if q.result.is_classified
             and q.result.classification == (3 if i % 2 == 0 else 4))
    assert ok >= 9, f"only {ok}/10 correct against old-format DB"
