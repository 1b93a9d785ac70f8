"""Pipeline-level equality: METABULI_TWO_TIER classify == default.

The two-tier candidate window (docs/PERF_NOTES.md lever 1) gathers a
1-block window for every query plus a compacted side gather for the
rare long-run queries; per-read classifications must be bit-identical
to the single-tier probe.  The DB here is 8 mutated copies of one
genome under different species, which produces AA runs well beyond 4
entries (the regime where the tiers actually diverge in work done).
"""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import IndexBuilder
from metabuli_work_tpu.taxonomy import Taxonomy


def _fixture(n_species=8, glen=20000, n_reads=64, seed=17):
    rng = np.random.default_rng(seed)
    parent = [0, 1, 1] + [2] * n_species
    rank = ["no rank", "no rank", "genus"] + ["species"] * n_species
    pool = sorted(set(rank))
    n = len(parent)
    tax = Taxonomy(np.array(parent), np.array([pool.index(r) for r in rank]),
                   np.arange(n), pool, [f"n{i}" for i in range(n)],
                   np.arange(n))
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = acgt[rng.integers(0, 4, size=glen)]
    genomes = []
    for s in range(n_species):
        g = base.copy()
        mut = rng.random(glen) < 0.02      # ~98% identity: shared AA runs
        g[mut] = acgt[rng.integers(0, 4, size=int(mut.sum()))]
        gs = g.tobytes().decode()
        genomes.append(gs)
        builder.add_sequence(gs, 3 + s)
    index = builder.finalize()

    reads = np.zeros((n_reads, 150), dtype=np.uint8)
    for i in range(n_reads):
        g = genomes[i % n_species]
        st = int(rng.integers(0, len(g) - 150))
        reads[i] = np.frombuffer(g[st:st + 150].encode(), np.uint8)
    lens = np.full(n_reads, 150, np.int32)
    return index, reads, lens


def _run(index, reads, lens, monkeypatch, flag, wide="0"):
    # two-tier applies to the NARROW block layout; the wide 512-byte-row
    # probe supersedes it (pipeline._init_device_dp)
    monkeypatch.setenv("METABULI_WIDE_PROBE", wide)
    monkeypatch.setenv("METABULI_TWO_TIER", flag)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=len(reads))
    clf = Classifier.from_memory(index, params)
    names = [f"r{i}" for i in range(len(reads))]
    res = clf.drive_batches(iter([(names, reads, lens, None, None)]))
    return clf, [(q.result.is_classified, q.result.classification,
                  round(float(q.result.score), 6)) for q in res]


def test_two_tier_classify_identical(monkeypatch):
    index, reads, lens = _fixture()
    assert index.max_aa_run() > 4, "fixture must produce long AA runs"
    clf0, base = _run(index, reads, lens, monkeypatch, "0")
    clf1, two = _run(index, reads, lens, monkeypatch, "1")
    assert not getattr(clf0, "_two_tier", False)
    assert getattr(clf1, "_two_tier", False), \
        "flag must engage (requires the aligned block layout)"
    assert sum(1 for c, _, _ in base if c) > 0
    assert base == two


def test_wide_probe_classify_identical(monkeypatch):
    """512-byte-row wide probe (the default) == narrow block probe,
    per read, bit-identical — same bar as the two-tier equality."""
    index, reads, lens = _fixture()
    clf0, narrow = _run(index, reads, lens, monkeypatch, "0", wide="0")
    clfw, wide = _run(index, reads, lens, monkeypatch, "0", wide="1")
    assert not getattr(clf0, "_wide", False)
    assert getattr(clfw, "_wide", False), "wide probe must engage"
    assert clfw.db_quad.shape[1] == 128
    assert sum(1 for c, _, _ in narrow if c) > 0
    assert narrow == wide
