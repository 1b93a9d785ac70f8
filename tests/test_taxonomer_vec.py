"""VectorTaxonomer must produce bit-identical results to the scalar Taxonomer."""

import numpy as np
import pytest

from metabuli_work_tpu.classify.taxonomer import MATCH_DTYPE, Taxonomer, sort_matches
from metabuli_work_tpu.classify.taxonomer_vec import VectorTaxonomer
from metabuli_work_tpu.taxonomy import Taxonomy

rng = np.random.default_rng(99)


def make_tax():
    # root(1) -> superkingdom(2) -> genera(3,4) -> species(5..10) -> strains(11..16)
    parent = [0, 1, 1, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 7, 8, 9, 10]
    rank = ["no rank", "no rank", "superkingdom", "genus", "genus"] + ["species"] * 6 + ["strain"] * 6
    rank_pool = sorted(set(rank))
    rank_idx = [rank_pool.index(r) for r in rank]
    name_pool = [f"n{i}" for i in range(len(parent))]
    int2orig = list(range(0, len(parent)))
    return Taxonomy(np.array(parent), np.array(rank_idx), np.arange(len(parent)),
                    rank_pool, name_pool, np.array(int2orig))


def random_matches(tax, n_reads=20, seed=0):
    """Generate structured random matches: chains of consecutive k-mers
    (consistent dna codes) plus noise."""
    r = np.random.default_rng(seed)
    rows = []
    for rid in range(1, n_reads + 1):
        for sp in r.choice([5, 6, 7, 8, 9, 10], size=r.integers(1, 4), replace=False):
            strain = int(sp) + 6
            for frame in r.choice(6, size=r.integers(1, 3), replace=False):
                # one chain of consecutive matches
                chain_len = int(r.integers(1, 12))
                pos0 = int(r.integers(0, 60)) * 3 + (frame % 3)
                dna_seq = r.integers(0, 8, size=chain_len + 8)
                for j in range(chain_len):
                    dna = 0
                    for c in range(8):
                        dna = (dna << 3) | int(dna_seq[j + c])
                    rows.append((
                        rid, pos0 + 3 * j, frame,
                        int(r.choice([sp, strain])), int(sp),
                        dna, int(r.integers(0, 2**16)), int(r.integers(0, 5)),
                    ))
                # noise matches at random positions
                for _ in range(int(r.integers(0, 3))):
                    rows.append((
                        rid, (int(r.integers(0, 60)) * 3 + frame % 3), frame,
                        int(sp), int(sp),
                        int(r.integers(0, 2**24)), int(r.integers(0, 2**16)),
                        int(r.integers(0, 8)),
                    ))
    m = np.zeros(len(rows), dtype=MATCH_DTYPE)
    for i, (qid, pos, frame, taxid, sp, dna, rh, ham) in enumerate(rows):
        m[i] = (qid, pos, frame, taxid, sp, dna, rh, ham)
    return sort_matches(m)


def compare_results(a, b, i):
    assert a.is_classified == b.is_classified, f"read {i}: classified {a.is_classified} vs {b.is_classified}"
    assert a.classification == b.classification, f"read {i}: taxid {a.classification} vs {b.classification}"
    assert np.float32(a.score) == np.float32(b.score), f"read {i}: score {a.score} vs {b.score}"
    assert a.tax_cnt == b.tax_cnt, f"read {i}: tax_cnt"
    assert a.top_species == b.top_species, f"read {i}: top_species"
    assert a.species_scores == b.species_scores, f"read {i}: species_scores"


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("em", [False, True])
def test_vec_equals_scalar(seed, em):
    tax = make_tax()
    kwargs = dict(kmer_format=2, seq_mode=1, min_score=0.05, min_sp_score=0.3, em=em)
    scalar = Taxonomer(tax, **kwargs)
    vec = VectorTaxonomer(tax, **kwargs)

    n_reads = 25
    m = random_matches(tax, n_reads=n_reads, seed=seed)
    qlens = np.full(n_reads + 1, 150)

    bounds = np.searchsorted(m["qid"].astype(np.int64), np.arange(1, n_reads + 2))
    expected = []
    for i in range(n_reads):
        mm = m[bounds[i]:bounds[i + 1]]
        from metabuli_work_tpu.classify.taxonomer import ReadResult
        expected.append(scalar.classify_read(mm, 150) if len(mm) else ReadResult())

    got = vec.classify_batch(m, qlens, n_reads)
    for i in range(n_reads):
        compare_results(expected[i], got[i], i)


@pytest.mark.parametrize("syncmer", [False, True])
def test_vec_equals_scalar_syncmer(syncmer):
    tax = make_tax()
    kwargs = dict(kmer_format=2, seq_mode=1, min_score=0.0, min_sp_score=0.0,
                  syncmer=syncmer, smer_len=5)
    scalar = Taxonomer(tax, **kwargs)
    vec = VectorTaxonomer(tax, **kwargs)
    n_reads = 15
    m = random_matches(tax, n_reads=n_reads, seed=123)
    qlens = np.full(n_reads + 1, 150)
    bounds = np.searchsorted(m["qid"].astype(np.int64), np.arange(1, n_reads + 2))
    from metabuli_work_tpu.classify.taxonomer import ReadResult
    for i, got in enumerate(vec.classify_batch(m, qlens, n_reads)):
        mm = m[bounds[i]:bounds[i + 1]]
        want = scalar.classify_read(mm, 150) if len(mm) else ReadResult()
        compare_results(want, got, i)
