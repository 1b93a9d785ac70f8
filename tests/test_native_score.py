"""Native hostscore.cpp vs numpy/scalar combine equivalence."""

import numpy as np
import pytest

from metabuli_work_tpu.classify import native_score, taxonomer_vec
from metabuli_work_tpu.classify.taxonomer import MatchPath, Taxonomer


pytestmark = pytest.mark.skipif(not native_score.available(),
                                reason="no native toolchain")


def _random_paths(rng, n_runs=200, max_k=12):
    cnts = rng.integers(1, max_k + 1, size=n_runs)
    starts = np.zeros(n_runs, dtype=np.int64)
    starts[1:] = np.cumsum(cnts)[:-1]
    n = int(cnts.sum())
    start = rng.integers(0, 120, size=n).astype(np.int64)
    length = rng.integers(24, 60, size=n)
    paths = {
        "start": start,
        "end": start + length,
        "score": (rng.random(n) * 60).astype(np.float32),
        "hamming": rng.integers(0, 8, size=n).astype(np.int64),
        "rh_start": rng.integers(0, 1 << 16, size=n).astype(np.int64),
        "rh_end": rng.integers(0, 1 << 16, size=n).astype(np.int64),
    }
    return paths, starts, cnts.astype(np.int64)


def test_native_matches_scalar_combine():
    rng = np.random.default_rng(7)
    paths, starts, cnts = _random_paths(rng)
    got = native_score.combine_paths_batch(paths, starts, cnts)

    tx = Taxonomer.__new__(Taxonomer)  # only _combine_paths is needed
    for r in range(len(starts)):
        a, k = int(starts[r]), int(cnts[r])
        plist = [MatchPath(start=int(paths["start"][j]), end=int(paths["end"][j]),
                           score=np.float32(paths["score"][j]),
                           hamming=int(paths["hamming"][j]), depth=0,
                           rh_start=int(paths["rh_start"][j]),
                           rh_end=int(paths["rh_end"][j]))
                 for j in range(a, a + k)]
        want = Taxonomer._combine_paths(tx, plist, 1)  # /1 keeps the raw sum
        assert np.float32(got[r]) == np.float32(want), r


def test_native_matches_numpy_combine():
    rng = np.random.default_rng(11)
    paths, starts, cnts = _random_paths(rng, n_runs=500, max_k=8)
    multi = cnts > 1
    got = native_score.combine_paths_batch(paths, starts[multi], cnts[multi])
    want = taxonomer_vec._combine_paths_batch(paths, starts[multi], cnts[multi])
    assert np.array_equal(got, want)


def test_count_pairs():
    rng = np.random.default_rng(3)
    rid = rng.integers(1, 50, size=4000).astype(np.int32)
    tax = rng.integers(1, 30, size=4000).astype(np.int32)
    u_rid, u_tax, u_cnt = native_score.count_pairs(rid, tax)
    key = rid.astype(np.int64) << 32 | tax.astype(np.int64)
    uniq, cnts = np.unique(key, return_counts=True)
    assert np.array_equal(u_rid.astype(np.int64) << 32 | u_tax.astype(np.int64), uniq)
    assert np.array_equal(u_cnt, cnts)
