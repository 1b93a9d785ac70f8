"""Syncmer window compaction (encode_jax.compact_windows + dyn_gap DP).

The compacted pipeline must classify identically to the uncompacted one
(win_frac=256) and to the host-DP pipeline (itself pinned to the scalar
reference semantics).  Also covers the window-overflow retry: a
low-complexity read keeps EVERY window (the anchor rule degenerates on
repeats), overflowing the compacted width.
"""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import IndexBuilder
from metabuli_work_tpu.taxonomy import Taxonomy


def _mini_tax(n_species):
    parent = [0, 1]
    rank_idx, name_idx = [0, 0], [0, 0]
    rank_pool = ["no rank", "species"]
    name_pool = ["root"]
    int2orig = [0, 1]
    for i in range(n_species):
        parent.append(1)
        rank_idx.append(1)
        name_pool.append(f"S{i}")
        name_idx.append(1 + i)
        int2orig.append(100 + i)
    return Taxonomy(np.array(parent), np.array(rank_idx), np.array(name_idx),
                    rank_pool, name_pool, np.array(int2orig))


@pytest.fixture(scope="module")
def syncmer_setup():
    rng = np.random.default_rng(5)
    tax = _mini_tax(3)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    builder = IndexBuilder(tax, syncmer=True, mask_mode=0)
    genomes = []
    for i in range(3):
        g = rng.choice(acgt, size=20000).tobytes().decode()
        genomes.append(g)
        builder.add_sequence(g, 2 + i)
    index = builder.finalize()

    reads = []
    for i in range(64):
        g = genomes[i % 3]
        s = int(rng.integers(0, len(g) - 150))
        reads.append(g[s:s + 150])
    # low-complexity reads: anchor rule keeps every window -> must trip
    # the window-overflow retry instead of dropping matches
    reads.append("ACG" * 50)
    reads.append("A" * 150)
    arr = np.full((len(reads), 150), ord("N"), dtype=np.uint8)
    lens = np.zeros(len(reads), dtype=np.int32)
    for i, r in enumerate(reads):
        b = r.encode()
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    return index, arr, lens


def _classify(index, arr, lens, win_frac=None, host_dp=False):
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=len(arr))
    clf = Classifier.from_memory(index, params)
    assert clf.syncmer
    if win_frac is not None:
        clf._win_frac = win_frac
    if host_dp:
        clf.use_device_dp = False
    names = [f"r{i}" for i in range(len(arr))]
    res = clf.classify_batch_arrays(names, arr, lens)
    return [(q.result.is_classified, q.result.classification,
             round(q.result.score, 6)) for q in res]


def test_compaction_matches_uncompacted(syncmer_setup):
    index, arr, lens = syncmer_setup
    compact = _classify(index, arr, lens, win_frac=184)
    full = _classify(index, arr, lens, win_frac=256)
    assert compact == full


def test_compaction_matches_host_dp(syncmer_setup):
    index, arr, lens = syncmer_setup
    compact = _classify(index, arr, lens, win_frac=184)
    host = _classify(index, arr, lens, host_dp=True)
    assert compact == host
    assert sum(1 for c, _, _ in compact if c) >= 64  # genome reads classify


def test_overflow_retry_widens(syncmer_setup):
    index, arr, lens = syncmer_setup
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=len(arr))
    clf = Classifier.from_memory(index, params)
    clf._win_frac = 64  # far below the anchor density: every batch overflows
    names = [f"r{i}" for i in range(len(arr))]
    res = clf.classify_batch_arrays(names, arr, lens)
    assert clf._win_frac > 64  # retry widened the estimate
    got = [(q.result.is_classified, q.result.classification,
            round(q.result.score, 6)) for q in res]
    assert got == _classify(index, arr, lens, win_frac=256)


def test_compact_windows_op():
    import jax.numpy as jnp

    from metabuli_work_tpu.ops.encode_jax import compact_windows

    rng = np.random.default_rng(0)
    B, F, W = 3, 6, 17
    km = rng.integers(0, 1 << 60, size=(B, F, W), dtype=np.uint64)
    pos = rng.integers(0, 300, size=(B, F, W)).astype(np.int32)
    val = rng.random((B, F, W)) < 0.5
    w_c = int(val.sum(axis=-1).max())
    kc, pc, vc, over = compact_windows(jnp.asarray(km), jnp.asarray(pos),
                                       jnp.asarray(val), w_c)
    assert int(over) == 0
    kc, pc, vc = np.asarray(kc), np.asarray(pc), np.asarray(vc)
    for b in range(B):
        for f in range(F):
            sel = val[b, f]
            n = int(sel.sum())
            assert vc[b, f, :n].all() and not vc[b, f, n:].any()
            assert (kc[b, f, :n] == km[b, f][sel]).all()
            assert (pc[b, f, :n] == pos[b, f][sel]).all()
    # overflow counting
    _, _, _, over2 = compact_windows(jnp.asarray(km), jnp.asarray(pos),
                                     jnp.asarray(val), max(w_c - 2, 1))
    assert int(over2) > 0
