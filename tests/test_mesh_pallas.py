"""Pallas path-DP inside the mesh shard_map (VERDICT r2 item 9: the
kernel was a parked env-gated branch forced off under meshes).  On the
CPU mesh the kernel runs in interpret mode — slow, so the workload is
tiny — and must classify identically to the XLA DP flow."""

import os

import numpy as np
import pytest

from metabuli_work_tpu.index.builder import IndexBuilder
from tests.tests_helpers_tax import make_flat_tax

rng = np.random.default_rng(77)


@pytest.fixture(scope="module")
def setup():
    tax = make_flat_tax()
    g1 = "".join(rng.choice(list("ACGT"), 6000))
    g2 = "".join(rng.choice(list("ACGT"), 6000))
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    builder.add_sequence(g1, 3)
    builder.add_sequence(g2, 4)
    index = builder.finalize()
    reads = []
    for i in range(8):
        g = g1 if i % 2 == 0 else g2
        s = int(rng.integers(0, len(g) - 151))
        reads.append((f"r{i}", g[s:s + 150]))
    return index, reads


def _run(index, reads, pallas: bool):
    import jax

    from metabuli_work_tpu.classify.pipeline import (Classifier,
                                                     ClassifyParams)
    from metabuli_work_tpu.parallel.sharding import make_mesh

    os.environ["METABULI_DP_PALLAS"] = "1" if pallas else "0"
    try:
        mesh = make_mesh(min(4, len(jax.devices())))
        params = ClassifyParams(seq_mode=1, min_score=0.005,
                                min_sp_score=0.005, batch_size=8)
        clf = Classifier.from_memory(index, params, mesh=mesh)
        if pallas:
            assert clf._dp_pallas and clf._pallas_interpret
        out = {}
        for q in clf.classify_batch([n for n, _ in reads],
                                    [s for _, s in reads]):
            r = q.result
            out[q.name] = (bool(r.is_classified), int(r.classification),
                           float(np.float32(r.score)))
        return out
    finally:
        del os.environ["METABULI_DP_PALLAS"]


def test_mesh_pallas_dp_equals_xla(setup):
    index, reads = setup
    want = _run(index, reads, pallas=False)
    assert sum(1 for v in want.values() if v[0]) >= 6
    got = _run(index, reads, pallas=True)
    assert got == want, {k: (got[k], want[k])
                         for k in want if got[k] != want[k]}
