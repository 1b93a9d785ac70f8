"""Traced gather cost model on the real TPU (xplane ground truth).

Establishes ns/index for XLA gathers as a function of row width, index
order, and index count — the design input for the probe layout
(candidate fetch + hash search are ~36 of the 39 ms fused step).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from metabuli_work_tpu.ops import _jax_setup  # noqa


def main():
    import jax
    import jax.numpy as jnp

    M, N = 9_745_109, 190_464
    rng = np.random.default_rng(0)
    tables = {
        "w4": jnp.asarray(rng.integers(0, 2**32, (M,), dtype=np.uint32)),
        "w16": jnp.asarray(rng.integers(0, 2**32, (M, 4), dtype=np.uint32)),
        "w64": jnp.asarray(rng.integers(0, 2**32, (M, 16), dtype=np.uint32)),
        "w128": jnp.asarray(rng.integers(0, 2**32, (M, 32), dtype=np.uint32)),
    }
    idx_rand = rng.integers(0, M - 64, N).astype(np.int32)
    idx_sort = np.sort(idx_rand)
    idxs = {"rand": jnp.asarray(idx_rand), "sort": jnp.asarray(idx_sort)}

    def g1(t, i):        # one row per index
        return t[i].sum(dtype=jnp.uint32)

    def g9(t, i):        # 9 consecutive rows per index (current probe)
        offs = jnp.arange(9, dtype=jnp.int32)[:, None]
        return t[jnp.clip(i[None, :] + offs, 0, M - 1)].sum(dtype=jnp.uint32)

    def g2blk(t, i):     # 2 block-aligned rows (8-row blocks): covers i..i+8
        b = i >> 3
        return (t[b].sum(dtype=jnp.uint32)
                + t[jnp.minimum(b + 1, (M >> 3) - 1)].sum(dtype=jnp.uint32))

    cases = []
    for tname, t in tables.items():
        for iname, i in idxs.items():
            cases.append((f"g1_{tname}_{iname}", g1, t, i))
    cases.append(("g9_w16_rand", g9, tables["w16"], idxs["rand"]))
    cases.append(("g9_w16_sort", g9, tables["w16"], idxs["sort"]))
    # block fetch: reshape w16 to [M/8, 128B] rows
    t128 = tables["w16"][: (M // 8) * 8].reshape(M // 8, 32)
    cases.append(("g2blk_128B_rand", g2blk, t128, idxs["rand"] >> 3))
    cases.append(("g2blk_128B_sort", g2blk, t128, idxs["sort"] >> 3))

    fns = {}
    for name, f, t, i in cases:
        fn = jax.jit(f)
        jax.block_until_ready(fn(t, i))      # compile
        fns[name] = (fn, t, i)

    with jax.profiler.trace("/tmp/trace_gather_model"):
        outs = []
        for name, (fn, t, i) in fns.items():
            for _ in range(4):
                outs.append(fn(t, i))
        jax.block_until_ready(outs)
    print("traced", len(fns), "cases x4 -> /tmp/trace_gather_model", flush=True)
    print("order:", list(fns.keys()), flush=True)


main()
