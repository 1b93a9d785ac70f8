"""Cost of one [N]-indexed row gather vs ROW WIDTH on the real chip.

Hypothesis (from prof_fused_bisect + the chain A/B): XLA lowers a row
gather to a latency-serial per-index copy, so an op's cost is ~flat in
row width — gathering ONE 512 B row per query costs about the same as
one 64 B row, i.e. 8x the bytes for free.  If true, the probe should
re-block to wide rows: 1 hash gather + 1 candidate gather per query.

Timing: D2H-forced (block_until_ready is a no-op on axon).  NOTE: big
arrays must be ARGUMENTS of the jitted fns — closure capture bakes
them into the HLO as constants and lowering takes forever.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from metabuli_work_tpu.ops import _jax_setup  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 190_464
    TABLE_GB = 4
    R = TABLE_GB * (1 << 30) // 64          # rows of 16 x u32
    rng = np.random.default_rng(0)
    tbl = jax.device_put(
        rng.integers(0, 2**31, size=(R, 16), dtype=np.int32))
    idx = jax.device_put(
        rng.integers(0, R - 8, size=N, dtype=np.int32))
    print(f"# table {TABLE_GB} GiB ({R} rows x 64 B), N={N}", flush=True)

    def timeit(fn, n=16):
        r = fn()
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        np.asarray(r)
        return (time.perf_counter() - t0) / n * 1000

    @jax.jit
    def g1(t, i):
        return t[i].sum(dtype=jnp.int32)

    @jax.jit
    def g2(t, i):
        Rk = t.shape[0]
        return (t[i].sum(dtype=jnp.int32)
                + t[jnp.minimum(i + 1, Rk - 1)].sum(dtype=jnp.int32))

    @jax.jit
    def g4(t, i):
        Rk = t.shape[0]
        acc = jnp.int32(0)
        for k in range(4):
            acc += t[jnp.minimum(i + k, Rk - 1)].sum(dtype=jnp.int32)
        return acc

    ms4 = timeit(lambda: g4(tbl, idx))
    print(f"# rows  64 B: 4 ops {ms4:6.2f} ms", flush=True)
    del tbl
    # physically wide rows, packed host-side (an on-device reshape of a
    # tiled 4 GiB array forces a relayout copy and OOMs the chip)
    host = rng.integers(0, 2**31, size=(R, 16), dtype=np.int32)
    idx_h = np.asarray(idx)
    for k in (2, 4, 8):
        t_k = jax.device_put(host.reshape(R // k, 16 * k))
        i_k = jax.device_put((idx_h // k).astype(np.int32))
        ms1 = timeit(lambda tk=t_k, ik=i_k: g1(tk, ik))
        ms2 = timeit(lambda tk=t_k, ik=i_k: g2(tk, ik))
        print(f"# rows {64 * k:3d} B: 1 op {ms1:6.2f} ms, "
              f"2 ops {ms2:6.2f} ms", flush=True)
        del t_k


if __name__ == "__main__":
    main()
