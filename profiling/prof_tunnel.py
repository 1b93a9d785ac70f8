"""Probe the axon tunnel's D2H characteristics (r5, VERDICT weak #2).

A jax.Array caches its host copy after the first fetch, so every
measurement here fetches a FRESH array produced by a jitted op.

Questions:
  1. blocking fetch cost vs payload size (RTT floor vs bandwidth slope)
  2. do N outstanding copy_to_host_async copies overlap (N RTTs or 1)?
  3. N small separate fetches vs one coalesced fetch
  4. does an async copy actually land in the background?
  5. fetch cost when the copy is enqueued BEHIND device compute

Run: python profiling/prof_tunnel.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

from metabuli_work_tpu.ops import _jax_setup  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

bump = jax.jit(lambda x, s: x + s)


def fresh(n_words, seed):
    """A new device array of n_words i32, uncached on host."""
    base = fresh.pool.get(n_words)
    if base is None:
        base = jnp.arange(n_words, dtype=jnp.int32)
        fresh.pool[n_words] = base
    return bump(base, seed)


fresh.pool = {}


def bench_fetch(nbytes, reps=5):
    ts = []
    for r in range(reps):
        x = fresh(nbytes // 4, r)
        x.block_until_ready()  # no-op on axon but harmless
        time.sleep(0.02)
        t0 = time.perf_counter()
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}")
    np.asarray(fresh(256, 999))  # warm compile

    print("\n## 1. blocking fetch cost vs size (fresh arrays)")
    for kb in (1, 16, 64, 147, 512, 1024, 4096):
        mn, md = bench_fetch(kb * 1024)
        bw = kb / 1024 / mn
        print(f"  {kb:5d} KB: min {mn*1e3:8.2f} ms  med {md*1e3:8.2f} ms"
              f"  ({bw*1e3:8.1f} MB/s at min)")

    print("\n## 2. async overlap: N x 147KB async started, then block all")
    for n in (1, 2, 4, 8):
        ts = []
        for r in range(5):
            xs = [fresh(147 * 256, 100 * r + i) for i in range(n)]
            time.sleep(0.02)
            t0 = time.perf_counter()
            for x in xs:
                x.copy_to_host_async()
            for x in xs:
                np.asarray(x)
            ts.append(time.perf_counter() - t0)
        print(f"  n={n}: min {min(ts)*1e3:8.2f} ms")

    print("\n## 3. 6 x 147KB separate fetches vs one 882KB concat")
    cat_f = jax.jit(lambda xs: jnp.concatenate(xs))
    ts_sep, ts_cat = [], []
    for r in range(5):
        xs = [fresh(147 * 256, 200 * r + i) for i in range(6)]
        time.sleep(0.02)
        t0 = time.perf_counter()
        for x in xs:
            np.asarray(x)
        ts_sep.append(time.perf_counter() - t0)
        xs = [fresh(147 * 256, 300 * r + i) for i in range(6)]
        cat = cat_f(xs)
        time.sleep(0.02)
        t0 = time.perf_counter()
        np.asarray(cat)
        ts_cat.append(time.perf_counter() - t0)
    print(f"  separate:  min {min(ts_sep)*1e3:8.2f} ms")
    print(f"  coalesced: min {min(ts_cat)*1e3:8.2f} ms")

    print("\n## 4. async then sleep then blocking asarray (147KB)")
    for sleep_ms in (0, 50, 300):
        ts = []
        for r in range(5):
            x = fresh(147 * 256, 400 + 10 * sleep_ms + r)
            x.copy_to_host_async()
            time.sleep(sleep_ms / 1e3)
            t0 = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        print(f"  sleep {sleep_ms:3d} ms -> blocking asarray min "
              f"{min(ts)*1e3:8.2f} ms")

    print("\n## 5. fetch of a result QUEUED BEHIND compute "
          "(nq heavy matmuls first)")
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a * 1e-3)
    np.asarray(mm(a)[0, :2])  # warm
    for nq in (0, 4, 16):
        ts = []
        for r in range(3):
            res = fresh(147 * 256, 500 + 10 * nq + r)
            q = a
            for _ in range(nq):
                q = mm(q)
            res2 = bump(res, 1)  # enqueued behind the matmuls
            time.sleep(0.02)
            t0 = time.perf_counter()
            np.asarray(res2)
            ts.append(time.perf_counter() - t0)
            np.asarray(q[0, :2])  # drain
        print(f"  queued={nq:2d}: dependent small fetch min "
              f"{min(ts)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
