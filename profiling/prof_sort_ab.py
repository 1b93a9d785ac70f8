"""A/B the candidate rank sort implementations (r5, VERDICT #2).

Candidates: the current one-hot rank permutation (dp_jax.sort_candidates,
cap^2 broadcast compares + 3 masked-sum permutes), jax.lax.sort variadic
along the cap-major axis, and a Batcher odd-even sorting network with
payload swaps.  All three run inside one jit over the bench probe output
shape ([cap=16, ~190k]); D2H-forced timing per prof_fused_bisect.

Run: python profiling/prof_sort_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("METABULI_BENCH_NO_GOLDEN", "1")

import numpy as np  # noqa: E402

import bench as B  # noqa: E402

B._enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metabuli_work_tpu.ops import dp_jax  # noqa: E402

CAP = 16
N = 1024 * 6 * 31           # ~ bench lane count

I32 = jnp.int32


def _mk_inputs(seed):
    rng = np.random.default_rng(seed)
    sel = rng.random((CAP, N)) < 0.08
    ham = rng.integers(0, 90, size=(CAP, N)).astype(np.int32)
    dna = rng.integers(0, 1 << 24, size=(CAP, N)).astype(np.int32)
    species = rng.integers(1, 1 << 20, size=(CAP, N)).astype(np.int32)
    rh = rng.integers(0, 1 << 16, size=(CAP, N)).astype(np.int32)
    return (jax.device_put(sel), jax.device_put(ham), jax.device_put(dna),
            jax.device_put(species), jax.device_put(rh))


def fields_of(sel, ham, dna, species, rh):
    return {"sel": sel, "species": species, "dna": dna, "rh": rh,
            "ham": ham}


@jax.jit
def s_onehot(sel, ham, dna, species, rh):
    out = dp_jax.sort_candidates(fields_of(sel, ham, dna, species, rh),
                                 sel, ham, dna)
    return sum(v.sum(dtype=I32) for v in out.values())


@jax.jit
def s_laxsort(sel, ham, dna, species, rh):
    key = jnp.where(sel, (ham << 24) | dna, jnp.int32(0x7FFFFFFF))
    key_s, sp_s, rh_s = jax.lax.sort((key, species, rh), dimension=0,
                                     num_keys=1, is_stable=True)
    sel_s = key_s != jnp.int32(0x7FFFFFFF)
    return (key_s.sum(dtype=I32) + sp_s.sum(dtype=I32)
            + rh_s.sum(dtype=I32) + sel_s.sum(dtype=I32))


def _oddeven_pairs(n):
    """Batcher odd-even merge sort network for n a power of two."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


@jax.jit
def s_network(sel, ham, dna, species, rh):
    key = jnp.where(sel, (ham << 24) | dna, jnp.int32(0x7FFFFFFF))
    rows_k = [key[i] for i in range(CAP)]
    rows_s = [species[i] for i in range(CAP)]
    rows_r = [rh[i] for i in range(CAP)]
    for a, b in _oddeven_pairs(CAP):
        sw = rows_k[a] > rows_k[b]
        for rows in (rows_k, rows_s, rows_r):
            lo = jnp.where(sw, rows[b], rows[a])
            hi = jnp.where(sw, rows[a], rows[b])
            rows[a], rows[b] = lo, hi
    key_s = jnp.stack(rows_k)
    sel_s = key_s != jnp.int32(0x7FFFFFFF)
    return (key_s.sum(dtype=I32) + jnp.stack(rows_s).sum(dtype=I32)
            + jnp.stack(rows_r).sum(dtype=I32) + sel_s.sum(dtype=I32))


def bench_one(name, fn, n=16):
    ins = [_mk_inputs(s) for s in range(n + 1)]
    np.asarray(fn(*ins[0]))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        r = fn(*ins[i])
    np.asarray(r)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"# {name:12s}: {ms:6.2f} ms/batch", flush=True)


def check_equal():
    """The lax.sort / network variants must produce the one-hot order."""
    ins = _mk_inputs(99)
    sel, ham, dna, species, rh = ins
    ref = dp_jax.sort_candidates(fields_of(*ins), sel, ham, dna)
    key = jnp.where(sel, (ham << 24) | dna, jnp.int32(0x7FFFFFFF))
    ks, sp, r2 = jax.lax.sort((key, species, rh), dimension=0, num_keys=1,
                              is_stable=True)
    assert np.array_equal(np.asarray(ref["ham"]),
                          np.asarray(ks >> 24)), "lax ham"
    m = np.asarray(ref["sel"])
    assert np.array_equal(np.asarray(ref["species"])[m],
                          np.asarray(sp)[m]), "lax species"
    print("# lax.sort == one-hot on selected lanes", flush=True)


if __name__ == "__main__":
    check_equal()
    bench_one("onehot", s_onehot)
    bench_one("laxsort", s_laxsort)
    bench_one("network", s_network)
