"""Probe-level dissection of the two-tier candidate window on TPU.

The full-bench A/B (2026-08-21) showed two_tier=1 REGRESSING ~2x at
cap=16 despite gathering ~2.6 fewer 64-byte blocks per query — so the
merge machinery (nonzero compaction + [K -> N] scatter + dense zero
buffer) costs more than the saved random gathers.  This times each
piece and two merge variants:

  v_single   match_kmers_quad two_tier=False        (baseline)
  v_scatter  match_kmers_quad two_tier=True         (shipped r4 draft)
  v_gather   tier-2 merge via rank-indexed gather (no scatter, no
             dense zero buffer): inv = cumsum(flagged)-1;
             t2 = ent2[clip(inv)]  — addresses are MONOTONE
  prim_*     isolated primitive costs (nonzero size=K, scatter, gather)

Run on an idle host.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B  # noqa: E402


def timeit(fn, *args, n=10):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.ops import encode_jax, match_jax

    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    cap = 16

    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(np.full(B.BATCH, B.READ_LEN, dtype=np.int32))
    kk, pp, vv = encode_jax.extract_batch(r1, j1, syncmer=True, smer_len=5)
    W = kk.shape[2]
    w_c = max(min((W * 184 + 255) // 256, W), 1)
    kk, pp, vv, _ = encode_jax.compact_windows(kk, pp, vv, w_c)
    sids = jnp.arange(1, B.BATCH + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kk, pp, vv, sids)
    N = qk.shape[0]
    print(f"# N={N} cap={cap} chain={clf.hash_chain} "
          f"rows=2^{clf.hash_log2_rows}", flush=True)

    @functools.partial(jax.jit, static_argnames=("two_tier",))
    def v_probe(qk, qf, qv, dbq, ht, two_tier):
        return match_jax.match_kmers_quad(
            qk, qf, qv, dbq, cap=cap, kmer_format=clf.kmer_format,
            hash_table=ht, hash_log2_rows=clf.hash_log2_rows,
            hash_chain=clf.hash_chain, db_m=clf.db_m, aligned=True,
            two_tier=two_tier)

    ms = timeit(lambda a, b, c: v_probe(a, b, c, clf.db_quad,
                                        clf.hash_table, two_tier=False),
                qk, qf, qv)
    print(f"# v_single : {ms:.2f} ms", flush=True)
    ms = timeit(lambda a, b, c: v_probe(a, b, c, clf.db_quad,
                                        clf.hash_table, two_tier=True),
                qk, qf, qv)
    print(f"# v_scatter: {ms:.2f} ms", flush=True)

    # ---- primitive costs at this N/K ---------------------------------
    K = max(256, -(-N // 8))
    flagged = jnp.asarray(rng.random(N) < 0.02)
    ent2 = jnp.asarray(rng.integers(0, 2**31, size=(K, cap - 4, 4),
                                    dtype=np.int32))

    @jax.jit
    def prim_nonzero(f):
        return jnp.nonzero(f, size=K, fill_value=N)[0]

    @jax.jit
    def prim_scatter(f, e):
        idx = jnp.nonzero(f, size=K, fill_value=N)[0]
        t2 = jnp.zeros((N + 1, cap - 4, 4), e.dtype)
        return t2.at[idx].set(e)[:N]

    @jax.jit
    def prim_gather(f, e):
        inv = jnp.cumsum(f.astype(jnp.int32)) - 1
        return e[jnp.clip(inv, 0, K - 1)]

    print(f"# prim_nonzero(K={K}): {timeit(prim_nonzero, flagged):.2f} ms",
          flush=True)
    print(f"# prim_scatter       : {timeit(prim_scatter, flagged, ent2):.2f}"
          " ms", flush=True)
    print(f"# prim_gather        : {timeit(prim_gather, flagged, ent2):.2f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
