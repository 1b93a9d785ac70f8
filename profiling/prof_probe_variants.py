"""Probe-variant shootout on the real TPU.

The fused-step bisect shows search (+12.6 ms) and candidate gather
(+12.9 ms) dominate the device step.  Both are random-HBM-row bound:
search = bucket_steps dependent [N] gathers, gather = (cap+1) [N] row
gathers.  Variants measured here:

  v0  current: 6-step bisection + pointwise [cap+1, N] quad-row gather
  v1  run-count search: ONE contiguous [N, R] slice-gather of the
      bucket's aa_lo run + vectorized `sum(run < q)` left edge, then the
      pointwise quad gather as before
  v2  run-everything: ONE contiguous [N, R*4] flat slice-gather of the
      bucket's quad rows + VPU one-hot window select (no pointwise
      gathers at all)
  v3  wider bucket table (max_bits+2) -> fewer bisection steps
"""
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B


def timeit(fn, *args, n=8):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000, r


def main():
    import jax
    import jax.numpy as jnp
    from metabuli_work_tpu.ops import encode_jax, match_jax
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    cap = 8
    U64 = jnp.uint64

    # fixed query set: one batch's flattened kmers (precomputed once)
    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(np.full(B.BATCH, B.READ_LEN, dtype=np.int32))
    kk, pp, vv = encode_jax.extract_batch(r1, j1, syncmer=True, smer_len=5)
    W = kk.shape[2]
    w_c = max(min((W * 184 + 255) // 256, W), 1)
    kk, pp, vv, _ = encode_jax.compact_windows(kk, pp, vv, w_c)
    sids = jnp.arange(1, B.BATCH + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kk, pp, vv, sids)
    qk, qf, qv = jax.device_put(qk), jax.device_put(qf), jax.device_put(qv)
    N = qk.shape[0]
    M = clf.db_quad.shape[0]
    print(f"N={N} M={M} cap={cap} steps={clf.bucket_steps} "
          f"shift={clf.bucket_shift}", flush=True)

    # host-side bucket stats for run variants
    bp = np.asarray(clf.bucket_lo)
    runs = bp[:, 1] - bp[:, 0]
    max_run = int(runs.max())
    R = 1 << int(np.ceil(np.log2(max(max_run, 1))))
    print(f"bucket max_run={max_run} R={R} "
          f"p99={int(np.percentile(runs[runs>0], 99))}", flush=True)

    db_quad = clf.db_quad
    db_flat = db_quad.reshape(-1)            # [M*4] u32
    db_aa_lo = clf.db_aa_lo
    bucket_lo = clf.bucket_lo
    shift = clf.bucket_shift
    steps = clf.bucket_steps

    def ham_out(out):
        return (out["sel"].sum(), out["hamming"].sum(), out["rh"].sum(),
                out["species"].sum(), out["taxid"].sum())

    # ---------------- v0: current ----------------
    @jax.jit
    def v0(qk, qf, qv):
        out = match_jax.match_kmers_quad(
            qk, qf, qv, db_quad, cap=cap, kmer_format=2,
            bucket_lo=bucket_lo, db_aa_lo=db_aa_lo,
            bucket_shift=shift, bucket_steps=steps)
        return ham_out(out)

    # ---------------- v1: run-count search + pointwise gather -------------
    @jax.jit
    def v1(qk, qf, qv):
        U32 = jnp.uint32
        q_aa = qk >> U64(24)
        qb = (q_aa >> U64(shift)).astype(jnp.int32)
        pair = bucket_lo[qb]
        blo, bhi = pair[:, 0], pair[:, 1]
        q_lo32 = (q_aa & U64(0xFFFFFFFF)).astype(U32)
        run = jax.vmap(lambda s: jax.lax.dynamic_slice(
            db_aa_lo, (s,), (R,)))(jnp.clip(blo, 0, M - R))
        ridx = jnp.arange(R, dtype=jnp.int32)[None, :]
        base = jnp.clip(blo, 0, M - R)[:, None]
        inrun = (base + ridx >= blo[:, None]) & (base + ridx < bhi[:, None])
        lo = blo + jnp.sum((run < q_lo32[:, None]) & inrun, axis=1,
                           dtype=jnp.int32) - jnp.sum(
            (base + ridx < blo[:, None]) & (run < q_lo32[:, None]), axis=1,
            dtype=jnp.int32)
        out = match_jax.match_kmers_quad(
            qk, qf, qv, db_quad, cap=cap, kmer_format=2,
            bucket_lo=bucket_lo, db_aa_lo=db_aa_lo,
            bucket_shift=shift, bucket_steps=0, lo_override=lo)
        return ham_out(out)

    # ---------------- v2: run slice + one-hot window select --------------
    @jax.jit
    def v2(qk, qf, qv):
        U32 = jnp.uint32
        q_aa = qk >> U64(24)
        qb = (q_aa >> U64(shift)).astype(jnp.int32)
        pair = bucket_lo[qb]
        blo, bhi = pair[:, 0], pair[:, 1]
        base = jnp.clip(blo, 0, M - R)
        q_lo32 = (q_aa & U64(0xFFFFFFFF)).astype(U32)
        flat = jax.vmap(lambda s: jax.lax.dynamic_slice(
            db_flat, (s * 4,), (R * 4,)))(base)      # [N, R*4]
        quad = flat.reshape(N, R, 4)
        v_lo = quad[:, :, 0]                          # [N, R]
        v_hi = quad[:, :, 1]
        ridx = jnp.arange(R, dtype=jnp.int32)[None, :]
        pos = base[:, None] + ridx
        inb = (pos >= blo[:, None]) & (pos < bhi[:, None])
        q_hi = (q_aa >> U64(8)).astype(U32)
        q_low8 = (q_aa & U64(0xFF)).astype(U32)
        cand = inb & (v_hi == q_hi[:, None]) & \
            ((v_lo >> U32(24)) == q_low8[:, None]) & qv[:, None]
        # rank within run -> select first cap+1 candidates via one-hot
        rank = jnp.cumsum(cand.astype(jnp.int32), axis=1) - 1
        overflow = jnp.sum(jnp.sum(cand, axis=1) > cap).astype(jnp.int32)
        sel_parts = []
        t_dna = []
        p_lo_parts = []
        p_hi_parts = []
        for c in range(cap):
            oh = cand & (rank == c)                   # [N, R]
            pick = lambda a: jnp.sum(jnp.where(oh, a, 0), axis=1)
            sel_parts.append(jnp.any(oh, axis=1))
            t_dna.append(pick(v_lo.astype(jnp.int32)) & ((1 << 24) - 1))
            p_lo_parts.append(pick(quad[:, :, 2].astype(jnp.int32)))
            p_hi_parts.append(pick(quad[:, :, 3].astype(jnp.int32)))
        cmask = jnp.stack(sel_parts)                  # [cap, N]
        t_dnas = jnp.stack(t_dna)
        q_dna = (qk & U64((1 << 24) - 1)).astype(jnp.int32)[None, :]
        sel, hsum, rh = match_jax._hamming_filter(t_dnas, q_dna, cmask, qf, 2)
        p_lo = jnp.stack(p_lo_parts)
        p_hi = jnp.stack(p_hi_parts)
        ef = (p_lo & ((1 << match_jax.EF_BITS) - 1))
        species = ((p_lo.astype(U32) >> U32(match_jax.EF_BITS))
                   | (p_hi.astype(U32) << U32(7))).astype(jnp.int32)
        return (sel.sum(), hsum.sum(), rh.sum(), species.sum(), ef.sum(),
                overflow)

    # ---------------- v3: wider table ----------------
    bp3, aa3, shift3, steps3 = match_jax.build_buckets(index.values,
                                                       max_bits=26)
    bl3 = jnp.asarray(bp3)
    al3 = jnp.asarray(aa3)
    print(f"v3 table: shift={shift3} steps={steps3} "
          f"buckets={bp3.shape[0]}", flush=True)

    @jax.jit
    def v3(qk, qf, qv):
        out = match_jax.match_kmers_quad(
            qk, qf, qv, db_quad, cap=cap, kmer_format=2,
            bucket_lo=bl3, db_aa_lo=al3,
            bucket_shift=shift3, bucket_steps=steps3)
        return ham_out(out)

    for name, fn in [("v0 current", v0), ("v3 wide-table", v3),
                     ("v1 run-count", v1), ("v2 run-onehot", v2)]:
        try:
            t, r = timeit(fn, qk, qf, qv)
            vals = tuple(int(np.asarray(x)) for x in r)
            print(f"{name:16s}: {t:7.2f} ms   out={vals}", flush=True)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {e}", flush=True)


main()
