"""Traced shootout of candidate-gather layouts in the probe (xplane
ground truth; block_until_ready through the tunnel is unreliable).

Production (r02 trace): the [cap+1, N] db_quad row gather materializes
as u32[1.7M,4]{0,1:T(4,128)} — 23 ms/batch, 54% of device time — and the
hash probe's 3 chained 64-byte row gathers cost 13 ms.  Variants:
  quad     : current layout (one [M,4] u32 gather)
  two_u64  : value/payload as separate u64 arrays, two gathers with
             single consumer chains each
  cols     : four independent u32 column gathers
  hash2    : quad + hash table rebuilt at load 1.2 (chain 2)
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import bench as B


def main():
    import jax
    import jax.numpy as jnp
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.ops import encode_jax, match_jax

    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(rng=rng, genomes=genomes) \
        if False else B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    lens = np.full(B.BATCH, B.READ_LEN, dtype=np.int32)
    M = clf.db_quad.shape[0]

    dbq_np = np.asarray(clf.db_quad)
    db_v64 = jnp.asarray(dbq_np[:, 0].astype(np.uint64)
                         | (dbq_np[:, 1].astype(np.uint64) << 32))
    db_p64 = jnp.asarray(dbq_np[:, 2].astype(np.uint64)
                         | (dbq_np[:, 3].astype(np.uint64) << 32))
    db_cols = [jnp.asarray(np.ascontiguousarray(dbq_np[:, j])) for j in range(4)]

    ht12, lr12, ch12 = match_jax.build_aa_hash(index.values, load=1.2)
    ht12 = jnp.asarray(ht12)
    print(f"hash load=2.5: chain={clf.hash_chain} rows=2^{clf.hash_log2_rows}; "
          f"load=1.2: chain={ch12} rows=2^{lr12}", flush=True)

    def extract(r1, j1):
        kk, pp, vv = encode_jax.extract_batch(r1, j1, syncmer=True,
                                              smer_len=5, kmer_format=2)
        W = int(kk.shape[2])
        w_c = max(min((W * 184 + 255) // 256, W), 1)
        kk, pp, vv, _ = encode_jax.compact_windows(kk, pp, vv, w_c)
        sids = jnp.arange(1, r1.shape[0] + 1, dtype=jnp.int32)
        qk, qp, qf, qs, qv = encode_jax.flatten_batch(kk, pp, vv, sids)
        return qk, qp, qf, qs, qv

    def finish(v_lo, v_hi, p_lo, p_hi, pos, qk, qf, qv):
        U32 = jnp.uint32
        q_aa = qk >> jnp.uint64(24)
        q_hi = (q_aa >> jnp.uint64(8)).astype(U32)
        q_low8 = (q_aa & jnp.uint64(0xFF)).astype(U32)
        cmask = (v_hi == q_hi[None, :]) & ((v_lo >> U32(24)) == q_low8[None, :]) \
            & (pos < M) & qv[None, :]
        cap = pos.shape[0] - 1
        overflow = jnp.sum(cmask[cap]).astype(jnp.int32)
        cmask = cmask[:cap]
        t_dna = (v_lo[:cap] & U32(0xFFFFFF)).astype(jnp.int32)
        q_dna = (qk & jnp.uint64(0xFFFFFF)).astype(jnp.int32)[None, :]
        sel, hsum, rh = match_jax._hamming_filter(t_dna, q_dna, cmask, qf, 2)
        ef = (p_lo[:cap] & U32((1 << 25) - 1)).astype(jnp.int32)
        species = ((p_lo[:cap] >> U32(25)) | (p_hi[:cap] << U32(7))).astype(jnp.int32)
        return sel, hsum, rh, ef, species, t_dna, overflow

    CAP = 8

    def probes():
        def quad(r1, j1, dbq, ht, lr, ch):
            qk, qp, qf, qs, qv = extract(r1, j1)
            out = match_jax.match_kmers_quad(qk, qf, qv, dbq, cap=CAP,
                                             kmer_format=2, hash_table=ht,
                                             hash_log2_rows=lr, hash_chain=ch)
            return out["sel"], out["hamming"], out["rh"], out["taxid"], out["species"]

        def two_u64(r1, j1, v64, p64, ht, lr, ch):
            qk, qp, qf, qs, qv = extract(r1, j1)
            q_aa = qk >> jnp.uint64(24)
            lo = match_jax._hash_search(q_aa, ht, lr, ch, M)
            offs = jnp.arange(CAP + 1, dtype=jnp.int32)[:, None]
            pos = lo[None, :] + offs
            idx = jnp.clip(pos, 0, M - 1)
            v = v64[idx]
            p = p64[idx]
            v_lo = (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            v_hi = (v >> jnp.uint64(32)).astype(jnp.uint32)
            p_lo = (p & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            p_hi = (p >> jnp.uint64(32)).astype(jnp.uint32)
            return finish(v_lo, v_hi, p_lo, p_hi, pos, qk, qf, qv)

        def cols(r1, j1, c0, c1, c2, c3, ht, lr, ch):
            qk, qp, qf, qs, qv = extract(r1, j1)
            q_aa = qk >> jnp.uint64(24)
            lo = match_jax._hash_search(q_aa, ht, lr, ch, M)
            offs = jnp.arange(CAP + 1, dtype=jnp.int32)[:, None]
            pos = lo[None, :] + offs
            idx = jnp.clip(pos, 0, M - 1)
            return finish(c0[idx], c1[idx], c2[idx], c3[idx], pos, qk, qf, qv)

        return quad, two_u64, cols

    quad, two_u64, cols = probes()
    import functools
    variants = [
        ("quad", jax.jit(quad), (clf.db_quad, clf.hash_table,
                                 clf.hash_log2_rows, clf.hash_chain)),
        ("two_u64", jax.jit(functools.partial(two_u64)),
         (db_v64, db_p64, clf.hash_table, clf.hash_log2_rows, clf.hash_chain)),
        ("cols", jax.jit(cols), (*db_cols, clf.hash_table,
                                 clf.hash_log2_rows, clf.hash_chain)),
        ("quad_hash12", jax.jit(quad), (clf.db_quad, ht12, lr12, ch12)),
    ]
    r1s = [jnp.asarray(np.ascontiguousarray(
        B.simulate_reads(genomes, np.random.default_rng(100 + i))[:B.BATCH]))
        for i in range(4)]
    j1 = jnp.asarray(lens)

    for name, fn, dbargs in variants:
        jax.block_until_ready(fn(r1s[0], j1, *dbargs))   # compile
        trace_dir = f"/tmp/trace_probe_{name}"
        with jax.profiler.trace(trace_dir):
            outs = [fn(r, j1, *dbargs) for r in r1s]
            jax.block_until_ready(outs)
        print(f"{name}: traced -> {trace_dir}", flush=True)


main()
