"""Cumulative-cost bisect of fused_step_dp stages on the real TPU.

Builds early-return variants of the fused step (XLA DCEs everything
after the returned value), so each timing is the true fused cost of the
pipeline up to that stage.
"""
import functools
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B


def timeit(fn, *args, n=6):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp
    from metabuli_work_tpu.ops import encode_jax, match_jax, dp_jax
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    names = [f"r{i}" for i in range(B.BATCH)]
    lens = np.full(B.BATCH, B.READ_LEN, dtype=np.int32)
    warm = ((names, reads[b * B.BATCH:(b + 1) * B.BATCH], lens, None, None)
            for b in range(3))
    clf.drive_batches(warm)
    cap, pw, wf = clf.cap, clf._path_width, clf._win_frac
    print(f"cap={cap} path_width={pw} win_frac={wf} "
          f"bucket_steps={clf.bucket_steps}", flush=True)

    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(lens)

    dbq = jax.device_put(clf.db_quad)

    def upto(stage):
        @jax.jit
        def fn(r1, j1, dbq):
            kk, pp, vv = encode_jax.extract_batch(r1, j1, syncmer=True,
                                                  smer_len=5, kmer_format=2)
            if stage == "encode":
                return kk.astype(jnp.uint32).sum() + pp.sum() + vv.sum()
            W = int(kk.shape[2])
            w_c = max(min((W * wf + 255) // 256, W), 1)
            kk, pp, vv, over = encode_jax.compact_windows(kk, pp, vv, w_c)
            if stage == "compact_win":
                return kk.astype(jnp.uint32).sum() + pp.sum() + over
            sids = jnp.arange(1, r1.shape[0] + 1, dtype=jnp.int32)
            qk, qp, qf, qs, qv = encode_jax.flatten_batch(kk, pp, vv, sids)
            if stage == "flatten":
                return qk.astype(jnp.uint32).sum() + qp.sum() + qv.sum()
            q_aa = qk >> jnp.uint64(24)
            lo = match_jax._bucket_search(q_aa, qv, clf.bucket_lo,
                                          clf.db_aa_lo, clf.bucket_shift,
                                          clf.bucket_steps, clf.db_m)
            if stage == "search":
                return lo.sum()
            t_quad = match_jax._gather_blocks(dbq, lo, cap)
            if stage == "gather":
                return t_quad.sum()
            out = match_jax.match_kmers_quad(
                qk, qf, qv, dbq, cap=cap, kmer_format=2,
                bucket_lo=clf.bucket_lo, db_aa_lo=clf.db_aa_lo,
                bucket_shift=clf.bucket_shift, bucket_steps=clf.bucket_steps,
                db_m=clf.db_m)
            if stage == "probe":
                return (out["sel"].sum() + out["rh"].sum()
                        + out["hamming"].sum()
                        + out["species"].sum() + out["taxid"].sum())
            Bb, F, Wc = 1024, 6, kk.shape[2]
            resh = lambda a: a.reshape(cap, Bb * F, Wc)
            fields = {
                "sel": resh(out["sel"]), "species": resh(out["species"]),
                "dna": resh(out["dna_enc"]), "rh": resh(out["rh"]),
                "ham": resh(out["hamming"]),
                "pos": jnp.broadcast_to(qp.reshape(1, Bb * F, Wc),
                                        (cap, Bb * F, Wc)),
            }
            fields = dp_jax.sort_candidates(fields, fields["sel"],
                                            fields["ham"], fields["dna"])
            if stage == "sortcand":
                return fields["sel"].sum() + fields["species"].sum()
            md = jnp.where((fields["species"] >> 30) & 1 != 0, jnp.int32(9),
                           jnp.int32(4))
            dp = dp_jax.path_dp(fields["sel"], fields["species"],
                                fields["dna"], fields["rh"], fields["ham"],
                                fields["pos"], md, max_shift=3, kmer_format=2,
                                dyn_gap=True)
            cols, psel = dp_jax.pack_paths(dp)
            if stage == "dp":
                return cols.sum() + psel.sum()
            paths_packed, paths_count = dp_jax.compact_columns(cols, psel,
                                                               out_width=pw)
            return paths_packed.sum() + paths_count
        return fn

    prev = 0.0
    for stage in ["encode", "compact_win", "flatten", "search", "gather",
                  "probe", "sortcand", "dp", "compact_cols"]:
        t = timeit(upto(stage), r1, j1, dbq)
        print(f"upto {stage:12s}: {t:7.1f} ms  (+{t - prev:6.1f})", flush=True)
        prev = t


main()
