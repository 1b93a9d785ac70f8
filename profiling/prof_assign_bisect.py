"""Cumulative-cost bisect of the device assign stage (real TPU).

Early-return jit variants of fused_step_full's internals; XLA DCEs
everything after the returned value, so consecutive deltas = stage cost.
"""
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B


def timeit(fn, n=8):
    import jax
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.models import flagship
    from metabuli_work_tpu.ops import assign_jax

    I32 = jnp.int32
    F32 = jnp.float32

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
    cap, pw, wf, pb = clf.cap, clf._path_width, clf._win_frac, clf._path_block
    K = clf._combine_k
    print(f"cap={cap} pw={pw} wf={wf} pb={pb} K={K}", flush=True)

    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(lens)
    r2 = jnp.zeros((B.BATCH, 96), dtype=jnp.uint8)
    j2 = jnp.zeros(B.BATCH, dtype=jnp.int32)

    common = dict(min_cons=4, min_cons_euk=9, cap=cap, kmer_format=2,
                  syncmer=True, smer_len=5, paired=False,
                  bucket_lo=clf.bucket_lo, db_aa_lo=clf.db_aa_lo,
                  bucket_shift=clf.bucket_shift,
                  bucket_steps=clf.bucket_steps,
                  path_width=pw, win_frac=wf, path_block=pb,
                  dp_pallas=clf._dp_pallas)

    def upto(stage):
        @jax.jit
        def f(r1, j1, r2, j2):
            stats, paths, resident = flagship._fused_core(
                r1, j1, r2, j2, clf.db_quad, **common)
            if stage == "core":
                return stats, paths
            # inline device_assign piecewise
            P = paths.shape[1]
            B1 = B.BATCH + 1
            qlens = jnp.zeros(B1, I32).at[1:].set(j1)
            out = assign_jax.device_assign(
                paths, stats[1], qlens, clf.ef_node, clf.euler,
                clf.lca_depth, clf.lca_lift, min_score=0.15,
                tie_ratio=0.95, combine_k=K)
            if stage == "assign":
                return out[0]
            sel, species, ham, ef, q_pos, q_sids = resident
            lmaxv = r1.shape[1]
            n_quot = lmaxv // int(clf.taxonomer.dna_shift) + 2
            part_w = flagship.part_widths(r1.shape[1], r2.shape[1], False,
                                          True, 2, 5, wf)
            packed2 = flagship._redundancy_core(
                sel, species, ham, ef, q_pos, q_sids, out[1], clf.euler,
                clf.lca_depth, clf.lca_lift,
                dna_shift=int(clf.taxonomer.dna_shift), n_quot=n_quot,
                part_w=part_w)
            return out[0], packed2
        return f

    prev = 0.0
    for stage in ("core", "assign", "full"):
        t = timeit(lambda f=upto(stage): f(r1, j1, r2, j2))
        print(f"{stage:8s}: {t:7.2f} ms  (+{t - prev:.2f})", flush=True)
        prev = t

    # sub-bisect inside device_assign: sort only / pack only / combine
    paths_packed, n_paths = None, None

    @jax.jit
    def core_only(r1, j1, r2, j2):
        stats, paths, resident = flagship._fused_core(
            r1, j1, r2, j2, clf.db_quad, **common)
        return stats, paths

    stats, paths = core_only(r1, j1, r2, j2)
    stats = jax.device_put(stats)
    paths = jax.device_put(paths)
    n = stats[1]
    qlens = jnp.zeros(B.BATCH + 1, I32).at[1:].set(j1)

    def sub(stage):
        @functools.partial(jax.jit, static_argnames=("s",))
        def f(paths, n, s):
            import jax.numpy as jnp
            P = paths.shape[1]
            u0 = paths[0].astype(jnp.uint32)
            g = (u0 >> jnp.uint32(16)).astype(I32)
            start = (u0 & jnp.uint32(0xFFFF)).astype(I32)
            sp = paths[3]
            sb = paths[4]
            u2 = paths[2].astype(jnp.uint32)
            ham = (u2 & jnp.uint32(0xFFFF)).astype(I32)
            qid = g // 6 + 1
            frame = g % 6
            iota = jnp.arange(P, dtype=I32)
            valid = iota < n
            BIGI = jnp.int32(0x7FFFFFFF)
            k_qid = jnp.where(valid, qid, BIGI)
            k_sc = BIGI - sb
            k_hs = (ham << 16) | (0xFFFF - start)
            end = (paths[1].astype(jnp.uint32) >> jnp.uint32(16)).astype(I32)
            k_fe = (frame << 16) | end
            if s == "keys":
                return k_qid, k_sc, k_hs, k_fe
            srt = jax.lax.sort((k_qid, sp, k_sc, k_hs, k_fe, iota),
                               num_keys=6)
            if s == "sort":
                return srt[5]
            perm = srt[5]
            return tuple(a[perm] for a in (qid, sp, start, end, sb))
        return lambda: f(paths, n, s=stage)

    prev = 0.0
    for stage in ("keys", "sort", "gather"):
        t = timeit(sub(stage))
        print(f"sub:{stage:7s}: {t:7.2f} ms  (+{t - prev:.2f})", flush=True)
        prev = t


main()
