"""Per-op device time of fused_step_full vs fused_step_dp (real TPU)."""
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
    import jax
    import jax.numpy as jnp
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.models.flagship import (fused_step_dp,
                                                   fused_step_full,
                                                   part_widths)

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
    print(f"cap={cap} path_width={pw} win_frac={wf} path_block={pb} "
          f"combine_k={clf._combine_k}", flush=True)

    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(lens)
    r2 = jnp.zeros((B.BATCH, 96), dtype=jnp.uint8)
    j2 = jnp.zeros(B.BATCH, dtype=jnp.int32)
    lmax = r1.shape[1]
    n_quot = lmax // int(clf.taxonomer.dna_shift) + 2
    part_w = part_widths(r1.shape[1], r2.shape[1], False, True, 2, 5, wf)

    common = dict(min_cons=4, min_cons_euk=9, cap=cap, kmer_format=2,
                  syncmer=True, smer_len=5, paired=False,
                  bucket_lo=clf.bucket_lo, db_aa_lo=clf.db_aa_lo,
                  bucket_shift=clf.bucket_shift,
                  bucket_steps=clf.bucket_steps,
                  path_width=pw, win_frac=wf, path_block=pb,
                  dp_pallas=clf._dp_pallas)

    t_dp = timeit(lambda: fused_step_dp(r1, j1, r2, j2, clf.db_quad,
                                        **common)[0])
    t_full = timeit(lambda: fused_step_full(
        r1, j1, r2, j2, clf.db_quad, clf.ef_node, clf.euler,
        clf.lca_depth, clf.lca_lift,
        min_score=0.15, tie_ratio=0.95, combine_k=clf._combine_k,
        dna_shift=int(clf.taxonomer.dna_shift), n_quot=n_quot,
        part_w=part_w, **common)[0])
    print(f"fused_step_dp  : {t_dp:7.2f} ms", flush=True)
    print(f"fused_step_full: {t_full:7.2f} ms  (+{t_full - t_dp:.2f})",
          flush=True)

    # per-op trace of the full step
    import jax.profiler

    with jax.profiler.trace("/tmp/assign_trace"):
        out = fused_step_full(
            r1, j1, r2, j2, clf.db_quad, clf.ef_node, clf.euler,
            clf.lca_depth, clf.lca_lift,
            min_score=0.15, tie_ratio=0.95, combine_k=clf._combine_k,
            dna_shift=int(clf.taxonomer.dna_shift), n_quot=n_quot,
            part_w=part_w, **common)
        jax.block_until_ready(out)
    print("trace written to /tmp/assign_trace", flush=True)


main()
