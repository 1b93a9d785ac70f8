"""fused_step_dp with Pallas DP kernel vs XLA flow on the real TPU."""
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B


def timeit(fn, *args, n=10):
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
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.models.flagship import fused_step_dp

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
    print(f"cap={cap} path_width={pw} win_frac={wf} path_block={pb}",
          flush=True)

    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(lens)
    r2 = jnp.zeros((B.BATCH, 96), dtype=jnp.uint8)
    j2 = jnp.zeros(B.BATCH, dtype=jnp.int32)

    def run(dp_pallas):
        def fn(r1, j1):
            packed_hdr, resident = fused_step_dp(
                r1, j1, r2, j2, clf.db_quad,
                min_cons=4, min_cons_euk=9, cap=cap, kmer_format=2,
                syncmer=True, smer_len=5, paired=False,
                bucket_lo=clf.bucket_lo, db_aa_lo=clf.db_aa_lo,
                bucket_shift=clf.bucket_shift, bucket_steps=clf.bucket_steps,
                path_width=pw, win_frac=wf, path_block=pb,
                dp_pallas=dp_pallas)
            return packed_hdr
        return jax.jit(fn)

    t0v, rx = timeit(run(False), r1, j1)
    t1v, rp = timeit(run(True), r1, j1)
    ax, ap = np.asarray(rx), np.asarray(rp)
    n = int(ax[1, 0])
    same = np.array_equal(ax[:, :n + 1], ap[:, :n + 1])
    print(f"xla   : {t0v:7.2f} ms", flush=True)
    print(f"pallas: {t1v:7.2f} ms", flush=True)
    print(f"paths={n} outputs_equal={same} stats_x={ax[:4,0]} "
          f"stats_p={ap[:4,0]}", flush=True)


main()
