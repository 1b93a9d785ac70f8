"""Direct timing: fused step with hash probe vs bucket bisection, plus
the redundancy kernel — block_until_ready deltas on the real TPU."""
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
    import jax.numpy as jnp
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    names = [f"r{i}" for i in range(B.BATCH)]
    lens = np.full(B.BATCH, B.READ_LEN, dtype=np.int32)
    print(f"hash: rows=2^{clf.hash_log2_rows} chain={clf.hash_chain}",
          flush=True)
    warm = ((names, reads[b * B.BATCH:(b + 1) * B.BATCH], lens, None, None)
            for b in range(3))
    clf.drive_batches(warm)
    print(f"knobs: cap={clf.cap} pw={clf._path_width} wf={clf._win_frac} "
          f"pb={clf._path_block} pe={clf._path_estimate}", flush=True)

    from metabuli_work_tpu.models.flagship import fused_step_dp
    r1 = jnp.asarray(np.ascontiguousarray(reads[:B.BATCH]))
    j1 = jnp.asarray(lens)
    r2 = jnp.zeros((B.BATCH, 96), dtype=jnp.uint8)
    j2 = jnp.zeros(B.BATCH, dtype=jnp.int32)

    def run(hash_on):
        kw = dict(min_cons=4, min_cons_euk=9, cap=clf.cap,
                  kmer_format=clf.kmer_format, syncmer=clf.syncmer,
                  smer_len=clf.smer_len, paired=False,
                  bucket_lo=clf.bucket_lo, db_aa_lo=clf.db_aa_lo,
                  bucket_shift=clf.bucket_shift,
                  bucket_steps=clf.bucket_steps,
                  path_width=clf._path_width, win_frac=clf._win_frac,
                  path_block=clf._path_block, dp_pallas=clf._dp_pallas,
                  pallas_interpret=clf._pallas_interpret)
        if hash_on:
            kw.update(hash_table=clf.hash_table,
                      hash_log2_rows=clf.hash_log2_rows,
                      hash_chain=clf.hash_chain)
        return fused_step_dp(r1, j1, r2, j2, clf.db_quad, **kw)

    print(f"fused+hash : {timeit(lambda: run(True)):7.1f} ms", flush=True)
    print(f"fused+bisec: {timeit(lambda: run(False)):7.1f} ms", flush=True)

    # redundancy kernel alone, on real resident tensors
    ctx = clf._dispatch_batch_dp(names, reads[:B.BATCH], lens)
    import jax
    jax.block_until_ready(ctx["paths"])
    from metabuli_work_tpu.models.flagship import redundancy_counts
    sel, species, ham, ef, q_pos, q_sids = ctx["resident"]
    best_sp = jnp.ones(B.BATCH + 1, dtype=jnp.int32) * 4

    def red():
        return redundancy_counts(sel, species, ham, ef, q_pos, q_sids,
                                 best_sp, clf.euler, clf.lca_depth,
                                 clf.lca_lift,
                                 dna_shift=int(clf.taxonomer.dna_shift),
                                 n_quot=ctx["n_quot"], part_w=ctx["part_w"])
    print(f"redundancy : {timeit(red):7.1f} ms", flush=True)


main()
