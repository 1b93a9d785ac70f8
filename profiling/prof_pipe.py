"""Trace the production pipeline on the real TPU; print settled knobs."""
import time
import numpy as np
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B


def main():
    import jax
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
    print(f"cap={clf.cap} path_width={clf._path_width} "
          f"win_frac={clf._win_frac} path_block={clf._path_block} "
          f"path_est={clf._path_estimate} pairs_est={clf._pairs_estimate}",
          flush=True)
    with jax.profiler.trace("/tmp/jaxtrace_pipe"):
        batches = ((names, reads[b * B.BATCH:(b + 1) * B.BATCH], lens, None,
                    None) for b in range(6))
        t0 = time.perf_counter()
        clf.drive_batches(batches)
        print(f"wall: {(time.perf_counter()-t0)/6*1000:.1f} ms/batch",
              flush=True)


main()
