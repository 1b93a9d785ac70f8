"""Streaming-mode mini-bench: grouped range sweeps on the bench DB.

Validates the grouped driver's upload amortization and surfaces any
overflow-retry sweeps (METABULI_DEBUG_RETRY=1 prints each retry's
stats header).  ~6 batches; run on an idle host.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("METABULI_DEBUG_RETRY", "1")
import bench as B  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    quad_gb = index.values.nbytes * 2 / (1 << 30)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH, hbm_budget_gb=quad_gb)
    clf = Classifier.from_memory(index, params)
    assert clf._streaming
    names = [f"r{i}" for i in range(B.BATCH)]
    lens = np.full(B.BATCH, B.READ_LEN, np.int32)
    G = clf._stream_group_size()
    print(f"# ranges={clf._n_ranges} group={G}", flush=True)

    def run(nb, label):
        t0 = time.perf_counter()
        batches = ((names, reads[b * B.BATCH:(b + 1) * B.BATCH], lens,
                    None, None) for b in range(nb))
        res = clf.drive_batches(batches)
        dt = time.perf_counter() - t0
        ncls = sum(1 for q in res if q.result.is_classified)
        print(f"# {label}: {nb * B.BATCH} reads in {dt:.1f}s = "
              f"{nb * B.BATCH / dt:.0f} reads/s ({ncls} classified)",
              flush=True)

    run(2, "warm (compiles + knob settle)")
    run(6, "measured")


if __name__ == "__main__":
    main()
