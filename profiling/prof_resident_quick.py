"""Quick resident-mode throughput check (bench.py's measured pass only,
no golden/reference/streaming).  Usage:
    python profiling/prof_resident_quick.py [n_batches] [n_passes]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("METABULI_BENCH_NO_GOLDEN", "1")

import numpy as np  # noqa: E402

import bench  # noqa: E402

bench._enable_compile_cache()

from metabuli_work_tpu.classify.pipeline import (  # noqa: E402
    Classifier,
    ClassifyParams,
)
from metabuli_work_tpu.utils.timing import StageTimer  # noqa: E402


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng(0)
    t0 = time.time()
    index, tax, genomes = bench.build_synthetic(rng)
    reads = bench.simulate_reads(genomes, rng)
    print(f"# setup {time.time()-t0:.0f}s", file=sys.stderr)

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=bench.BATCH)
    clf = Classifier.from_memory(index, params)
    clf._win_frac = 184
    clf._path_block = 16
    clf._path_width = 1 << 16
    clf._path_estimate = 28672
    import os as _os
    pw = _os.environ.get("PRQ_PAIR_WIDTH")
    if pw: clf._pair_width = int(pw)
    if _os.environ.get("PRQ_FORCE_DA") == "1":
        clf._SYNC_SWITCH_S = 0.0   # force the degraded-link flow switch

    names = [f"r{i}" for i in range(bench.BATCH)]
    lens = np.full(bench.BATCH, bench.READ_LEN, dtype=np.int32)
    t0 = time.time()
    warm = ((names, reads[b * bench.BATCH:(b + 1) * bench.BATCH], lens,
             None, None) for b in range(bench.N_WARM // bench.BATCH))
    clf.drive_batches(warm)
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)
    clf.timer = StageTimer()

    nb = min(n_batches, bench.N_READS // bench.BATCH)
    for p in range(n_passes):
        t0 = time.time()
        batches = ((names, reads[(b % 48) * bench.BATCH:
                                 ((b % 48) + 1) * bench.BATCH], lens,
                    None, None) for b in range(nb))
        res = clf.drive_batches(batches)
        dt = time.time() - t0
        ncl = sum(1 for q in res if q.result.is_classified)
        print(f"# pass {p}: {nb * bench.BATCH} reads in {dt:.2f}s = "
              f"{nb * bench.BATCH / dt:.0f} reads/s ({ncl} classified)",
              file=sys.stderr)
        print("# " + clf.timer.report().replace("\n", "\n# "),
              file=sys.stderr)
        print(f"# pair_width now {clf._pair_width}", file=sys.stderr)
        clf.timer = StageTimer()


if __name__ == "__main__":
    main()
