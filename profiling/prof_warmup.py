"""What does the bench warmup actually pay? (r5, VERDICT weak #3)

Times each warmup batch separately with jax compile logging on, then
prints persistent-cache hit/miss counts scraped from jax's logger.

Run: python profiling/prof_warmup.py
"""
import logging
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("METABULI_BENCH_NO_GOLDEN", "1")

import numpy as np  # noqa: E402

import bench  # noqa: E402

bench._enable_compile_cache()
import jax  # noqa: E402

jax.config.update("jax_log_compiles", True)

events = []


class Grab(logging.Handler):
    def emit(self, record):
        events.append((time.time(), record.getMessage()))


h = Grab()
for name in ("jax._src.interpreters.pxla", "jax._src.compiler",
             "jax._src.compilation_cache", "jax._src.dispatch"):
    lg = logging.getLogger(name)
    lg.addHandler(h)
    lg.setLevel(logging.DEBUG)

from metabuli_work_tpu.classify.pipeline import (  # noqa: E402
    Classifier,
    ClassifyParams,
)


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    index, tax, genomes = bench.build_synthetic(rng)
    reads = bench.simulate_reads(genomes, rng)
    print(f"# setup {time.time()-t0:.0f}s", file=sys.stderr)

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=bench.BATCH)
    t0 = time.time()
    clf = Classifier.from_memory(index, params)
    print(f"# from_memory (incl device_put of index): {time.time()-t0:.1f}s",
          file=sys.stderr)
    clf._win_frac = 184
    clf._path_block = 16
    clf._path_width = 1 << 16
    clf._path_estimate = 28672

    names = [f"r{i}" for i in range(bench.BATCH)]
    lens = np.full(bench.BATCH, bench.READ_LEN, dtype=np.int32)

    for b in range(bench.N_WARM // bench.BATCH):
        t0 = time.time()
        n0 = len(events)
        res = clf.drive_batches(iter(
            [(names, reads[b * bench.BATCH:(b + 1) * bench.BATCH], lens,
              None, None)]))
        dt = time.time() - t0
        msgs = events[n0:]
        print(f"# warm batch {b}: {dt:.1f}s, {len(msgs)} jax log events",
              file=sys.stderr)
    print("\n## compile/cache events (first 80):", file=sys.stderr)
    tprev = None
    for t, m in events[:80]:
        print(f"  {t % 1000:8.2f}  {m[:140]}", file=sys.stderr)
    hits = sum(1 for _, m in events if "cache hit" in m.lower())
    miss = sum(1 for _, m in events if "miss" in m.lower())
    comp = sum(1 for _, m in events if "Compiling" in m)
    print(f"\n## totals: {comp} 'Compiling' events, {hits} cache-hit msgs, "
          f"{miss} miss msgs, {len(events)} events", file=sys.stderr)


if __name__ == "__main__":
    main()
