"""Attribute the hdr_sync / redundancy_sync stalls (r5, VERDICT #1a).

Monkeypatches the two blocking fetches in the DP pipeline to time, per
call:
  marker  — fetch of a fresh 8-byte device array enqueued NOW (cost =
            current device-queue drain + 1 RTT)
  prefix  — the actual blocking prefix fetch (cost = residual copy wait
            if its async copy has not landed, ~0 if it has)

If prefix >> marker: the async copy never landed (copy itself slow).
If marker is big: the device queue is backed up at fetch time.
If both small but stage totals big: the stall is elsewhere.

Run: METABULI_BENCH_NO_GOLDEN=1 python profiling/prof_sync_stall.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("METABULI_BENCH_NO_GOLDEN", "1")

import numpy as np  # noqa: E402

import bench  # noqa: E402

bench._enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metabuli_work_tpu.classify import pipeline as P  # noqa: E402
from metabuli_work_tpu.classify.pipeline import (  # noqa: E402
    Classifier,
    ClassifyParams,
)

_bump = jax.jit(lambda x, s: x + s)
_base = None
_seed = 0


def marker_fetch():
    """Fetch a fresh dependent scalar enqueued now; returns seconds."""
    global _base, _seed
    if _base is None:
        _base = jnp.arange(2, dtype=jnp.int32)
    _seed += 1
    m = _bump(_base, _seed)
    t0 = time.perf_counter()
    np.asarray(m)
    return time.perf_counter() - t0


stats = {"hdr_marker": [], "hdr_prefix": [], "hdr_bytes": [],
         "red_marker": [], "red_prefix": [], "red_bytes": []}

orig_p1 = Classifier._finish_dp_phase1
orig_p2 = Classifier._finish_dp_phase2


def patched_p1(self, ctx):
    if not ctx.get("sharded"):
        tm = marker_fetch()
        t0 = time.perf_counter()
        hdr = np.asarray(ctx["prefix"])
        tp = time.perf_counter() - t0
        stats["hdr_marker"].append(tm)
        stats["hdr_prefix"].append(tp)
        stats["hdr_bytes"].append(hdr.nbytes)
    return orig_p1(self, ctx)


def patched_p2(self, ctx):
    if ctx.get("deferred") and not ctx.get("sharded") and "prefix2" in ctx:
        tm = marker_fetch()
        t0 = time.perf_counter()
        hdr2 = np.asarray(ctx["prefix2"])
        tp = time.perf_counter() - t0
        stats["red_marker"].append(tm)
        stats["red_prefix"].append(tp)
        stats["red_bytes"].append(hdr2.nbytes)
    return orig_p2(self, ctx)


Classifier._finish_dp_phase1 = patched_p1
Classifier._finish_dp_phase2 = patched_p2


def main():
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

    names = [f"r{i}" for i in range(bench.BATCH)]
    lens = np.full(bench.BATCH, bench.READ_LEN, dtype=np.int32)
    t0 = time.time()
    warm = ((names, reads[b * bench.BATCH:(b + 1) * bench.BATCH], lens,
             None, None) for b in range(bench.N_WARM // bench.BATCH))
    clf.drive_batches(warm)
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)
    for k in stats:
        stats[k].clear()

    n_batches = 16
    t0 = time.time()
    batches = ((names, reads[b * bench.BATCH:(b + 1) * bench.BATCH], lens,
                None, None) for b in range(n_batches))
    res = clf.drive_batches(batches)
    dt = time.time() - t0
    print(f"# measured: {n_batches * bench.BATCH} reads in {dt:.2f}s = "
          f"{n_batches * bench.BATCH / dt:.0f} reads/s", file=sys.stderr)
    print("# " + clf.timer.report().replace("\n", "\n# "), file=sys.stderr)

    for which in ("hdr", "red"):
        mk = stats[f"{which}_marker"]
        pf = stats[f"{which}_prefix"]
        by = stats[f"{which}_bytes"]
        if not mk:
            continue
        print(f"\n## {which}: {len(mk)} calls, prefix ~{np.mean(by)/1e3:.0f} KB")
        print(f"  marker (queue drain): mean {np.mean(mk)*1e3:7.1f} ms  "
              f"med {np.median(mk)*1e3:7.1f}  max {np.max(mk)*1e3:7.1f}")
        print(f"  prefix (copy wait):   mean {np.mean(pf)*1e3:7.1f} ms  "
              f"med {np.median(pf)*1e3:7.1f}  max {np.max(pf)*1e3:7.1f}")


if __name__ == "__main__":
    main()
