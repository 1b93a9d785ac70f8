"""Device-time of fused_step_full vs fused_step_dp at bench scale.

The r5 PRQ_FORCE_DA run measured the device-assign flow at ~269
ms/batch end-to-end vs the r4 A/B's ~48 — this bisects whether the
regression is in the device program itself and in which half
(fused core vs assign+redundancy tail).  D2H-forced timing per
prof_fused_bisect.

Run: python profiling/prof_full_flow.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("METABULI_BENCH_NO_GOLDEN", "1")

import bench as B  # noqa: E402

B._enable_compile_cache()
import jax  # noqa: E402

from metabuli_work_tpu.classify.pipeline import (  # noqa: E402
    Classifier,
    ClassifyParams,
)
from metabuli_work_tpu.models import flagship  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    clf._win_frac = 184
    clf._path_block = 16
    clf._path_width = 1 << 16
    cap = 16
    lens = np.full(B.BATCH, B.READ_LEN, np.int32)
    batches = [jax.device_put(np.ascontiguousarray(
        reads[i * B.BATCH:(i + 1) * B.BATCH])) for i in range(9)]
    jdev = jax.device_put(lens)
    r2 = jax.device_put(np.zeros((B.BATCH, 96), np.uint8))
    j2 = jax.device_put(np.zeros(B.BATCH, np.int32))
    lmax = 168
    n_quot = lmax // int(clf.taxonomer.dna_shift) + 2
    part_w = flagship.part_widths(lmax, 96, False, True, 2, 5, 184)

    common = dict(min_cons=4, min_cons_euk=9, cap=cap, kmer_format=2,
                  syncmer=True, smer_len=5, paired=False,
                  path_width=1 << 16, win_frac=184, path_block=16,
                  hash_table=clf.hash_table,
                  hash_log2_rows=clf.hash_log2_rows,
                  hash_chain=clf.hash_chain, db_m=clf.db_m,
                  dp_pallas=True, pallas_interpret=False)

    def s_dp(r1):
        hdr, res = flagship.fused_step_dp(r1, jdev, r2, j2, clf.db_quad,
                                          **common)
        return hdr

    def s_full(r1):
        rec, p2 = flagship.fused_step_full(
            r1, jdev, r2, j2, clf.db_quad, clf.ef_node, clf.euler,
            clf.lca_depth, clf.lca_lift, min_score=0.15, tie_ratio=0.95,
            combine_k=8, dna_shift=int(clf.taxonomer.dna_shift),
            n_quot=n_quot, part_w=part_w, **common)
        return rec

    def bench_one(name, fn, n=8):
        r = fn(batches[0])
        np.asarray(r[:1, :1])
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            r = fn(batches[i])
        np.asarray(r[:1, :1])
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"# {name:12s}: {ms:6.1f} ms/batch", flush=True)

    bench_one("fused_dp", s_dp)
    bench_one("fused_full", s_full)


if __name__ == "__main__":
    main()
