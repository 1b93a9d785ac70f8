"""A/B on the real TPU: two-tier candidate window and hash-table chain.

Timing method (IMPORTANT): on the axon tunnel backend,
jax.block_until_ready is a NO-OP — it returns before the device has
executed anything.  The only trustworthy clock is a D2H fetch: enqueue
n batches back-to-back (the in-order device queue executes them all),
then np.asarray ONE result of the last batch; total/n amortizes the
~25 ms tunnel round trip.  (Discovered 2026-08-21; every earlier
number produced by block_until_ready-based timing on this rig is
host-dispatch cost, not device time.)

Measures the production fused step (dispatch -> paths header) per
1024-read batch at the bench DB (105.6M kmers), for two_tier off/on
at the settled cap, for hash budgets 3 and 9 GiB.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B  # noqa: E402


def step_ms(clf, reads, two_tier, n=16):
    names = [f"r{i}" for i in range(B.BATCH)]
    lens = np.full(B.BATCH, B.READ_LEN, np.int32)

    def disp(i):
        return clf._dispatch_batch_dp(
            names, reads[i * B.BATCH:(i + 1) * B.BATCH], lens,
            two_tier=two_tier)

    ctx = disp(0)                       # compile + settle
    hdr = np.asarray(ctx["prefix"])     # real sync
    over = int(hdr[0, 0])
    nb = B.N_READS // B.BATCH
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        ctx = disp(i % (nb - 1))
    np.asarray(ctx["prefix"])           # drains the whole queue
    return (time.perf_counter() - t0) / n * 1000, over


def main():
    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)

    for hash_gb in ("3", "9"):
        os.environ["METABULI_HASH_GB"] = hash_gb
        clf = Classifier.from_memory(index, params)
        clf._win_frac = 184
        clf._path_block = 16
        clf._path_width = 1 << 16
        clf._path_estimate = 28672
        clf.cap = 16                    # the settled production cap here
        print(f"# hash_gb={hash_gb}: chain={clf.hash_chain} "
              f"rows=2^{clf.hash_log2_rows} cap={clf.cap} "
              f"aligned={clf._aligned}", flush=True)
        for tt in (False, True):
            ms, over = step_ms(clf, reads, tt)
            print(f"#   two_tier={int(tt)}: {ms:.1f} ms/batch "
                  f"({B.BATCH / ms * 1000:.0f} reads/s device-bound), "
                  f"overflow={over}", flush=True)
        del clf


if __name__ == "__main__":
    main()
