"""Multi-device / multi-host scaling measurement (BASELINE: >=80% linear
reads/s scaling 1 -> N hosts).

Two harnesses:

* measure_scaling — mesh sizes within one process (virtual CPU mesh in
  CI, real chips on hardware), driving the PRODUCTION mesh classify path
  (classify.pipeline.Classifier with a mesh) on a genome-derived
  synthetic workload.
* main()/--distributed — the multi-host entry: every process runs this
  module under jax.distributed (see parallel/distributed.py), measures
  the global-mesh throughput, and process 0 prints the aggregate —
  launch once per host with COORDINATOR/NPROC/PID env vars or flags.
"""

import time

import numpy as np


def _workload(n_species=8, genome_len=20000, batch=256, read_len=150,
              seed=3):
    """Genome-derived index + reads (real matches, real DP work)."""
    from ..index.builder import IndexBuilder
    from ..taxonomy import Taxonomy

    rng = np.random.default_rng(seed)
    parent = [0, 1, 1] + [2] * n_species
    rank = ["no rank", "no rank", "genus"] + ["species"] * n_species
    pool = sorted(set(rank))
    n = len(parent)
    tax = Taxonomy(np.array(parent), np.array([pool.index(r) for r in rank]),
                   np.arange(n), pool, [f"n{i}" for i in range(n)],
                   np.arange(n))
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    genomes = []
    for s in range(n_species):
        g = "".join(rng.choice(list("ACGT"), genome_len))
        genomes.append(g)
        builder.add_sequence(g, 3 + s)
    index = builder.finalize()
    reads = np.zeros((batch, read_len), dtype=np.uint8)
    for i in range(batch):
        g = genomes[i % n_species]
        st = int(rng.integers(0, len(g) - read_len))
        reads[i] = np.frombuffer(g[st:st + read_len].encode(), np.uint8)
    lengths = np.full(batch, read_len, np.int32)
    return index, reads, lengths


def _throughput(clf, reads, lengths, iters):
    names = [f"r{i}" for i in range(reads.shape[0])]

    def batches():
        for _ in range(iters):
            yield names, reads, lengths, None, None

    t0 = time.perf_counter()
    results = clf.drive_batches(batches())
    dt = time.perf_counter() - t0
    return len(results) / dt


def measure_scaling(device_counts=(1, 2, 4, 8), batch=64, length=150,
                    n_kmers=None, iters=3, genome_len=20000):
    """Production-path scaling across mesh sizes in one process."""
    import jax

    from ..classify.pipeline import Classifier, ClassifyParams
    from .sharding import make_mesh

    index, reads, lengths = _workload(batch=batch, read_len=length,
                                      genome_len=genome_len)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=batch)
    results = {}
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n) if n > 1 else None
        clf = Classifier.from_memory(index, params, mesh=mesh)
        _throughput(clf, reads, lengths, 1)          # compile warmup
        results[n] = _throughput(clf, reads, lengths, iters)
    base = results.get(device_counts[0])
    print("devices\treads_per_s\tspeedup\tefficiency")
    for n, rate in results.items():
        sp = rate / base if base else 0
        print(f"{n}\t{rate:.0f}\t{sp:.2f}\t{sp / (n / device_counts[0]):.2f}")
    return results


def measure_distributed(batch_per_host=256, length=150, iters=3,
                        genome_len=20000):
    """Global-mesh throughput under jax.distributed (call on EVERY
    process).  Returns (global reads/s, per-host reads/s) on process 0;
    other processes return their local share."""
    import jax

    from ..classify.pipeline import Classifier, ClassifyParams
    from .distributed import make_global_mesh

    mesh = make_global_mesh()
    n_proc = jax.process_count()
    batch = batch_per_host * mesh.shape["dp"]
    index, reads, lengths = _workload(batch=batch, read_len=length,
                                      genome_len=genome_len)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=batch)
    clf = Classifier.from_memory(index, params, mesh=mesh)
    local = _throughput(clf, reads, lengths, 1)      # warmup
    local = _throughput(clf, reads, lengths, iters)
    # every process scored batch/n_proc reads in the same wall time
    global_rate = local * n_proc
    if jax.process_index() == 0:
        print(f"hosts={n_proc} devices={len(jax.devices())} "
              f"global_reads_per_s={global_rate:.0f} "
              f"per_host={local:.0f}")
    return global_rate, local


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--distributed", action="store_true",
                    help="measure over the jax.distributed global mesh "
                         "(needs --coordinator/--nproc/--pid or env)")
    ap.add_argument("--coordinator", default=os.environ.get("COORDINATOR"))
    ap.add_argument("--nproc", type=int,
                    default=int(os.environ.get("NPROC", "0")) or None)
    ap.add_argument("--pid", type=int,
                    default=int(os.environ.get("PID", "-1")))
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)
    if args.distributed:
        from .distributed import init_distributed

        init_distributed(args.coordinator, args.nproc,
                         args.pid if args.pid >= 0 else None)
        measure_distributed(batch_per_host=args.batch, iters=args.iters)
    else:
        counts = tuple(int(x) for x in args.devices.split(","))
        measure_scaling(device_counts=counts, batch=args.batch,
                        iters=args.iters)


if __name__ == "__main__":
    main()
