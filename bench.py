"""Benchmark: end-to-end classification throughput (reads/sec/chip).

Synthetic analogue of BASELINE config 2 (GTDB-subset-like DB + 150 bp
Illumina reads): builds an in-memory multi-genome DB, simulates reads
with 1% error, warms up the device pipeline, then measures steady-state
end-to-end throughput (device extract+match+DP, host scoring).

DB structure mirrors real taxonomy scales: two independent genera
(random bases, no cross-genus homology) of four species each at ~96.5%
within-genus identity — GTDB congeners sit at 80-97% ANI; fully-clonal
genomes (the old setup: eight species 95% identical to ONE base) are a
strain-resolution corner case, not the headline metagenome workload.
The DB is built with syncmer selection (the reference's current default:
half the k-mers, ~2x classification speed, README.md:35).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against REFERENCE_READS_PER_SEC, a nominal
single-node throughput for the reference C++ Metabuli on short reads
(the repo publishes no formal tables — BASELINE.md; this constant is a
placeholder until a reference binary measurement exists).
"""

import json
import sys
import time

import numpy as np

REFERENCE_READS_PER_SEC = 10_000.0  # nominal; see module docstring

N_GENOMES = 8
GENOME_LEN = 200_000
N_READS = 24576
N_WARM = 3072          # unmeasured reads: compile + estimate stabilization
READ_LEN = 150
BATCH = 1024


def build_synthetic(rng):
    from metabuli_work_tpu.index.builder import IndexBuilder
    from metabuli_work_tpu.taxonomy import Taxonomy

    # taxonomy: N_GENOMES species under 2 genera
    n = N_GENOMES
    parent = [0, 1, 1, 1]  # 0 unused, 1 root, 2/3 genera
    rank_idx, name_idx = [0, 0, 1, 1], [0, 0, 1, 2]
    rank_pool = ["no rank", "genus", "species"]
    name_pool = ["root", "G1", "G2"]
    int2orig = [0, 1, 101, 102]
    for i in range(n):
        parent.append(2 + (i % 2))
        rank_idx.append(2)
        name_pool.append(f"Species{i}")
        name_idx.append(3 + i)
        int2orig.append(1000 + i)
    tax = Taxonomy(np.array(parent), np.array(rank_idx), np.array(name_idx),
                   rank_pool, name_pool, np.array(int2orig))

    genomes = []
    builder = IndexBuilder(tax, syncmer=True, mask_mode=0)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    bases = [rng.choice(acgt, size=GENOME_LEN) for _ in range(2)]  # 2 genera
    for i in range(n):
        g = bases[i % 2].copy()
        mut = rng.random(GENOME_LEN) < 0.035  # ~96.5% within-genus identity
        g[mut] = rng.choice(acgt, size=int(mut.sum()))
        seq = g.tobytes().decode()
        genomes.append(seq)
        builder.add_sequence(seq, 4 + i)
    return builder.finalize(), tax, genomes


def simulate_reads(genomes, rng):
    reads = np.zeros((N_READS, READ_LEN), dtype=np.uint8)
    comp = np.zeros(256, dtype=np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b
    for i in range(N_READS):
        g = genomes[int(rng.integers(0, len(genomes)))].encode()
        s = int(rng.integers(0, len(g) - READ_LEN))
        r = np.frombuffer(g[s:s + READ_LEN], dtype=np.uint8).copy()
        err = rng.random(READ_LEN) < 0.01
        r[err] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=int(err.sum()))
        if rng.random() < 0.5:
            r = comp[r[::-1]]
        reads[i] = r
    return reads


def main():
    rng = np.random.default_rng(0)
    t0 = time.time()
    index, tax, genomes = build_synthetic(rng)
    reads = simulate_reads(genomes, rng)
    print(f"# setup: DB {index.size} kmers, {N_READS} reads ({time.time()-t0:.1f}s)",
          file=sys.stderr)

    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=BATCH)
    clf = Classifier.from_memory(index, params)

    names = [f"r{i}" for i in range(BATCH)]

    # warmup: first batch compiles the fused step; the next ones let the
    # prefix-size estimates settle so the measured loop reuses executables
    t0 = time.time()
    lens = np.full(BATCH, READ_LEN, dtype=np.int32)
    warm = ((names, reads[b * BATCH:(b + 1) * BATCH], lens, None, None)
            for b in range(N_WARM // BATCH))
    clf.drive_batches(warm)
    print(f"# warmup ({N_WARM} reads): {time.time()-t0:.1f}s", file=sys.stderr)
    from metabuli_work_tpu.utils.timing import StageTimer
    clf.timer = StageTimer()  # drop warmup/compile from stage stats

    # steady state: the production 2-deep pipeline (same as classify_file)
    n_batches = N_READS // BATCH
    t0 = time.time()
    batches = ((names, reads[b * BATCH:(b + 1) * BATCH], lens, None, None)
               for b in range(n_batches))
    res = clf.drive_batches(batches)
    classified = sum(1 for q in res if q.result.is_classified)
    dt = time.time() - t0
    rate = N_READS / dt
    print(f"# measured: {N_READS} reads in {dt:.2f}s, {classified} classified",
          file=sys.stderr)
    print("# " + clf.timer.report().replace("\n", "\n# "), file=sys.stderr)

    print(json.dumps({
        "metric": "reads_per_sec_per_chip_150bp",
        "value": round(rate, 1),
        "unit": "reads/s",
        "vs_baseline": round(rate / REFERENCE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
