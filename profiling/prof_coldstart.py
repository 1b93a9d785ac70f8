"""Break down the cold-start cost: DB load, packing, upload, compile.

Run: python profiling/prof_coldstart.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("METABULI_BENCH_NO_GOLDEN", "1")

import numpy as np  # noqa: E402

import bench  # noqa: E402

bench._enable_compile_cache()
import jax.numpy as jnp  # noqa: E402


def t(label, f):
    t0 = time.time()
    r = f()
    print(f"  {label:34s} {time.time()-t0:8.1f}s", file=sys.stderr)
    return r


def main():
    t0 = time.time()
    cache = os.path.expanduser(
        f"~/.cache/mwt_bench_db_{bench.N_GENOMES}_{bench.GENOME_LEN}.npz")
    z = np.load(cache, allow_pickle=False)
    tax = bench._bench_taxonomy()
    v, ti, s = t("npz load (v,t,s)",
                 lambda: (z["v"], z["t"], z["s"]))
    genomes = t("npz load genomes",
                lambda: [g.decode() for g in z["genomes"]])
    print(f"  n_kmers = {len(v):,}", file=sys.stderr)

    rng = np.random.default_rng(0)
    reads = t("simulate_reads (49152)", lambda: bench.simulate_reads(genomes, rng))

    from metabuli_work_tpu.index.format import KmerIndex
    from metabuli_work_tpu.ops.match_jax import (
        align_runs4,
        build_aa_hash,
        pack_db_quad,
        pack_db_rows32,
    )

    index = KmerIndex(v, ti, s, tax, {
        "kmer_format": 2, "syncmer": True, "smer_len": 5, "reduced_aa": 0,
        "mask_mode": 0, "mask_prob": 0.9, "skip_redundancy": 1})

    # replicate _init_from_index's resident packing path piecewise
    ef = np.zeros(len(tax.euler), np.int32)  # placeholder shape probe only
    runs = t("_aa_runs", lambda: index._aa_runs())
    db_ef = np.zeros(len(v), np.int32)
    sp_euk = np.zeros(len(v), np.int32)
    v_pad, ef_pad, sp_pad, starts_pad = t(
        "align_runs4", lambda: align_runs4(v, db_ef, sp_euk))
    quad_np = t("pack_db_quad", lambda: pack_db_quad(v_pad, ef_pad, sp_pad))
    rows_np = t("pack_db_rows32", lambda: pack_db_rows32(quad_np))
    print(f"  quad rows bytes = {rows_np.nbytes/1e9:.2f} GB", file=sys.stderr)
    ht, lg, ch = t("build_aa_hash", lambda: build_aa_hash(
        v, max_chain=1, max_bytes=3 * (1 << 30),
        starts_override=starts_pad, slots=42, row_u32=128))
    print(f"  hash bytes = {ht.nbytes/1e9:.2f} GB (log2_rows={lg}, chain={ch})",
          file=sys.stderr)
    dq = t("jnp.asarray(quad) enqueue", lambda: jnp.asarray(rows_np))
    dh = t("jnp.asarray(hash) enqueue", lambda: jnp.asarray(ht))
    t("upload drain (fetch 1 elt each)",
      lambda: (np.asarray(dq[0, :1]), np.asarray(dh[0, :1])))
    print(f"  TOTAL {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
