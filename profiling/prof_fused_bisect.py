"""Stage bisect of the fused step with TRUSTWORTHY timing (D2H-forced;
block_until_ready is a no-op on the axon backend.

Stages, each as its own jit program returning cheap reductions of every
live output (so DCE cannot delete the work being measured):

  extract        6-frame encode + syncmer window compaction
  probe          extract + hash probe + candidate window + hamming
  sort           extract + probe + per-window candidate rank sort
  full(xla)      whole fused_step_dp with the XLA path DP
  full(pallas)   whole fused_step_dp with the compiled Pallas DP

Deltas between consecutive rows attribute the device time.  n batches
are enqueued back-to-back and ONE value fetched at the end; /n
amortizes the ~25 ms tunnel RTT.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.models import flagship
    from metabuli_work_tpu.ops import dp_jax, match_jax

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
    print(f"# chain={clf.hash_chain} rows=2^{clf.hash_log2_rows} cap={cap}",
          flush=True)

    hdev = jax.device_put(np.asarray(clf.hash_table))
    ddev = clf.db_quad
    lens = np.full(B.BATCH, B.READ_LEN, np.int32)
    batches = [jax.device_put(np.ascontiguousarray(
        reads[i * B.BATCH:(i + 1) * B.BATCH])) for i in range(17)]
    jdev = jax.device_put(lens)
    r2 = jax.device_put(np.zeros((B.BATCH, 96), np.uint8))
    j2 = jax.device_put(np.zeros(B.BATCH, np.int32))

    def extract(r1):
        return flagship.extract_queries_step(
            r1, jdev, r2, j2, None, None, syncmer=True, smer_len=5,
            kmer_format=2, win_frac=184, paired=False)

    @jax.jit
    def s_extract(r1):
        qk, qp, qf, qs, qv, wo = extract(r1)
        return qk.sum() + qp.sum().astype(jnp.uint64) + qv.sum()

    @jax.jit
    def s_probe(r1, dbq, ht):
        qk, qp, qf, qs, qv, wo = extract(r1)
        out = match_jax.match_kmers_quad(
            qk, qf, qv, dbq, cap=cap, kmer_format=2, hash_table=ht,
            hash_log2_rows=clf.hash_log2_rows, hash_chain=clf.hash_chain,
            db_m=clf.db_m)
        return sum(v.sum(dtype=jnp.int32) if v.dtype != bool
                   else v.sum(dtype=jnp.int32) for v in out.values())

    @jax.jit
    def s_sort(r1, dbq, ht):
        qk, qp, qf, qs, qv, wo = extract(r1)
        out = match_jax.match_kmers_quad(
            qk, qf, qv, dbq, cap=cap, kmer_format=2, hash_table=ht,
            hash_log2_rows=clf.hash_log2_rows, hash_chain=clf.hash_chain,
            db_m=clf.db_m)
        n = qk.shape[0]
        BF = B.BATCH * 6
        W = n // BF
        resh = lambda a: a[:, :BF * W].reshape(cap, BF, W)
        fields = {
            "sel": resh(out["sel"]), "species": resh(out["species"]),
            "dna": resh(out["dna_enc"]), "rh": resh(out["rh"]),
            "ham": resh(out["hamming"]),
            "pos": jnp.broadcast_to(qp[:BF * W].reshape(1, BF, W),
                                    (cap, BF, W)),
        }
        fields = dp_jax.sort_candidates(fields, fields["sel"],
                                        fields["ham"], fields["dna"])
        return sum(v.sum(dtype=jnp.int32) for v in fields.values())

    def s_full(r1, dbq, ht, pallas):
        hdr, res = flagship.fused_step_dp(
            r1, jdev, r2, j2, dbq, min_cons=4, min_cons_euk=9, cap=cap,
            kmer_format=2, syncmer=True, smer_len=5, paired=False,
            path_width=1 << 16, win_frac=184, path_block=16,
            dp_pallas=pallas, pallas_interpret=False, hash_table=ht,
            hash_log2_rows=clf.hash_log2_rows, hash_chain=clf.hash_chain,
            db_m=clf.db_m)
        return hdr

    def bench_one(name, fn, n=16):
        r = fn(batches[0])
        np.asarray(r)                    # real sync (compile + first run)
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            r = fn(batches[i])
        np.asarray(r)
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"# {name:14s}: {ms:6.1f} ms/batch", flush=True)
        return ms

    bench_one("extract", lambda r1: s_extract(r1))
    bench_one("probe", lambda r1: s_probe(r1, ddev, hdev))
    bench_one("sort", lambda r1: s_sort(r1, ddev, hdev))
    bench_one("full xla-dp", lambda r1: s_full(r1, ddev, hdev, False))
    bench_one("full pallas", lambda r1: s_full(r1, ddev, hdev, True))


if __name__ == "__main__":
    main()
