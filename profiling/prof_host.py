"""Fine-grained host-stage breakdown of the production pipeline.

The bench shows host stages (score 10.5, hdr_sync 8.6, redundancy_sync
4.4, dispatch 3.4 ms/batch) bound the wall clock.  This script runs the
bench workload and breaks those stages into sub-pieces, and checks
whether copy_to_host_async actually exists on the axon backend (its
absence would make every np.asarray a blocking tunnel round trip).
"""
import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B


def main():
    import jax
    import jax.numpy as jnp
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.ops import dp_jax

    rng = np.random.default_rng(0)
    index, tax, genomes = B.build_synthetic(rng)
    reads = B.simulate_reads(genomes, rng)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=B.BATCH)
    clf = Classifier.from_memory(index, params)
    names = [f"r{i}" for i in range(B.BATCH)]
    lens = np.full(B.BATCH, B.READ_LEN, dtype=np.int32)

    x = jnp.zeros(8)
    print("copy_to_host_async exists:", hasattr(x, "copy_to_host_async"),
          flush=True)

    warm = ((names, reads[b * B.BATCH:(b + 1) * B.BATCH], lens, None, None)
            for b in range(8))
    clf.drive_batches(warm)
    print(f"knobs: cap={clf.cap} path_est={clf._path_estimate} "
          f"win_frac={clf._win_frac} path_block={clf._path_block}", flush=True)

    # manual 2-phase pipeline with fine timers
    T = {}
    def t(k, dt):
        T[k] = T.get(k, 0.0) + dt

    nb = 12
    ctxs = []
    t_all0 = time.perf_counter()
    for b in range(nb + 2):
        if b < nb:
            t0 = time.perf_counter()
            ctx = clf._dispatch_batch(names, reads[(b % 16) * B.BATCH:
                                                   (b % 16 + 1) * B.BATCH],
                                      lens, None, None)
            t(  "dispatch", time.perf_counter() - t0)
            ctxs.append(ctx)
        if b >= 2 and ctxs:
            ctx = ctxs.pop(0)
            t0 = time.perf_counter()
            hdr = np.asarray(ctx["prefix"])
            t("p1.hdr_fetch", time.perf_counter() - t0)
            st = hdr[:4, 0]
            n = int(st[1])
            t0 = time.perf_counter()
            arr = hdr[:, 1:n + 1] if n <= ctx["est"] else \
                np.asarray(ctx["paths"][:, 1:n + 1])
            t("p1.arr", time.perf_counter() - t0)
            t0 = time.perf_counter()
            paths = dp_jax.decode_paths(arr)
            t("p1.decode", time.perf_counter() - t0)
            qid = (paths["g"] // 6 + 1).astype(np.int64)
            frame = (paths["g"] % 6).astype(np.int64)
            t0 = time.perf_counter()
            key = (((qid << 25) | paths["species"]) << 19) \
                | (frame << 16) | paths["end"]
            order = np.argsort(key, kind="stable")
            t("p1.sort", time.perf_counter() - t0)
            t0 = time.perf_counter()
            pa = {k2: paths[k2][order] for k2 in
                  ("species", "start", "end", "score", "hamming",
                   "rh_start", "rh_end")}
            pa["qid"] = qid[order]
            t("p1.reorder", time.perf_counter() - t0)
            from metabuli_work_tpu.classify.taxonomer import ReadResult as RR
            results = [RR() for _ in range(B.BATCH)]
            qlens = np.zeros(B.BATCH + 1, dtype=np.int64)
            qlens[1:] = lens
            t0 = time.perf_counter()
            deferred = clf.taxonomer.score_paths(pa, qlens, results)
            t("p1.score_paths", time.perf_counter() - t0)
            t0 = time.perf_counter()
            if deferred:
                best_sp = np.zeros(B.BATCH + 1, dtype=np.int32)
                for rid, _, _, taxid in deferred:
                    best_sp[rid] = taxid
                from metabuli_work_tpu.models.flagship import redundancy_counts
                sel, species, ham, ef, q_pos, q_sids = ctx["resident"]
                packed2 = redundancy_counts(
                    sel, species, ham, ef, q_pos, q_sids,
                    jnp.asarray(best_sp), clf.euler, clf.lca_depth,
                    clf.lca_lift, dna_shift=int(clf.taxonomer.dna_shift),
                    n_quot=ctx["n_quot"], part_w=ctx["part_w"])
                prefix2 = packed2[:, :]
                try:
                    prefix2.copy_to_host_async()
                except AttributeError:
                    pass
            t("p1.redund_disp", time.perf_counter() - t0)
            if b == 5:
                print(f"  n_paths={n} est={ctx['est']} "
                      f"deferred={len(deferred)}", flush=True)
            ctxs2 = getattr(clf, "_x2", [])
            ctxs2.append((deferred, prefix2 if deferred else None, qlens,
                          results))
            clf._x2 = ctxs2
        if b >= 4 and getattr(clf, "_x2", None):
            deferred, prefix2, qlens, results = clf._x2.pop(0)
            t0 = time.perf_counter()
            if deferred:
                hdr2 = np.asarray(prefix2)
                t("p2.fetch", time.perf_counter() - t0)
                n2 = int(hdr2[0, 0])
                m2 = hdr2[:, 1:n2 + 1]
                t0 = time.perf_counter()
                from metabuli_work_tpu.classify.native_score import (
                    available, count_pairs)
                tax_cnts = {}
                if available():
                    u_rid, u_tax, u_cnt = count_pairs(m2[0], m2[1])
                    for r_, t_, c_ in zip(u_rid.tolist(), u_tax.tolist(),
                                          u_cnt.tolist()):
                        tax_cnts.setdefault(r_, {})[t_] = c_
                t("p2.count", time.perf_counter() - t0)
                t0 = time.perf_counter()
                clf.taxonomer.finish_with_taxcnt(deferred, tax_cnts, qlens,
                                                 results)
                t("p2.finish", time.perf_counter() - t0)
    wall = time.perf_counter() - t_all0
    print(f"wall {wall / nb * 1000:.2f} ms/batch "
          f"({B.BATCH * nb / wall:.0f} reads/s)", flush=True)
    for k in sorted(T):
        print(f"  {k:16s} {T[k] / nb * 1000:7.2f} ms/batch", flush=True)


main()
