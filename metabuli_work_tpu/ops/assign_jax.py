"""Device-side species scoring + tie/LCA assignment (XLA, not Pallas).

On-device port of the host scoring flow (classify/taxonomer_vec.py
score_paths + _combine_paths_batch), i.e. the reference's
combineMatchPaths + the species-selection part of chooseBestTaxon
(src/commons/Taxonomer.cpp:410-468 and :130-202).

Motivation: the tunnel-attached TPU moves ~43 MB/s device->host, so
fetching the full per-batch path array (~0.5 MB) dominates the pipeline
wall clock (~40 ms/batch measured, profiling/prof_host.py).  Scoring the
paths on device shrinks the transfer to one [6, B+1] int32 record table
(~24 KB) plus the existing redundancy pair list.

Bit-identity contract (pinned by tests/test_assign_device.py):
* per-(read, species) run order = the host's packed-key stable argsort
  by (qid, species, frame, end) — reproduced by a multi-key
  lexicographic lax.sort whose final key is the flat compaction index
  (the host argsort's stability tiebreak);
* within-run combine order = stable sort by (-score, hamming, -start)
  (float(p.score) is an exact f32->f64 cast, so descending f32 bit
  order is identical);
* greedy accept/trim replay accumulates f32 scores in acceptance order
  (reference Taxonomer.cpp:417-468, trimMatchPath :475-485);
* the per-read tie total accumulates tied run scores in run order with
  sequential f32 adds;
* tie threshold = f32(f64(best) * tie_ratio) (host: float(best) *
  self.tie_ratio then f32 compare).
"""

import functools

from . import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp

I32 = jnp.int32
F32 = jnp.float32
U32 = jnp.uint32


def _part_score(rh, rng, left: bool):
    """Σ per-codon score of the first ``rng`` codons of the 16-bit packed
    per-codon hamming field (right part), or the last ``rng`` (left part)
    — taxonomer._right/_left_part_score, reference Match.h:46-79."""
    s = jnp.zeros(rh.shape, F32)
    for i in range(8):
        sh = (14 - i * 2) if left else (i * 2)
        h = (rh >> sh) & 3
        inc = jnp.where(h == 0, F32(3.0), F32(2.0) - F32(0.5) * h.astype(F32))
        s = jnp.where(i < rng, s + inc, s)
    return s


def _combine_runs(cs0, ce0, sc0, rhs0, rhe0, vrk, K: int):
    """Greedy best-score-first path combination with <24 nt overlap
    trimming, vectorized over [R] runs x [K] sorted slots (mirrors
    taxonomer_vec._combine_hard; reference Taxonomer.cpp:410-485).

    Inputs are already in combine order (slot 0 = best path).  Returns
    the f32 score totals in acceptance order.
    """
    R = cs0.shape[0]
    slot_i = jnp.arange(K, dtype=I32)[None, :]
    col = lambda a, k: jax.lax.dynamic_index_in_dim(a, k, axis=1,
                                                    keepdims=False)

    # ONE dynamic fori over candidate rank k (bounded by the batch's
    # actual max run length), with the kept-slot walk UNROLLED inside
    # the body: sequential while-loop iterations cost ~10-50 us each on
    # TPU regardless of op size, so the K^2/2-iteration nested-loop
    # formulation costs ~20 ms/batch once combine_k grows; straight-line
    # masked trim blocks inside one iteration are nearly free
    def outer(k, st):
        kept_s, kept_e, kept_n, total = st
        cs_k = col(cs0, k)
        ce_k = col(ce0, k)
        sc_k = col(sc0, k)
        alive = col(vrk.astype(I32), k) != 0
        rhs_k = col(rhs0, k)
        rhe_k = col(rhe0, k)

        for j in range(K):                    # unrolled, masked by j < k
            cj_ok = alive & (j < k) & (j < kept_n)
            cs = kept_s[:, j]
            ce = kept_e[:, j]
            inter = cj_ok & ~(ce_k < cs) & ~(ce < cs_k)
            ov = jnp.minimum(ce_k, ce) - jnp.maximum(cs_k, cs) + 1
            full = inter & (ov == ce_k - cs_k + 1)
            trim = inter & ~full & (ov < 24)
            alive = alive & ~(full | (inter & ~full & (ov >= 24)))
            left_side = cs_k < cs
            rng = jnp.maximum(ov, 0) // 3
            tail = (ov - 3 * rng).astype(F32)
            part = jnp.where(left_side,
                             _part_score(rhe_k, rng, left=False),
                             _part_score(rhs_k, rng, left=True))
            sc_k = jnp.where(trim, (sc_k - part) - tail, sc_k)
            ce_k = jnp.where(trim & left_side, cs - 1, ce_k)
            cs_k = jnp.where(trim & ~left_side, ce + 1, cs_k)

        oh = (slot_i == kept_n[:, None]) & alive[:, None]
        kept_s = jnp.where(oh, cs_k[:, None], kept_s)
        kept_e = jnp.where(oh, ce_k[:, None], kept_e)
        kept_n = kept_n + alive.astype(I32)
        total = jnp.where(alive, total + sc_k, total)
        return kept_s, kept_e, kept_n, total

    kmax = jnp.max(jnp.where(vrk, slot_i, 0)).astype(I32) + 1
    init = (jnp.zeros((R, K), I32), jnp.zeros((R, K), I32),
            jnp.zeros(R, I32), jnp.zeros(R, F32))
    _, _, _, total = jax.lax.fori_loop(0, jnp.minimum(kmax, K), outer, init)
    return total


def device_assign(paths_packed, n_paths, qlens, ef_node, euler, depth, lift,
                  min_score: float, tie_ratio: float, combine_k: int):
    """Score species and pick per-read classifications on device.

    paths_packed: [5, P] compact5 path columns (dp_pallas/pack_paths
    layout: g<<16|start, end<<16|rh_start, rh_end<<16|ham, species,
    score_bits); rows past ``n_paths`` are junk (masked here).
    qlens: [B+1] int32 total read length per 1-based read id.
    ef_node: [n_nodes] int32 euler-first coordinate per taxid;
    euler/depth/lift: the LCA tables already used by redundancy_counts.

    Returns (records [6, B+1] int32, best_sp [B+1] int32, over_k int32):
      row 0 live, 1 tie_cnt, 2 total f32 bits, 3 tied-set LCA,
      4 first tied species, 5 top (first kept) species.
    best_sp = first_tied for single-tie reads passing min_score — the
    redundancy kernel's input.  over_k counts paths beyond combine_k in
    their run (host doubles combine_k and re-runs).
    """
    from ..models.flagship import _lca_pair_lift

    P = paths_packed.shape[1]
    B1 = qlens.shape[0]
    K = combine_k
    BIGI = jnp.int32(0x7FFFFFFF)

    u0 = paths_packed[0].astype(U32)
    g = (u0 >> U32(16)).astype(I32)
    start = (u0 & U32(0xFFFF)).astype(I32)
    u1 = paths_packed[1].astype(U32)
    end = (u1 >> U32(16)).astype(I32)
    rhs = (u1 & U32(0xFFFF)).astype(I32)
    u2 = paths_packed[2].astype(U32)
    rhe = (u2 >> U32(16)).astype(I32)
    ham = (u2 & U32(0xFFFF)).astype(I32)
    sp = paths_packed[3]
    sb = paths_packed[4]                       # f32 bits, non-negative
    qid = g // 6 + 1
    frame = g % 6
    iota = jnp.arange(P, dtype=I32)
    valid = iota < n_paths

    # ---- one 6-key sort = host (qid, species, frame, end) argsort +
    # per-run stable (-score, ham, -start) combine sort.  All keys are
    # native i32 — u64 keys sort ~5x slower (emulated compares) ------- #
    k_qid = jnp.where(valid, qid, BIGI)
    k_sc = BIGI - sb                           # descending f32 bit order
    k_hs = (ham << 16) | (0xFFFF - start)      # ham asc, start desc
    k_fe = (frame << 16) | end                 # host insertion tiebreak
    _, _, _, _, _, perm = jax.lax.sort(
        (k_qid, sp, k_sc, k_hs, k_fe, iota), num_keys=6)
    take = lambda a: a[perm]
    qid_s, sp_s, cs_s, ce_s, sb_s, rhs_s, rhe_s, kq_s = map(
        take, (qid, sp, start, end, sb, rhs, rhe, k_qid))
    valid_s = iota < n_paths                   # invalids sort to the end

    # run boundary: (qid, species) change — two i32 compares, no u64 key
    new_run = valid_s & ((iota == 0) | (kq_s != jnp.roll(kq_s, 1))
                         | (sp_s != jnp.roll(sp_s, 1)))
    run_id = jnp.cumsum(new_run.astype(I32)) - 1
    seg_start = jax.lax.cummax(jnp.where(new_run, iota, 0))
    k_in = iota - seg_start
    over_k = jnp.sum(valid_s & (k_in >= K), dtype=I32)

    # ---- run-space arrays (indexed by run_id, width P) --------------- #
    dest0 = jnp.where(new_run, run_id, P)
    sp_run = jnp.zeros(P, I32).at[dest0].set(sp_s, mode="drop")
    qid_run = jnp.zeros(P, I32).at[dest0].set(qid_s, mode="drop")
    pos_run = jnp.zeros(P, I32).at[dest0].set(iota, mode="drop")
    sc1_run = jnp.zeros(P, I32).at[dest0].set(sb_s, mode="drop")
    v_run = jnp.zeros(P, I32).at[dest0].set(1, mode="drop") != 0

    # ---- multi-path runs only go through the combine loop ------------ #
    # single-path runs (the vast majority) need no greedy: total = score.
    # Multi-path runs are compacted into an R2 = P // 2 row space (every
    # such run holds >= 2 paths, so their count can never exceed P // 2),
    # shrinking every [rows, K] tensor the sequential loop touches.
    R2 = max(P // 2, 1)
    ge2_run = jnp.zeros(P, I32).at[
        jnp.where(valid_s & (k_in == 1), run_id, P)].set(1, mode="drop")
    multi_id_run = jnp.cumsum(ge2_run) - 1          # run space -> R2 space
    row_multi = ge2_run[jnp.clip(run_id, 0, P - 1)] != 0
    OOB = R2 * K
    dest = jnp.where(valid_s & row_multi & (k_in < K),
                     multi_id_run[jnp.clip(run_id, 0, P - 1)] * K + k_in,
                     OOB)

    def pack(a):
        return jnp.zeros(R2 * K, a.dtype).at[dest].set(
            a, mode="drop").reshape(R2, K)

    cs_rk = pack(cs_s)
    ce_rk = pack(ce_s)
    sc_rk = pack(jax.lax.bitcast_convert_type(sb_s, F32))
    rhs_rk = pack(rhs_s)
    rhe_rk = pack(rhe_s)
    v_rk = pack(valid_s.astype(I32)) != 0

    total_multi = _combine_runs(cs_rk, ce_rk, sc_rk, rhs_rk, rhe_rk, v_rk, K)
    total_run = jnp.where(
        ge2_run != 0,
        total_multi[jnp.clip(multi_id_run, 0, R2 - 1)],
        jax.lax.bitcast_convert_type(sc1_run, F32))
    qlen_f = qlens[jnp.clip(qid_run, 0, B1 - 1)].astype(F32)
    sc = jnp.minimum(total_run / jnp.maximum(qlen_f, F32(1.0)), F32(1.0))

    # ---- per-read selection (host _score_paths_vec semantics) ------- #
    # min_score compares happen in f64 (host: f32 array vs Python float
    # promotes to f64); a f32-cast threshold would flip edge cases
    ms64 = jnp.float64(min_score)
    keep = v_run & ~(sc.astype(jnp.float64) < ms64)
    qr = jnp.clip(qid_run, 0, B1 - 1)
    meaningful = jnp.zeros(B1, I32).at[qr].add(
        jnp.where(keep & (sc > 0), 1, 0), mode="drop")
    kept_cnt = jnp.zeros(B1, I32).at[qr].add(
        jnp.where(keep, 1, 0), mode="drop")
    best = jnp.full(B1, -jnp.inf, F32).at[qr].max(
        jnp.where(keep, sc, -jnp.inf), mode="drop")
    thr = (best.astype(jnp.float64) * jnp.float64(tie_ratio)).astype(F32)
    tied = keep & (sc >= thr[qr])
    tie_cnt = jnp.zeros(B1, I32).at[qr].add(
        jnp.where(tied, 1, 0), mode="drop")

    # ordered f32 tie total: rank-k rounds in run order
    c = jnp.cumsum(tied.astype(I32))
    read_base = jnp.full(B1, BIGI, I32).at[qr].min(
        jnp.where(v_run, c - tied.astype(I32), BIGI), mode="drop")
    rank = jnp.where(tied, c - 1 - read_base[qr], -1)

    def tie_round(k, tot):
        selk = rank == k
        return tot.at[qr].add(jnp.where(selk, sc, F32(0.0)), mode="drop")

    n_rounds = jnp.maximum(jnp.max(rank) + 1, 0)
    total = jax.lax.fori_loop(0, n_rounds, tie_round, jnp.zeros(B1, F32))

    # tied-set LCA via extremal euler-first coords (set-LCA = pairwise
    # LCA of the min/max members, as in redundancy_counts)
    ef = ef_node[jnp.clip(sp_run, 0, ef_node.shape[0] - 1)]
    emin = jnp.full(B1, BIGI, I32).at[qr].min(
        jnp.where(tied, ef, BIGI), mode="drop")
    emax = jnp.full(B1, -1, I32).at[qr].max(
        jnp.where(tied, ef, -1), mode="drop")
    a = euler[jnp.clip(emin, 0, euler.shape[0] - 1)]
    b = euler[jnp.clip(emax, 0, euler.shape[0] - 1)]
    lca = _lca_pair_lift(a, b, depth, lift).astype(I32)

    # first tied / first kept species (min flat position)
    ft_pos = jnp.full(B1, BIGI, I32).at[qr].min(
        jnp.where(tied, pos_run, BIGI), mode="drop")
    top_pos = jnp.full(B1, BIGI, I32).at[qr].min(
        jnp.where(keep, pos_run, BIGI), mode="drop")
    sp_sorted = sp_s                           # sp at flat sorted position
    first_tied = jnp.where(ft_pos < BIGI,
                           sp_sorted[jnp.clip(ft_pos, 0, P - 1)], 0)
    top_sp = jnp.where(top_pos < BIGI,
                       sp_sorted[jnp.clip(top_pos, 0, P - 1)], 0)

    live = (kept_cnt > 0) & (meaningful > 0)
    deferred = live & (tie_cnt == 1) & (total != 0) \
        & ~(total.astype(jnp.float64) < ms64)
    best_sp = jnp.where(deferred, first_tied, 0)

    records = jnp.stack([
        live.astype(I32), tie_cnt,
        jax.lax.bitcast_convert_type(total, I32),
        jnp.where(live & (tie_cnt > 1), lca, 0),
        first_tied, top_sp,
    ])
    return records, best_sp, over_k
