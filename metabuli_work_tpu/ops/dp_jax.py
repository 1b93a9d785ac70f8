"""On-device consecutive-match path DP (the scoring hot loop).

Moves Taxonomer::getMatchPaths (reference src/commons/Taxonomer.cpp:
487-648) onto the TPU: instead of host-sorting 24-byte match records and
chaining them in per-read loops, the DP runs directly on the probe's
[read*frame, window, cap] candidate tensor — window index maps linearly
to query position (pos = begin + 3w forward; descending for reverse
frames, which are flipped so the scan always walks ascending positions),
so "consecutive pos groups" becomes a ring-buffer lookback of the last
maxCodonShift windows inside one lax.scan.  Per step, every candidate
finds its species' nearest predecessor group, checks the shifted
DNA-encoding consecutiveness rule (isConsecutive2 / isConsecutive,
Taxonomer.cpp:671-699), takes the best-score predecessor (first strict
max in the reference's (hamming, dnaEncoding) candidate order — the cap
axis is pre-sorted by the caller), and extends score/depth/hamming with
the reference's f32 accumulation order.  A candidate is emitted as a
MatchPath when it retires from the ring unconnected with
depth >= minConsCnt.

Validity domain: MIN_DEPTH >= 2 (then the reference's "frame group has
>= 2 matches and >= 2 pos groups" emission preconditions are implied);
the pipeline falls back to the host DP for smaller minConsCnt.
"""

import functools

from . import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32
_NO_SPECIES = -1  # plain int: module-level jax scalars become hoisted args


def _match_scores(rh):
    """Vectorized Match::getScore, reference f32 accumulation order."""
    score = jnp.zeros(rh.shape, F32)
    for cnt in range(8):
        h = (rh >> (cnt * 2)) & 3
        inc = jnp.where(h == 0, F32(3.0), F32(2.0) - F32(0.5) * h.astype(F32))
        score = score + inc
    return score


def _score_increment(rh, shift, max_shift):
    s = jnp.zeros(rh.shape, F32)
    for i in range(max_shift):
        h = (rh >> (i * 2)) & 3
        inc = jnp.where(h == 0, F32(3.0), F32(2.0) - F32(0.5) * h.astype(F32))
        s = jnp.where(i < shift, s + inc, s)
    return s


def _ham_increment(rh, shift, max_shift):
    s = jnp.zeros(rh.shape, I32)
    for i in range(max_shift):
        s = s + jnp.where(i < shift, (rh >> (i * 2)) & 3, 0)
    return s


def sort_candidates(fields, sel, ham, dna):
    """Sort the cap axis by (hamming, dnaEncoding), invalid last.

    The reference iterates a pos group's matches in compareMatches order;
    within one (species, frame, pos) that is (hamming, dna) — the
    best-predecessor tie-break depends on it.
    """
    key = jnp.where(sel, (ham << 24) | dna, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(key, axis=-1, stable=True)
    out = {k: jnp.take_along_axis(v, order, axis=-1) for k, v in fields.items()}
    return out


def path_dp(sel, species, dna, rh, ham, pos, min_depth,
            max_shift: int, kmer_format: int):
    # NOTE deliberately not @jax.jit: this always runs inlined inside the
    # fused device step (models/flagship.fused_step_dp); a dual
    # jitted-inside-jit + standalone usage corrupts the executable cache
    # (closure constants get lifted to parameters inconsistently).
    # Standalone callers (tests) wrap it in jax.jit themselves.
    """Path DP over candidate tensors of shape [G, W, cap].

    G = read*frame groups (g % 6 = frame; chains never cross groups),
    W = windows, cap = candidates per window pre-sorted by (ham, dna).
    min_depth: [G] int32 (species-independent per group is NOT enough —
    the euk rule is per species — so this is per-candidate [G, W, cap]).

    Returns dict of [G, W+max_shift, cap] arrays: emit flag + path fields
    (start/end query coords, score, hamming, depth, start-match rh;
    the end match's rh/taxid are the candidate's own).  Row t >= max_shift
    corresponds to scan window t - max_shift; earlier rows never emit.
    """
    G, W, cap = sel.shape
    S = max_shift

    # groups whose positions descend with window index get their window
    # axis flipped so the scan ascends positions everywhere.  Format 2:
    # reverse frames descend; legacy format 1 swaps the pos formulas
    # (OldMetamerScanner), so forward frames descend instead.
    frame_ids = jnp.arange(G, dtype=I32) % 6   # lazy iota: no literal
    rev_g = (frame_ids >= 3) if kmer_format != 1 else (frame_ids < 3)
    rev_g = rev_g[:, None, None]

    def flip(a):
        return jnp.where(rev_g, a[:, ::-1], a)

    sel, species, dna, rh, ham, pos, min_depth = (
        flip(sel), flip(species), flip(dna), flip(rh), flip(ham), flip(pos),
        flip(min_depth),
    )

    score0 = _match_scores(rh)
    sp_m = jnp.where(sel, species, _NO_SPECIES)
    fwd_g = (jnp.arange(G, dtype=I32) % 6 < 3)[:, None, None]

    def step(ring, xs):
        (sel_w, sp_w, dna_w, rh_w, ham_w, pos_w, score_w, md_w) = xs
        (r_sp, r_dna, r_score, r_depth, r_ham, r_start, r_rhs, r_rhe, r_conn,
         r_pos, r_md) = ring

        # nearest previous window (ring slot) containing each candidate's
        # species
        cur_sp = sp_w[:, None, :, None]                     # [G,1,cap,1]
        ring_sp = r_sp[:, :, None, :]                       # [G,S,1,capS]
        same_sp = (ring_sp == cur_sp) & (ring_sp >= 0)      # [G,S,cap,capS]
        has_sp = same_sp.any(axis=3)                        # [G,S,cap]
        slot_idx = jnp.argmax(has_sp, axis=1)               # [G,cap] first hit
        shift = (slot_idx + 1).astype(I32)

        def pick(a):  # ring field at each candidate's slot -> [G,cap,capS]
            src = jnp.broadcast_to(a[:, :, None, :], (G, S, cap, cap))
            idx = jnp.broadcast_to(slot_idx[:, None, :, None], (G, 1, cap, cap))
            return jnp.take_along_axis(src, idx, axis=1)[:, 0]

        pred_sp = pick(r_sp)
        pred_dna = pick(r_dna)
        pred_score = pick(r_score)
        pred_depth = pick(r_depth)
        pred_ham = pick(r_ham)
        pred_start = pick(r_start)
        pred_rhs = pick(r_rhs)

        sh = shift[:, :, None]
        nd = dna_w[:, :, None]
        cd = pred_dna
        mask24 = (jnp.int32(1) << (24 - 3 * sh)) - 1
        if kmer_format == 2:
            # isConsecutive2(cur=pred, next=current) fwd / swapped rev
            ok_fwd = (cd & mask24) == (nd >> (3 * sh))
            ok_rev = (nd & mask24) == (cd >> (3 * sh))
        else:
            ok_fwd = (cd >> (3 * sh)) == (nd & mask24)
            ok_rev = (nd >> (3 * sh)) == (cd & mask24)
        ok = jnp.where(fwd_g, ok_fwd, ok_rev)
        ok &= (pred_sp == sp_w[:, :, None]) & (pred_sp >= 0) & sel_w[:, :, None]

        any_ok = ok.any(axis=2)
        cand_score = jnp.where(ok, pred_score, F32(-1.0))
        best_j = jnp.argmax(cand_score, axis=2)             # first strict max
        take = lambda a: jnp.take_along_axis(a, best_j[:, :, None], axis=2)[:, :, 0]

        inc = _score_increment(rh_w, shift, S)
        hinc = _ham_increment(rh_w, shift, S)
        n_score = jnp.where(any_ok, take(pred_score) + inc, score_w)
        n_depth = jnp.where(any_ok, take(pred_depth) + shift, 1)
        n_ham = jnp.where(any_ok, take(pred_ham) + hinc, ham_w)
        n_start = jnp.where(any_ok, take(pred_start), pos_w)
        n_rhs = jnp.where(any_ok, take(pred_rhs), rh_w)

        # mark connected predecessors in each candidate's slot
        conn_upd = r_conn
        for s in range(S):
            in_slot = (slot_idx == s) & sel_w               # [G,cap]
            hit = (ok & in_slot[:, :, None]).any(axis=1)    # [G,capS]
            conn_upd = conn_upd.at[:, s].set(conn_upd[:, s] | hit)

        # retire oldest slot -> emission
        emitted = {
            "emit": (r_sp[:, S - 1] >= 0) & (~conn_upd[:, S - 1])
                    & (r_depth[:, S - 1] >= r_md[:, S - 1]),
            "species": r_sp[:, S - 1],
            "start": r_start[:, S - 1],
            "end": r_pos[:, S - 1] + 23,
            "score": r_score[:, S - 1],
            "hamming": r_ham[:, S - 1],
            "depth": r_depth[:, S - 1],
            "rh_start": r_rhs[:, S - 1],
            "rh_end": r_rhe[:, S - 1],
        }

        def push(arr, new):
            return jnp.concatenate([new[:, None], arr[:, : S - 1]], axis=1)

        ring = (
            push(r_sp, jnp.where(sel_w, sp_w, I32(_NO_SPECIES))),
            push(r_dna, dna_w),
            push(r_score, n_score),
            push(r_depth, n_depth),
            push(r_ham, n_ham),
            push(r_start, n_start),
            push(r_rhs, n_rhs),
            push(r_rhe, rh_w),
            push(conn_upd, jnp.zeros((G, cap), dtype=bool)),
            push(r_pos, pos_w),
            push(r_md, md_w),
        )
        return ring, emitted

    zi = jnp.zeros((G, S, cap), I32)
    ring0 = (zi - 1, zi,
             jnp.zeros((G, S, cap), F32), zi, zi, zi, zi, zi,
             jnp.zeros((G, S, cap), dtype=bool), zi, zi)

    mv = lambda a: jnp.moveaxis(a, 1, 0)
    xs = (mv(sel), mv(sp_m), mv(dna), mv(rh), mv(ham), mv(pos), mv(score0),
          mv(min_depth))
    ring, emitted = jax.lax.scan(step, ring0, xs)

    # flush S empty windows to retire the rest
    ze = lambda dt: jnp.zeros((S, G, cap), dt)
    empty = (ze(bool), ze(I32) - 1, ze(I32), ze(I32),
             ze(I32), ze(I32), ze(F32), ze(I32))
    _, tail = jax.lax.scan(step, ring, empty)

    out = {}
    for key in emitted:
        main = jnp.moveaxis(emitted[key], 0, 1)
        extra = jnp.moveaxis(tail[key], 0, 1)
        out[key] = jnp.concatenate([main, extra], axis=1)   # [G, W+S, cap]
    return out


def pack_paths(out):
    """Flatten a path_dp output dict into 6 int32 columns [6, G*T*cap].

    Column layout: 0 g (read*6+frame), 1 species, 2 start, 3 end,
    4 score (f32 bits), 5 hamming<<16 | rh_start.  Flat order (g, t, j)
    preserves the reference's per-(frame, pos) emission order.
    """
    G, T, cap = out["emit"].shape
    total = G * T * cap
    flat = lambda a: a.reshape(total)
    g_ids = jnp.broadcast_to(jnp.arange(G, dtype=I32)[:, None, None], (G, T, cap))
    cols = jnp.stack([
        flat(g_ids),
        flat(out["species"].astype(I32)),
        flat(out["start"].astype(I32)),
        flat(out["end"].astype(I32)),
        flat(jax.lax.bitcast_convert_type(out["score"].astype(F32), I32)),
        flat((out["hamming"].astype(I32) << 16) | out["rh_start"].astype(I32)),
        flat(out["rh_end"].astype(I32)),
    ])
    sel = flat(out["emit"])
    return cols, sel


def compact_columns(cols, sel):
    """Scatter valid rows of [C, N] int32 columns to the front."""
    total = sel.shape[0]
    dest = jnp.cumsum(sel.astype(I32)) - 1
    dest = jnp.where(sel, dest, total - 1)
    packed = jnp.zeros_like(cols)
    for i in range(cols.shape[0]):
        packed = packed.at[i, dest].set(cols[i], mode="drop")
    count = jnp.sum(sel).astype(I32)
    return packed, count


def decode_paths(arr):
    """numpy decode of fetched path columns -> dict of arrays."""
    p = np.asarray(arr)
    return {
        "g": p[0],
        "species": p[1].astype(np.int64),
        "start": p[2].astype(np.int64),
        "end": p[3].astype(np.int64),
        "score": p[4].view(np.float32) if p[4].dtype == np.int32 else p[4].astype(np.int32).view(np.float32),
        "hamming": (p[5] >> 16).astype(np.int64),
        "rh_start": (p[5] & 0xFFFF).astype(np.int64),
        "rh_end": p[6].astype(np.int64),
    }
