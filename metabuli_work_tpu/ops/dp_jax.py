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

import os as _os

# candidate-sort implementation switch (profiling/prof_sort_ab.py):
# lax.sort variadic vs the one-hot rank permute; default lax.sort
_USE_LAX_SORT = _os.environ.get("METABULI_LAX_SORT", "1") == "1"

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
    """Sort the leading cap axis by (hamming, dnaEncoding), invalid last.

    The reference iterates a pos group's matches in compareMatches order;
    within one (species, frame, pos) that is (hamming, dna) — the
    best-predecessor tie-break depends on it.

    Implemented as a stable rank computation + one-hot permutation over
    the (small, static) cap axis: cap^2 broadcast compares and masked
    sums, no lax.sort / take_along_axis (XLA sorts along a minor axis of
    ~10 lower terribly on TPU, and the candidate tensors keep their large
    minor axis this way).

    The sort key (ham << 24) | dna (invalid -> 0x7FFFFFFF) is permuted
    ONCE and "sel"/"ham"/"dna" are unpacked from it instead of paying
    three more cap^2 one-hot reductions — so on lanes with sel=False the
    returned ham/dna are 127/0xFFFFFF rather than the original unsorted
    values (path_dp never reads them there: unselected lanes carry
    species=-1 through the scan and can neither connect nor emit).
    """
    key = jnp.where(sel, (ham << 24) | dna, jnp.int32(0x7FFFFFFF))
    cap = key.shape[0]
    if _USE_LAX_SORT:
        # variadic lax.sort along the cap-major axis: XLA lowers the
        # short (cap<=16) sort dim to a vectorized network across the
        # minor lanes — measured ~equal/slightly faster than the
        # one-hot permute (profiling/prof_sort_ab.py); stable, so the
        # (ham, dna) tie order matches compareMatches exactly like the
        # rank sort did
        payload = [v for k, v in sorted(fields.items())
                   if k not in ("sel", "ham", "dna")]
        names = [k for k in sorted(fields) if k not in ("sel", "ham", "dna")]
        res = jax.lax.sort((key, *payload), dimension=0, num_keys=1,
                           is_stable=True)
        key_s = res[0]
        out = dict(zip(names, res[1:]))
        out["sel"] = key_s != jnp.int32(0x7FFFFFFF)
        out["ham"] = key_s >> 24
        out["dna"] = key_s & jnp.int32(0xFFFFFF)
        return out
    ki = key[:, None]                     # [cap(src i), 1, ...]
    kj = key[None, :]                     # [1, cap(src j), ...]
    tri = jnp.arange(cap)[None, :] < jnp.arange(cap)[:, None]   # j < i
    tri = tri.reshape((cap, cap) + (1,) * (key.ndim - 1))
    rank = jnp.sum((kj < ki) | ((kj == ki) & tri), axis=1).astype(I32)
    dest = jnp.arange(cap, dtype=I32).reshape((cap,) + (1,) * key.ndim)
    oh = rank[None, :] == dest            # [cap(dest), cap(src), ...]

    def permute(v):
        if v.dtype == jnp.bool_:
            return jnp.any(oh & v[None], axis=1)
        return jnp.sum(jnp.where(oh, v[None], jnp.zeros((), v.dtype)), axis=1,
                       dtype=v.dtype)

    key_s = permute(key)
    out = {}
    for k, v in fields.items():
        if k == "sel":
            out[k] = key_s != jnp.int32(0x7FFFFFFF)
        elif k == "ham":
            out[k] = key_s >> 24
        elif k == "dna":
            out[k] = key_s & jnp.int32(0xFFFFFF)
        else:
            out[k] = permute(v)
    return out


def path_dp(sel, species, dna, rh, ham, pos, min_depth,
            max_shift: int, kmer_format: int, dyn_gap: bool = False):
    # NOTE deliberately not @jax.jit: this always runs inlined inside the
    # fused device step (models/flagship.fused_step_dp); a dual
    # jitted-inside-jit + standalone usage corrupts the executable cache
    # (closure constants get lifted to parameters inconsistently).
    # Standalone callers (tests) wrap it in jax.jit themselves.
    """Path DP over candidate tensors of shape [cap, G, W] (cap-major:
    the large G/W axes stay minor so TPU (8, 128) tiling doesn't pad the
    ~10-wide cap axis 12.8x).

    G = read*frame groups (g % 6 = frame; chains never cross groups),
    W = windows, cap = candidates per window pre-sorted by (ham, dna).
    min_depth: per-candidate [cap, G, W] (species-independent per group
    is NOT enough — the euk rule is per species).

    The lookback over the last max_shift windows is UNROLLED (S is a small
    static constant, 1 by default, 8-smer_len for syncmer): each shift s
    does one [capS, cap, G] broadcast compare + masked one-hot reduction.
    Gather-free on purpose — an earlier ring-buffer formulation using
    take_along_axis over a [G, S, cap, cap] tensor plus scatter-updates
    lowered to pathological (and on TPU incorrect) code.

    dyn_gap=True: the W axis holds COMPACTED windows (syncmer anchors
    only, encode_jax.compact_windows), so the codon shift between a
    window and lookback state s is no longer the static s+1 — it is
    recomputed per step from the stored positions ((pos - p_pos) / 3,
    connectable iff 1 <= gap <= max_shift).  Since every compacted step
    advances the position by >= 3 nt, a state older than S steps has
    gap > max_shift and the S-deep retirement stays exact.

    Returns dict of [W+max_shift, cap, G] arrays: emit flag + path fields
    (start/end query coords, score, hamming, depth, start-match rh;
    the end match's rh/taxid are the candidate's own).  Row t >= max_shift
    corresponds to scan window t - max_shift; earlier rows never emit.
    """
    cap, G, W = sel.shape
    S = max_shift

    # groups whose positions descend with window index get their window
    # axis flipped so the scan ascends positions everywhere.  Format 2:
    # reverse frames descend; legacy format 1 swaps the pos formulas
    # (OldMetamerScanner), so forward frames descend instead.
    frame_ids = jnp.arange(G, dtype=I32) % 6   # lazy iota: no literal
    rev_g = (frame_ids >= 3) if kmer_format != 1 else (frame_ids < 3)
    rev_g = rev_g[None, :, None]

    def flip(a):
        return jnp.where(rev_g, a[:, :, ::-1], a)

    sel, species, dna, rh, ham, pos, min_depth = (
        flip(sel), flip(species), flip(dna), flip(rh), flip(ham), flip(pos),
        flip(min_depth),
    )

    score0 = _match_scores(rh)
    sp_m = jnp.where(sel, species, _NO_SPECIES)
    fwd_g = (jnp.arange(G, dtype=I32) % 6 < 3)[None, None, :]  # [1,1,G]

    # carry: S per-window states, newest first; each state is a tuple of
    # [cap, G] arrays (sp, dna, score, depth, ham, start, rh_start, rh_end,
    # connected, pos, min_depth)
    def step(states, xs):
        sel_w, sp_w, dna_w, rh_w, ham_w, pos_w, score_w, md_w = xs
        cur_sp = sp_w[None]                                 # [1,cap,G]
        nd = dna_w[None]

        found = jnp.zeros(sel_w.shape, dtype=bool)          # species seen closer
        any_ok = jnp.zeros(sel_w.shape, dtype=bool)
        shift_sel = jnp.zeros(sel_w.shape, I32)
        b_score = jnp.zeros(sel_w.shape, F32)
        b_depth = jnp.zeros(sel_w.shape, I32)
        b_ham = jnp.zeros(sel_w.shape, I32)
        b_start = jnp.zeros(sel_w.shape, I32)
        b_rhs = jnp.zeros(sel_w.shape, I32)
        hits = []                                           # per-state conn marks

        for s, st in enumerate(states):
            p_sp, p_dna, p_score, p_depth, p_ham, p_start, p_rhs = st[:7]
            # the predecessor window is the NEAREST one containing the
            # candidate's species; consecutiveness is checked there only
            same_sp = (p_sp[:, None] == cur_sp) & (p_sp[:, None] >= 0)
            has_sp = same_sp.any(axis=0)                    # [cap,G]
            use_s = has_sp & ~found & sel_w
            found = found | has_sp

            cd = p_dna[:, None]                             # [capS,1,G]
            if dyn_gap:
                # codon shift from stored positions (compacted windows);
                # every state row holds the same window pos, so row 0 is
                # representative
                p_pos0 = st[9][0]                           # [G]
                gapv = (pos_w - p_pos0[None, :]) // 3       # [cap,G]
                ok_gap = (gapv >= 1) & (gapv <= S)
                shv = jnp.clip(gapv, 1, S)
                sh3 = (3 * shv)[None]                       # [1,cap,G]
                mask24 = (I32(1) << (24 - sh3)) - 1
            else:
                shv = I32(s + 1)                            # static codon shift
                ok_gap = None
                sh3 = 3 * (s + 1)
                mask24 = (1 << (24 - sh3)) - 1
            if kmer_format == 2:
                # isConsecutive2(cur=pred, next=current) fwd / swapped rev
                ok_f = (cd & mask24) == (nd >> sh3)
                ok_r = (nd & mask24) == (cd >> sh3)
            else:
                ok_f = (cd >> sh3) == (nd & mask24)
                ok_r = (nd >> sh3) == (cd & mask24)
            ok = jnp.where(fwd_g, ok_f, ok_r) & same_sp & use_s[None]
            if ok_gap is not None:
                ok = ok & ok_gap[None]

            aok = ok.any(axis=0)                            # [cap,G]
            cand = jnp.where(ok, p_score[:, None], F32(-1.0))
            best = cand.max(axis=0)
            # first strict max in the pre-sorted (hamming, dna) cap order
            oh = ok & (cand >= best[None])
            oh &= jnp.cumsum(oh.astype(I32), axis=0) == 1
            pick = lambda a: jnp.sum(jnp.where(oh, a[:, None], I32(0)),
                                     axis=0, dtype=I32)
            any_ok = any_ok | aok
            shift_sel = jnp.where(aok, shv, shift_sel)
            b_score = jnp.where(aok, best, b_score)
            b_depth = jnp.where(aok, pick(p_depth), b_depth)
            b_ham = jnp.where(aok, pick(p_ham), b_ham)
            b_start = jnp.where(aok, pick(p_start), b_start)
            b_rhs = jnp.where(aok, pick(p_rhs), b_rhs)
            hits.append(ok.any(axis=1))                     # [capS,G]

        inc = _score_increment(rh_w, shift_sel, S)
        hinc = _ham_increment(rh_w, shift_sel, S)
        n_score = jnp.where(any_ok, b_score + inc, score_w)
        n_depth = jnp.where(any_ok, b_depth + shift_sel, I32(1))
        n_ham = jnp.where(any_ok, b_ham + hinc, ham_w)
        n_start = jnp.where(any_ok, b_start, pos_w)
        n_rhs = jnp.where(any_ok, b_rhs, rh_w)

        # mark connected predecessors, then retire the oldest window
        upd = [st[:8] + (st[8] | hits[s],) + st[9:]
               for s, st in enumerate(states)]
        r_sp, _, r_score, r_depth, r_ham, r_start, r_rhs, r_rhe, r_conn, \
            r_pos, r_md = upd[S - 1]
        emitted = {
            "emit": (r_sp >= 0) & (~r_conn) & (r_depth >= r_md),
            # strip the euk flag (species bit 30, see flagship) at emission
            "species": r_sp & I32(0x3FFFFFFF),
            "start": r_start,
            "end": r_pos + 23,
            "score": r_score,
            "hamming": r_ham,
            "depth": r_depth,
            "rh_start": r_rhs,
            "rh_end": r_rhe,
        }

        new_state = (jnp.where(sel_w, sp_w, I32(_NO_SPECIES)), dna_w, n_score,
                     n_depth, n_ham, n_start, n_rhs, rh_w,
                     jnp.zeros(sel_w.shape, dtype=bool), pos_w, md_w)
        return tuple([new_state] + upd[: S - 1]), emitted

    zg = jnp.zeros((cap, G), I32)
    state0 = (zg - 1, zg, jnp.zeros((cap, G), F32), zg, zg, zg, zg, zg,
              jnp.zeros((cap, G), dtype=bool), zg, zg)
    states0 = tuple(state0 for _ in range(S))

    mv = lambda a: jnp.moveaxis(a, 2, 0)                    # [W,cap,G]
    xs = (mv(sel), mv(sp_m), mv(dna), mv(rh), mv(ham), mv(pos), mv(score0),
          mv(min_depth))
    states, emitted = jax.lax.scan(step, states0, xs)

    # flush S empty windows to retire the rest
    ze = lambda dt: jnp.zeros((S, cap, G), dt)
    empty = (ze(bool), ze(I32) - 1, ze(I32), ze(I32),
             ze(I32), ze(I32), ze(F32), ze(I32))
    _, tail = jax.lax.scan(step, states, empty)

    out = {}
    for key in emitted:
        out[key] = jnp.concatenate([emitted[key], tail[key]], axis=0)
    return out                                              # [W+S, cap, G]


def pack_paths(out):
    """Flatten a path_dp output dict into 7 int32 columns [7, T*cap*G].

    Column layout: 0 g (read*6+frame), 1 species, 2 start, 3 end,
    4 score (f32 bits), 5 hamming<<16 | rh_start, 6 rh_end.  Flat order
    (t, j, g) is equivalent to the reference's per-(frame, pos) emission
    order after the host's (qid, species, frame, end) lexsort: within a
    tie class, g and t are fixed (end is strictly increasing in t), so
    only the candidate lane j varies and both flat orders ascend in j.
    """
    T, cap, G = out["emit"].shape
    total = T * cap * G
    flat = lambda a: a.reshape(total)
    g_ids = jnp.broadcast_to(jnp.arange(G, dtype=I32)[None, None, :], (T, cap, G))
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


def pack_paths_blocked(out, block_w: int, compact5: bool = False):
    """pack_paths + per-lane block compaction: [T, cap, G] -> [C, block_w*G].

    The emit tensor is ~1-3% dense, but the global compaction scatter
    (compact_columns) walks EVERY input row (~4.6 ns/row on v5e) — at
    [T*cap*G] ~ 1.7M rows that one scatter dominated the fused step
    (~7.7 ms/batch).  Pre-compacting each G lane's T*cap rows into
    block_w slots via the one-hot masked-sum trick (pure VPU, no
    gather/scatter — same pattern as encode_jax.compact_windows) shrinks
    the global scatter ~T*cap/block_w-fold.

    Output flat order is (slot, g) slot-major; within one g, slot order
    equals (t, j) ascending — exactly pack_paths' order restored by the
    host's stable lexsort (see pack_paths docstring), so downstream
    tie-breaking is unchanged.

    compact5 packs the 7 logical fields into FIVE int32 columns
    (g|start, end|rh_start, rh_end|hamming 16-bit halves, species,
    score) — the emitted-path transfer dominates the device->host
    tunnel time (~43 MB/s), so 29% fewer bytes is ~6 ms/batch.  Callers
    must guarantee the 16-bit bounds: g < 2^16, positions+26 < 2^16,
    path hamming < 2^16 (holds for reads/chunks <= 16 kb; long-read
    mode keeps the 7-column layout).

    Returns (cols [C, block_w*G], valid [block_w*G], blk_overflow) where
    blk_overflow counts emitted paths dropped because a lane had more
    than block_w — the caller re-runs with a doubled block_w.
    """
    T, cap, G = out["emit"].shape
    R = T * cap
    block_w = min(block_w, R)
    emit = out["emit"].reshape(R, G)
    rank = jnp.cumsum(emit.astype(I32), axis=0) - 1
    cnt = rank[-1] + 1                                     # [G]
    blk_over = jnp.sum(jnp.maximum(cnt - block_w, 0)).astype(I32)
    slots = jnp.arange(block_w, dtype=I32)
    oh = emit[None] & (rank[None] == slots[:, None, None])  # [bw, R, G]

    def take(a):
        a = a.reshape(R, G)
        return jnp.sum(jnp.where(oh, a[None], jnp.zeros((), a.dtype)),
                       axis=1, dtype=a.dtype).reshape(block_w * G)

    g_ids = jnp.broadcast_to(jnp.arange(G, dtype=I32)[None, :],
                             (block_w, G)).reshape(block_w * G)
    score_bits = jax.lax.bitcast_convert_type(out["score"].astype(F32), I32)
    if compact5:
        M16 = I32(0xFFFF)
        cols = jnp.stack([
            (g_ids << 16) | take(out["start"].astype(I32) & M16),
            take(((out["end"].astype(I32) & M16) << 16)
                 | out["rh_start"].astype(I32)),
            take((out["rh_end"].astype(I32) << 16)
                 | (out["hamming"].astype(I32) & M16)),
            take(out["species"].astype(I32)),
            take(score_bits),
        ])
    else:
        cols = jnp.stack([
            g_ids,
            take(out["species"].astype(I32)),
            take(out["start"].astype(I32)),
            take(out["end"].astype(I32)),
            take(score_bits),
            take((out["hamming"].astype(I32) << 16)
                 | out["rh_start"].astype(I32)),
            take(out["rh_end"].astype(I32)),
        ])
    valid = (slots[:, None] < cnt[None, :]).reshape(block_w * G)
    return cols, valid, blk_over


def compact_columns(cols, sel, out_width: int = 0):
    """Compact valid rows of [C, N] int32 columns to the front.

    out_width == 0: legacy full-width scatter (packed is [C, N]).
    out_width > 0: two-stage compaction — scatter ONE int32 src-index
    column of width out_width, then gather each payload column at those
    indices.  Cuts scatter traffic C-fold; rows past out_width are
    dropped (count still reports the true total so callers can detect
    overflow and re-run wider).
    """
    total = sel.shape[0]
    count = jnp.sum(sel).astype(I32)
    dest = jnp.cumsum(sel.astype(I32)) - 1
    if out_width and out_width < total:
        W = out_width
        d = jnp.where(sel, dest, W)
        src = jnp.zeros(W, I32).at[d].set(
            jnp.arange(total, dtype=I32), mode="drop")
        packed = cols[:, src]
        return packed, count
    dest = jnp.where(sel, dest, total - 1)
    packed = jnp.zeros_like(cols)
    for i in range(cols.shape[0]):
        packed = packed.at[i, dest].set(cols[i], mode="drop")
    return packed, count


def decode_paths(arr):
    """numpy decode of fetched path columns -> dict of arrays.

    Accepts either the 7-column layout or the compact 5-column layout
    (pack_paths_blocked compact5), distinguished by row count.
    """
    p = np.asarray(arr)
    if p.shape[0] == 5:
        u = p.view(np.uint32) if p.dtype == np.int32 else \
            p.astype(np.int32).view(np.uint32)
        return {
            "g": (u[0] >> 16).astype(np.int64),
            "species": p[3].astype(np.int64),
            "start": (u[0] & 0xFFFF).astype(np.int64),
            "end": (u[1] >> 16).astype(np.int64),
            "score": p[4].view(np.float32) if p[4].dtype == np.int32
            else p[4].astype(np.int32).view(np.float32),
            "hamming": (u[2] & 0xFFFF).astype(np.int64),
            "rh_start": (u[1] & 0xFFFF).astype(np.int64),
            "rh_end": (u[2] >> 16).astype(np.int64),
        }
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
