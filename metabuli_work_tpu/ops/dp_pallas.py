"""Pallas TPU kernel: fused candidate-rank + path DP + blocked emission.

One kernel replaces three XLA passes of the fused device step
(ops/dp_jax.py: sort_candidates -> path_dp -> pack_paths_blocked), i.e.
the on-device port of Taxonomer::getMatchPaths (reference
src/commons/Taxonomer.cpp:487-648; consecutiveness rule
isConsecutive/isConsecutive2 at :671-699).

Why Pallas here: the XLA formulation scans W windows carrying S ring
states x 11 fields as scan carries (HBM round trips per step once the
carry exceeds registers), then re-walks the full [W+S, cap, G] emission
tensor with a one-hot blocked pack — ~60-100 MB of HBM traffic per
batch for ~2-3% emit density, and a separate cap^2 one-hot candidate
sort pass before the scan.  The kernel keeps the ring state in VMEM
scratch, ranks candidates inline, packs emitted paths inline, and
writes only the [C, block_w, GT] packed columns (~1 MB) back to HBM.

Semantics notes (must stay bit-identical to the dp_jax flow):
* predecessor choice = first strict score max in (hamming, dnaEncoding)
  candidate order.  dp_jax pre-sorts the cap axis and takes the first
  cumsum hit; here candidates stay unsorted and the winner is picked by
  (max score, then min (ham<<24|dna) key, then min original lane) —
  the same element, because sorted order for equal keys is stable in
  the original lane.
* emitted paths are packed per G lane in (window, sorted-candidate)
  order: within one retire step, slots ascend by the emitted matches'
  ((ham<<24|dna), original lane) key — exactly the order
  pack_paths_blocked sees after sort_candidates.
* scores accumulate in the reference f32 order (Match::getScore,
  src/commons/Match.h:32-44).
"""

import functools

from . import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

# state field indices in the int scratch [S, NF, cap, GT]
_SP, _DNA, _DEPTH, _HAM, _START, _RHS, _RHE, _CONN, _POS, _MD, _KEY = range(11)
_NF = 11


def _match_score(rh):
    score = jnp.zeros(rh.shape, F32)
    for cnt in range(8):
        h = (rh >> (cnt * 2)) & 3
        score = score + jnp.where(h == 0, F32(3.0),
                                  F32(2.0) - F32(0.5) * h.astype(F32))
    return score


def _inc_pair(rh, shift, max_shift):
    """(score, hamming) increments for the first ``shift`` codons of rh."""
    s = jnp.zeros(rh.shape, F32)
    hsum = jnp.zeros(rh.shape, I32)
    for i in range(max_shift):
        h = (rh >> (i * 2)) & 3
        inc = jnp.where(h == 0, F32(3.0), F32(2.0) - F32(0.5) * h.astype(F32))
        live = i < shift
        s = jnp.where(live, s + inc, s)
        hsum = hsum + jnp.where(live, h, I32(0))
    return s, hsum


def _any(x, axis=None):
    """jnp.any stand-in: Mosaic proxies bool reductions through a
    Python-float 1.0/0.0 cast, which becomes float64 under x64 and fails
    to lower — route through an explicit f32 max instead."""
    m = jnp.max(jnp.where(x, F32(1.0), F32(0.0)), axis=axis)
    return m > F32(0.0)


def _cumsum0(x):
    """Cumulative sum along the (small, static) leading axis."""
    rows = [x[i] for i in range(x.shape[0])]
    out = [rows[0]]
    for r in rows[1:]:
        out.append(out[-1] + r)
    return jnp.stack(out)


def _dp_kernel(fwd_ref, sp_ref, dna_ref, rh_ref, ham_ref, pos_ref,
               cols_ref, cnt_ref,
               sti_ref, stf_ref, *,
               S, WT, cap, GT, block_w, kmer_format, dyn_gap,
               min_cons, min_cons_euk, n_cols, compact5, W_real):
    # NOTE: no jnp %, // or jnp-int-scalar sugar in this kernel — the
    # Mosaic lowering of the pjit-wrapped jnp.remainder blows the Python
    # recursion limit (observed on jax 0.9); ring indices are loop
    # carries and the fwd-lane mask arrives as an input instead.
    wt = pl.program_id(1)
    gi = pl.program_id(0)

    g_local = jax.lax.broadcasted_iota(I32, (1, GT), 1)[0]      # [GT]
    g_global = gi * GT + g_local
    # NOTE: booleans must never be broadcast in this kernel — Mosaic's
    # bool-broadcast proxy (jnp.where(val, 1, 0) == 1) emits i64 vectors
    # under x64 that fail to legalize.  Broadcast INTS to full shape,
    # then compare.
    fwd3 = jnp.broadcast_to(fwd_ref[0][None, None, :],
                            (cap, cap, GT)) != 0
    BIGK = jnp.int32(0x7FFFFFFF)
    cap_i = jax.lax.broadcasted_iota(I32, (cap, cap, GT), 0)     # j' index
    cap_j = jax.lax.broadcasted_iota(I32, (cap, cap, GT), 1)     # j index

    @pl.when(wt == 0)
    def _init():
        cols_ref[...] = jnp.zeros((n_cols, block_w, GT), I32)
        cnt_ref[...] = jnp.zeros((1, GT), I32)
        sti_ref[...] = jnp.zeros((S, _NF, cap, GT), I32)
        for s in range(S):
            sti_ref[s, _SP] = jnp.full((cap, GT), -1, I32)
        stf_ref[...] = jnp.zeros((S, cap, GT), F32)

    def step(w, rr):
        # rr = ring slot of the current window (wg % S, carried — WT is
        # rounded up to a multiple of S so every block starts at slot 0)
        sp_w = sp_ref[w]                               # [cap, GT]
        dna_w = dna_ref[w]
        rh_w = rh_ref[w]
        ham_w = ham_ref[w]
        pos_w = pos_ref[w]
        sel_w = sp_w >= 0
        key_w = jnp.where(sel_w, (ham_w << 24) | dna_w, BIGK)
        score_w = _match_score(rh_w)

        found = jnp.zeros((cap, GT), dtype=jnp.bool_)
        any_ok = jnp.zeros((cap, GT), dtype=jnp.bool_)
        shift_sel = jnp.zeros((cap, GT), I32)
        b_score = jnp.zeros((cap, GT), F32)
        b_depth = jnp.zeros((cap, GT), I32)
        b_ham = jnp.zeros((cap, GT), I32)
        b_start = jnp.zeros((cap, GT), I32)
        b_rhs = jnp.zeros((cap, GT), I32)

        for s in range(S):
            r = rr - 1 - s + S                         # (wg - 1 - s) mod S
            r = jnp.where(r >= S, r - S, r)
            p_sp = sti_ref[r, _SP]
            p_dna = sti_ref[r, _DNA]
            p_key = sti_ref[r, _KEY]
            p_score = stf_ref[r]
            p_sp3 = jnp.broadcast_to(p_sp[:, None], (cap, cap, GT))
            same_sp = (p_sp3 == sp_w[None]) & (p_sp3 >= 0)
            has_sp = _any(same_sp, axis=0)
            use_s = has_sp & ~found & sel_w
            found = found | has_sp
            use3 = jnp.broadcast_to(use_s.astype(I32)[None],
                                    (cap, cap, GT)) != 0

            cd = p_dna[:, None]                        # [capS, 1, GT]
            nd = dna_w[None]                           # [1, cap, GT]
            if dyn_gap:
                p_pos0 = sti_ref[r, _POS][0]           # [GT]
                # exact lax.div, not jnp //: the jnp floordiv sugar's
                # remainder-based sign fixup blows Mosaic's recursion
                # limit.  real-vs-real window gaps are positive multiples
                # of 3, where trunc == floor.
                gapv = jax.lax.div(pos_w - p_pos0[None, :],
                                   jnp.full((cap, GT), 3, I32))
                ok_gap = (gapv >= 1) & (gapv <= S)
                # not jnp.clip: it is a jitted wrapper whose Python-int
                # bounds become i64 scalar operands (x64 mode) — Mosaic
                # cannot lower the resulting i64->i32 convert
                shv = jnp.minimum(jnp.maximum(gapv, I32(1)), I32(S))
                sh3 = (3 * shv)[None]
                mask24 = (I32(1) << (24 - sh3)) - 1
            else:
                shv = I32(s + 1)
                ok_gap = None
                sh3 = 3 * (s + 1)
                mask24 = (1 << (24 - sh3)) - 1
            if kmer_format == 2:
                ok_f = (cd & mask24) == (nd >> sh3)
                ok_r = (nd & mask24) == (cd >> sh3)
            else:
                ok_f = (cd >> sh3) == (nd & mask24)
                ok_r = (nd >> sh3) == (cd & mask24)
            # boolean algebra, not jnp.where: a select over 3D i1
            # vectors lowers to an unsupported i8->i1 trunci in Mosaic
            ok = ((ok_f & fwd3) | (ok_r & ~fwd3)) & same_sp & use3
            if ok_gap is not None:
                ok = ok & (jnp.broadcast_to(ok_gap.astype(I32)[None],
                                            (cap, cap, GT)) != 0)

            aok = _any(ok, axis=0)
            cand = jnp.where(ok, p_score[:, None], F32(-1.0))
            best = jnp.max(cand, axis=0)
            # winner = max score, tie -> min (ham,dna) key, tie -> min lane
            is_best = ok & (cand >= best[None])
            kcand = jnp.where(is_best, p_key[:, None], BIGK)
            kmin = jnp.min(kcand, axis=0)
            oh = is_best & (kcand <= kmin[None])
            oh = oh & (_cumsum0(oh.astype(I32)) == 1)
            # dtype=I32 on every reduction: with x64 enabled jnp.sum
            # promotes to int64, which Mosaic cannot lower (the convert
            # helper recurses)
            pick = lambda a: jnp.sum(jnp.where(oh, a[:, None], I32(0)),
                                     axis=0, dtype=I32)
            any_ok = any_ok | aok
            shift_sel = jnp.where(aok, shv, shift_sel)
            b_score = jnp.where(aok, best, b_score)
            b_depth = jnp.where(aok, pick(sti_ref[r, _DEPTH]), b_depth)
            b_ham = jnp.where(aok, pick(sti_ref[r, _HAM]), b_ham)
            b_start = jnp.where(aok, pick(sti_ref[r, _START]), b_start)
            b_rhs = jnp.where(aok, pick(sti_ref[r, _RHS]), b_rhs)
            # mark predecessors that got connected
            sti_ref[r, _CONN] = sti_ref[r, _CONN] | \
                _any(ok, axis=1).astype(I32)

        inc, hinc = _inc_pair(rh_w, shift_sel, S)
        n_score = jnp.where(any_ok, b_score + inc, score_w)
        n_depth = jnp.where(any_ok, b_depth + shift_sel, I32(1))
        n_ham = jnp.where(any_ok, b_ham + hinc, ham_w)
        n_start = jnp.where(any_ok, b_start, pos_w)
        n_rhs = jnp.where(any_ok, b_rhs, rh_w)

        # retire the oldest state (written at wg - S) and emit its paths
        r_sp = sti_ref[rr, _SP]
        emit = (r_sp >= 0) & (sti_ref[rr, _CONN] == 0) \
            & (sti_ref[rr, _DEPTH] >= sti_ref[rr, _MD])

        @pl.when(_any(emit))
        def _emit():
            r_key = sti_ref[rr, _KEY]
            # slot = cnt + rank among this step's emits by (key, lane)
            ek = jnp.where(emit, r_key, BIGK)
            ek3 = jnp.broadcast_to(ek[:, None], (cap, cap, GT))
            ahead = (ek3 < ek[None]) \
                | ((ek3 == ek[None]) & (cap_i < cap_j))
            emit3 = jnp.broadcast_to(emit.astype(I32)[:, None],
                                     (cap, cap, GT)) != 0
            rank = jnp.sum((ahead & emit3).astype(I32),
                           axis=0, dtype=I32)
            base = cnt_ref[0]                          # [GT]
            slot = base[None, :] + rank
            cnt_ref[0] = base + jnp.sum(emit, axis=0, dtype=I32)

            r_start = sti_ref[rr, _START]
            r_end = sti_ref[rr, _POS] + 23
            r_hamv = sti_ref[rr, _HAM]
            r_rhs = sti_ref[rr, _RHS]
            r_rhe = sti_ref[rr, _RHE]
            e_sp = r_sp & I32(0x3FFFFFFF)
            score_bits = jax.lax.bitcast_convert_type(stf_ref[rr], I32)
            if compact5:
                M16 = I32(0xFFFF)
                fields = (
                    (g_global[None, :] << 16) | (r_start & M16),
                    ((r_end & M16) << 16) | r_rhs,
                    (r_rhe << 16) | (r_hamv & M16),
                    e_sp,
                    score_bits,
                )
            else:
                fields = (jnp.broadcast_to(g_global[None, :], (cap, GT)),
                          e_sp, r_start, r_end, score_bits,
                          (r_hamv << 16) | r_rhs, r_rhe)
            for bw in range(block_w):
                m = emit & (slot == bw)

                @pl.when(_any(m))
                def _write():
                    for c in range(n_cols):
                        cols_ref[c, bw] += jnp.sum(
                            jnp.where(m, fields[c], I32(0)), axis=0,
                            dtype=I32)

        # write the current window into the retired slot
        sti_ref[rr, _SP] = jnp.where(sel_w, sp_w, I32(-1))
        sti_ref[rr, _DNA] = dna_w
        sti_ref[rr, _DEPTH] = n_depth
        sti_ref[rr, _HAM] = n_ham
        sti_ref[rr, _START] = n_start
        sti_ref[rr, _RHS] = n_rhs
        sti_ref[rr, _RHE] = rh_w
        sti_ref[rr, _CONN] = jnp.zeros((cap, GT), I32)
        sti_ref[rr, _POS] = pos_w
        sti_ref[rr, _MD] = jnp.where((sp_w >> 30) & 1 != 0,
                                     I32(min_cons_euk), I32(min_cons))
        sti_ref[rr, _KEY] = key_w
        stf_ref[rr] = n_score
        rr = rr + 1
        return jnp.where(rr >= S, rr - S, rr)

    n_steps = jnp.minimum(I32(WT), W_real - wt * WT)
    # I32 bounds: a Python-int lower bound becomes an i64 loop counter
    # under x64, which Mosaic cannot return from the loop body
    jax.lax.fori_loop(I32(0), n_steps, step, I32(0))


@functools.partial(jax.jit, static_argnames=(
    "min_cons", "min_cons_euk", "max_shift", "kmer_format", "dyn_gap",
    "block_w", "compact5", "interpret"))
def path_dp_blocked(sp_m, dna, rh, ham, pos, min_cons: int, min_cons_euk: int,
                    max_shift: int, kmer_format: int, dyn_gap: bool,
                    block_w: int, compact5: bool = True,
                    interpret: bool = False):
    """Fused (rank + DP + blocked pack) over [cap, G, W] candidate tensors.

    sp_m: species with the euk flag in bit 30, -1 where no candidate
    (the caller folds the sel mask in: ``jnp.where(sel, species, -1)``).
    Inputs must already be FLIPPED so positions ascend with the window
    axis in every lane (dp_jax.path_dp does this flip internally; the
    pallas caller does it once in XLA — see flagship.fused_step_dp).

    Returns (cols [C, block_w * G], valid [block_w * G], blk_over) —
    identical to
    ``pack_paths_blocked(path_dp(sort_candidates(...)), block_w)``.
    """
    cap, G, W = sp_m.shape
    S = max_shift
    n_cols = 5 if compact5 else 7
    W_real = W + S                     # + the scan-tail flush windows

    # pad the lane axis up to the tile width rather than shrinking the
    # tile (last block dim must be a multiple of 128); padded lanes get
    # sp = -1 everywhere, so they never match or emit
    GT = 512 if W_real <= 48 else 256
    if interpret:
        GT = min(GT, G)    # the (8,128) tile constraint is TPU-only
    G_pad = ((G + GT - 1) // GT) * GT
    WT = min(64 if GT == 256 else W_real, W_real)
    WT = ((WT + S - 1) // S) * S       # ring slot 0 at every block start
    W_pad = ((W_real + WT - 1) // WT) * WT
    n_wt = W_pad // WT

    def prep(a, fill):
        a = jnp.moveaxis(a.astype(I32), 2, 0)          # [W, cap, G]
        return jnp.pad(a, ((0, W_pad - W), (0, 0), (0, G_pad - G)),
                       constant_values=fill)

    # forward lanes use the fwd consecutiveness formula; % is hostile to
    # the Mosaic lowering, so the mask is computed here and passed in
    fwd = jnp.pad(((jnp.arange(G, dtype=I32) % 6) < 3).astype(I32),
                  (0, G_pad - G)).reshape(1, G_pad)
    ins = (fwd, prep(sp_m, -1), prep(dna, 0), prep(rh, 0), prep(ham, 0),
           prep(pos, 0))

    n_gt = G_pad // GT
    kern = functools.partial(
        _dp_kernel, S=S, WT=WT, cap=cap, GT=GT, block_w=block_w,
        kmer_format=kmer_format, dyn_gap=dyn_gap, min_cons=min_cons,
        min_cons_euk=min_cons_euk, n_cols=n_cols, compact5=compact5,
        W_real=W_real)
    # index maps derive zeros from the i32 grid args (i - i), never a
    # Python literal 0: under x64 a literal 0 becomes an i64 constant in
    # the transform func, which the Mosaic backend fails to legalize
    # (captured jnp scalars are rejected outright)
    in_spec = pl.BlockSpec((WT, cap, GT), lambda i, w: (w, i - i, i))
    fwd_spec = pl.BlockSpec((1, GT), lambda i, w: (w - w, i))
    cols, cnt = pl.pallas_call(
        kern,
        grid=(n_gt, n_wt),
        in_specs=[fwd_spec] + [in_spec] * 5,
        out_specs=(
            pl.BlockSpec((n_cols, block_w, GT),
                         lambda i, w: (w - w, w - w, i)),
            pl.BlockSpec((1, GT), lambda i, w: (w - w, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cols, block_w, G_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, G_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, _NF, cap, GT), jnp.int32),
            pltpu.VMEM((S, cap, GT), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*ins)

    cols = cols[:, :, :G]
    cnt = cnt[:, :G]
    slots = jnp.arange(block_w, dtype=I32)
    valid = (slots[:, None] < cnt[0][None, :]).reshape(block_w * G)
    blk_over = jnp.sum(jnp.maximum(cnt[0] - block_w, 0)).astype(I32)
    return cols.reshape(n_cols, block_w * G), valid, blk_over
