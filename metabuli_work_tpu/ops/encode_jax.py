"""Batched 6-frame metamer extraction as a JAX kernel.

TPU-first design: a batch of reads arrives as a padded uint8 ASCII tensor
``[B, Lmax]`` plus lengths; the whole extraction is table gathers, shifts
and masks over ``[B, W]`` lanes — no per-base control flow.  Windows that
touch an N (or fall beyond a read's usable length) are masked instead of
skipped, which is the vectorized equivalent of the reference scanner's
restart-after-N loop (reference src/commons/KmerScanner.h:82-117; oracle
semantics pinned in ops/encode_np.py and tests/test_encode.py).

Output layout: ``[B, 6, W]`` metamer values + positions + validity mask,
where ``W = Lmax//3 - 7`` window slots per frame.  Fixed shapes keep XLA
happy; the mask rides along into the match kernel.
"""

import functools

from . import _jax_setup  # noqa: F401  (must precede jax.numpy use of u64)
import jax
import jax.numpy as jnp
import numpy as np

from .genetic_code import AANUM, KMER_LEN

_U64 = jnp.uint64


def _pack_codon_planes():
    """Bit-plane constants for gather-free codon->(aa<<3|num) lookup.

    The 64 ACGT codons (2-bit base codes b0b1b2) map to an 8-bit AANUM
    value; packing each of the 8 value bits into one 64-bit constant
    (as two u32 halves) turns the 512-entry table gather into ~5 VPU
    lane ops per bit-plane.  TPU gathers cost ~8 ns/element even from
    tiny tables — the two aanum gathers were ~2.4 ms/batch.

    Returns (planes_fwd, planes_rc): planes_rc[p] is the AANUM value of
    the reverse-complement codon of p, so both strands read the SAME
    packed-codon array (no separate complement array needed).
    """
    def tbl64(rc):
        t = np.empty(64, dtype=np.uint8)
        for a in range(4):
            for b in range(4):
                for c in range(4):
                    if rc:
                        t[(a << 4) | (b << 2) | c] = AANUM[
                            ((c ^ 2) << 6) | ((b ^ 2) << 3) | (a ^ 2)]
                    else:
                        t[(a << 4) | (b << 2) | c] = AANUM[
                            (a << 6) | (b << 3) | c]
        return t

    def planes(t):
        out = []
        for bit in range(8):
            bits = (t.astype(np.uint64) >> bit) & 1
            lo = np.uint32(sum(int(bits[i]) << i for i in range(32)))
            hi = np.uint32(sum(int(bits[32 + i]) << i for i in range(32)))
            out.append((lo, hi))
        return out

    return planes(tbl64(False)), planes(tbl64(True))


_PLANES_FWD, _PLANES_RC = _pack_codon_planes()


def _codon_plane_lookup(planes, idx):
    """8-bit AANUM value from bit-plane constants; idx int32 0..63."""
    U32 = jnp.uint32
    idx = idx.astype(U32)
    sh = idx & U32(31)
    use_hi = idx >= U32(32)
    v = jnp.zeros(idx.shape, U32)
    for bit, (lo, hi) in enumerate(planes):
        word = jnp.where(use_hi, U32(hi), U32(lo))
        v = v | (((word >> sh) & U32(1)) << U32(bit))
    return v.astype(jnp.uint8)
# Tables stay as NUMPY arrays at module level: converting them inside the
# traced functions embeds them as HLO literal constants.  Module-level
# jax.Arrays would instead be captured as *implicit executable arguments*,
# which corrupts the jit dispatch cache across differently-shaped
# compilations (observed on jax 0.9: "Execution supplied N buffers but
# compiled program expected M").


def max_windows(l_max: int, k: int = KMER_LEN) -> int:
    """Window slots per frame for reads padded to l_max."""
    return max(l_max // 3 - k + 1, 0)


def _used_len(lengths):
    """maxCoveredLength, branch-free (reference LocalUtil.h:50-59)."""
    rem = lengths % 3
    sub = jnp.where(rem == 2, 2, jnp.where(rem == 1, 4, 3))
    return lengths - sub


def right_align(arr: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Host-side right-aligned copy of a padded read batch.

    ra[b, i] = arr[b, i - (Lmax - len_b)], 'N' left-fill.  Supplying this
    to extract_batch removes the only per-read device gather from the
    encode (~1.6 ms/batch on v5e); the extra H2D bytes are negligible.
    """
    B, Lmax = arr.shape
    src = np.arange(Lmax, dtype=np.int64)[None, :] - (Lmax - lens)[:, None]
    ra = arr[np.arange(B)[:, None], np.clip(src, 0, Lmax - 1)]
    ra[src < 0] = ord("N")
    return ra


@functools.partial(jax.jit,
                   static_argnames=("syncmer", "smer_len", "k", "aa_only", "kmer_format"))
def extract_batch(reads, lengths, syncmer: bool = False, smer_len: int = 5,
                  k: int = KMER_LEN, aa_only: bool = False, kmer_format: int = 2,
                  reads_ra=None):
    """Extract metamers for a batch of reads.

    Args:
      reads: uint8 [B, Lmax] ASCII bases (padding value irrelevant).
      lengths: int32 [B] true read lengths.
      syncmer: apply open-syncmer selection on the AA part.
      smer_len: s-mer length for syncmer selection.
      k: amino acids per k-mer (8 metamer, 12 dna2aa).
      aa_only: emit AA-only k-mers (no 24-bit DNA part) — the
        KmerScanner_dna2aa family (reference KmerScanner.h:185-261).
      kmer_format: 2 = current metamer layout; 1 = legacy layout
        (OldMetamerScanner, KmerScanner.h:120-182): codons scanned
        right-to-left, AA part packed base-21, swapped pos formulas —
        needed to search databases converted from the old on-disk format.

    Returns:
      kmers  uint64 [B, 6, W] metamer values (garbage where invalid),
      pos    int32  [B, 6, W] query coordinates (reference formulas),
      valid  bool   [B, 6, W].
    """
    B, Lmax = reads.shape
    W = max_windows(Lmax, k)
    aa_max = W + k - 1  # codons needed per frame

    # Gathers cost ~10 ns/element on TPU, so the encode avoids them:
    # nucleotide coding is arithmetic ((ascii|0x20) & 14) >> 1 with an
    # explicit ACGT whitelist; codon->(aa, num) is a bit-plane select
    # chain over packed 64-entry constants (no table gathers at all);
    # forward frames then read codons via static strided slices (their
    # frame offset is a compile-time constant) — only the three reverse
    # frames need a per-read take_along_axis (start depends on length).
    v = reads | jnp.uint8(0x20)
    raw = (v & jnp.uint8(14)) >> jnp.uint8(1)
    okb = (v == 97) | (v == 99) | (v == 103) | (v == 116)  # acgt

    i32 = lambda a: a.astype(jnp.int32)
    c2 = i32(raw & jnp.uint8(3))                  # 2-bit base code (A0 C1 T2 G3)
    ok3 = okb[:, :-2] & okb[:, 1:-1] & okb[:, 2:]
    # packed 6-bit codon at every forward start position i (bases i..i+2)
    p6 = (c2[:, :-2] << 4) | (c2[:, 1:-1] << 2) | c2[:, 2:]
    bad = jnp.uint8(255)
    an_f = jnp.where(ok3, _codon_plane_lookup(_PLANES_FWD, p6), bad)

    # Reverse frames work on RIGHT-ALIGNED reads, so the reversed
    # rc-codon array is LEFT-aligned and every rc frame reads it via
    # static strided slices selected by length%3 — no per-frame
    # take_along_axis.  The aligned copy ideally arrives from the host
    # (right_align, free at batch-prep time); the device gather below is
    # the fallback for callers that don't supply it.
    if reads_ra is not None:
        ra = reads_ra
    else:
        colid = jnp.arange(Lmax, dtype=jnp.int32)[None, :]
        src = colid - (Lmax - lengths)[:, None]
        ra = jnp.take_along_axis(reads, jnp.clip(src, 0, Lmax - 1), axis=1)
        ra = jnp.where(src >= 0, ra, jnp.uint8(ord("N")))
    v_ra = ra | jnp.uint8(0x20)
    raw_ra = (v_ra & jnp.uint8(14)) >> jnp.uint8(1)
    okb_ra = (v_ra == 97) | (v_ra == 99) | (v_ra == 103) | (v_ra == 116)
    c2_ra = i32(raw_ra & jnp.uint8(3))
    ok3_ra = okb_ra[:, :-2] & okb_ra[:, 1:-1] & okb_ra[:, 2:]
    p6_ra = (c2_ra[:, :-2] << 4) | (c2_ra[:, 1:-1] << 2) | c2_ra[:, 2:]
    # rc-direct value at pos j = AANUM of revcomp codon (bases j+2,j+1,j
    # complemented); reversing puts it in rc-index order, and the
    # right-alignment makes rc index 0 = the read's last codon
    an_rc = jnp.where(ok3_ra, _codon_plane_lookup(_PLANES_RC, p6_ra),
                      bad)[:, ::-1]

    pad = 3 * aa_max + 2 - (Lmax - 2)             # strided slices need aa_max cols
    if pad > 0:
        an_f = jnp.pad(an_f, ((0, 0), (0, pad)), constant_values=255)
        an_rc = jnp.pad(an_rc, ((0, 0), (0, pad)), constant_values=255)
    n_cols = an_f.shape[1]

    used = _used_len(lengths)                     # [B]
    aa_len = used // 3                            # [B]
    n_win = aa_len - (k - 1)                      # [B] valid windows per frame

    j = jnp.arange(aa_max, dtype=jnp.int32)       # codon index within frame

    def frame_codons(frame):
        fwd = frame < 3
        if fwd:
            begin = jnp.full_like(lengths, frame % 3)
            an = an_f[:, frame::3][:, :aa_max]     # static slice, no gather
        else:
            begin = (lengths % 3 - frame % 3) % 3
            # with right-aligned rc the scan start is a pure function of
            # length%3: start = sub(rem) - begin(rem), sub per
            # maxCoveredLength (LocalUtil.h:50-59) — 3 static slices
            # selected per read, no gather
            rem = lengths % 3
            sub = {0: 3, 1: 4, 2: 2}
            sl = {}
            for r in (0, 1, 2):
                s = sub[r] - (r - frame % 3) % 3
                if s not in sl:
                    sl[s] = an_rc[:, s::3][:, :aa_max]
            s_of = [sub[r] - (r - frame % 3) % 3 for r in (0, 1, 2)]
            an = jnp.where(rem[:, None] == 0, sl[s_of[0]],
                           jnp.where(rem[:, None] == 1, sl[s_of[1]],
                                     sl[s_of[2]]))
        aa = an >> jnp.uint8(3)                    # [B, aa_max] uint8
        num = an & jnp.uint8(7)
        cvalid = (aa <= 20) & (j[None, :] < aa_len[:, None])
        return aa, num, cvalid, begin

    def pack_windows(vals, bits):
        # vals [B, aa_max] small ints -> [B, W] packed u64 windows
        v = vals.astype(_U64)
        out = jnp.zeros((B, W), dtype=_U64)
        for t in range(k):
            out = out | (v[:, t : t + W] << _U64(bits * (k - 1 - t)))
        return out

    def pack_windows_base21(vals):
        # legacy AA packing: big-endian base-21 over the window
        v = vals.astype(_U64)
        out = jnp.zeros((B, W), dtype=_U64)
        for t in range(k):
            out = out * _U64(21) + v[:, t : t + W]
        return out

    kmers_all, pos_all, valid_all = [], [], []
    widx = jnp.arange(W, dtype=jnp.int32)
    for frame in range(6):
        aa, num, cvalid, begin = frame_codons(frame)
        if kmer_format == 1:
            # legacy scan order = reversed codon axis (OldMetamerScanner
            # reads from seqEnd leftward on forward frames)
            aa = aa[:, ::-1]
            num = num[:, ::-1]
            cvalid = cvalid[:, ::-1]
        aa_m = jnp.where(cvalid, aa, 0)
        if kmer_format == 1:
            aa_part = pack_windows_base21(aa_m)
        else:
            aa_part = pack_windows(aa_m, 5)
        if aa_only:
            kmers = aa_part
        else:
            num_m = jnp.where(cvalid, num, 0)
            dna_part = pack_windows(num_m, 3)
            kmers = (aa_part << _U64(24)) | (dna_part & _U64((1 << 24) - 1))

        # window validity: all k codons valid AND window in range
        wv = jnp.ones((B, W), dtype=bool)
        for t in range(k):
            wv = wv & cvalid[:, t : t + W]
        if kmer_format == 1:
            # flipped axis: window w covers scan positions w-(aa_max-aa_len)..
            scan_pos = widx[None, :] - (aa_max - aa_len[:, None])
            wv = wv & (scan_pos >= 0) & (scan_pos < n_win[:, None])
        else:
            wv = wv & (widx[None, :] < n_win[:, None])

        if syncmer and kmer_format != 1:
            wv = wv & _syncmer_mask_batch(aa_m, cvalid, W, k, smer_len)

        seq_end = begin + used - 1
        if kmer_format == 1:
            scan_pos = widx[None, :] - (aa_max - aa_len[:, None])
            if frame < 3:
                pos = seq_end[:, None] - 3 * (scan_pos + k) + 1
            else:
                pos = begin[:, None] + 3 * scan_pos
        else:
            if frame < 3:
                pos = begin[:, None] + 3 * widx[None, :]
            else:
                pos = seq_end[:, None] - 3 * (widx[None, :] + k) + 1

        kmers_all.append(kmers)
        pos_all.append(pos.astype(jnp.int32))
        valid_all.append(wv)

    return (
        jnp.stack(kmers_all, axis=1),
        jnp.stack(pos_all, axis=1),
        jnp.stack(valid_all, axis=1),
    )


def _syncmer_mask_batch(aa_m, cvalid, W, k, s):
    """Open-syncmer anchor test per window, batched.

    Keep window w iff the leftmost-minimal s-mer among offsets 0..k-s sits
    at offset 0 or k-s (reference SyncmerScanner.h:70-90).
    """
    B = aa_m.shape[0]
    n_sm_per_win = k - s + 1
    n_smer = W + n_sm_per_win - 1
    sm = jnp.zeros((B, n_smer), dtype=_U64)
    v = aa_m.astype(_U64)
    for t in range(s):
        sm = sm | (v[:, t : t + n_smer] << _U64(5 * (s - 1 - t)))
    # leftmost argmin over the window's s-mers
    best = jnp.full((B, W), jnp.uint64(0xFFFFFFFFFFFFFFFF))
    arg = jnp.zeros((B, W), dtype=jnp.int32)
    for o in range(n_sm_per_win):
        cand = sm[:, o : o + W]
        better = cand < best
        best = jnp.where(better, cand, best)
        arg = jnp.where(better, o, arg)
    return (arg == 0) | (arg == k - s)


def compact_windows(kmers, pos, valid, w_c: int):
    """Compact valid windows to the front of the W axis: [B,F,W] -> [B,F,w_c].

    Syncmer selection keeps ~half the windows (anchor rule), but static
    shapes would still probe every slot — and probe gathers at ~10 ns per
    element dominate the device step.  Compaction is a one-hot masked sum
    over the W axis (pure VPU; rank = prefix count of valid), NO gathers
    or scatters.  Order is preserved, so the path DP can chain compacted
    slots using real position gaps (dp_jax.path_dp dyn_gap mode).

    Returns (kmers_c, pos_c, valid_c, overflow) where overflow counts
    valid windows dropped because a row had more than w_c — the caller
    re-runs with a wider w_c (same protocol as the candidate-cap retry).
    """
    B, F, W = valid.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    cnt = rank[..., -1] + 1
    overflow = jnp.sum(jnp.maximum(cnt - w_c, 0)).astype(jnp.int32)
    slots = jnp.arange(w_c, dtype=jnp.int32)
    oh = valid[..., None, :] & (rank[..., None, :] == slots[:, None])  # [B,F,w_c,W]

    def take(a):
        return jnp.sum(jnp.where(oh, a[..., None, :], jnp.zeros((), a.dtype)),
                       axis=-1, dtype=a.dtype)

    kc = take(kmers)
    pc = take(pos)
    vc = slots[None, None, :] < cnt[..., None]
    return kc, pc, vc, overflow


def flatten_batch(kmers, pos, valid, seq_ids):
    """[B,6,W] tensors -> flat per-kmer arrays with frame/read annotation.

    seq_ids: int32 [B] 1-based read ids (0 is the reference's blank
    sentinel, QueryKmerInfo at src/commons/Kmer.h:11-16).
    Returns flat (kmers, pos, frame, seq_id, valid) each [B*6*W].
    """
    B, F, W = kmers.shape
    frame = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :, None], (B, F, W))
    sid = jnp.broadcast_to(seq_ids[:, None, None], (B, F, W))
    flat = lambda x: x.reshape(B * F * W)
    return flat(kmers), flat(pos), flat(frame), flat(sid), flat(valid)
