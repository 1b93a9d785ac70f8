"""Index probe + candidate hamming filter — the hot match kernel.

TPU-native replacement for the reference's two-pointer merge over a
delta-encoded stream (reference src/commons/KmerMatcher.cpp:251-466):
the DB here is a *sorted uint64 array* resident in device memory, and the
probe is a batched ``searchsorted`` on the 40-bit amino-acid part followed
by a bounded candidate gather and a vectorized per-codon hamming filter
(reference compareDna, src/commons/KmerMatcher.cpp:1117-1146).

Equivalence notes:
* the reference memoizes candidate lists across equal AA parts; with
  independent binary searches every query slot simply recomputes the same
  run bounds, so results are identical.
* candidate selection keeps hamming <= min(2*minHamming, 7) among the
  candidates of the same AA run (KmerMatcher.cpp:1136).
* per-codon 2-bit hamming packing follows getHammings/getHammings_reverse
  (KmerMatcher.h:386-416): codon i (from the k-mer's low bits) lands in
  2-bit field i (forward) or 7-i (reverse); values are mod-4 truncations
  of the full per-codon distance.
"""

import functools

from . import _jax_setup  # noqa: F401  (must precede jax.numpy use of u64)
import jax
import jax.numpy as jnp
import numpy as np

from .genetic_code import HAMMING_TABLE, KMER_LEN

_U64 = jnp.uint64
DNA_BITS = 24


def _pack_hamming_consts():
    """Bit-pack HAMMING_TABLE (64 entries, values 0..4) into scalars.

    TPU gathers from tiny tables are far slower than a handful of VPU
    shifts: the low 2 bits of each entry go into four 32-bit lanes
    (16 entries x 2 bits each) and the "value==4" bit into two 32-bit
    lanes, so a lookup becomes selects + variable shifts — no gather.
    Note value&3 == the reference's h2 (4 -> 0), so the packed low bits
    double as the per-codon rightEndHamming field.
    """
    t = HAMMING_TABLE.astype(np.uint32)
    low = [np.uint32(sum(int(t[16 * j + i] & 3) << (2 * i) for i in range(16)))
           for j in range(4)]
    high = [np.uint32(sum((int(t[32 * j + i]) >> 2) << i for i in range(32)))
            for j in range(2)]
    return low, high


_HAM_LOW, _HAM_HIGH = _pack_hamming_consts()


def _codon_hamming(idx):
    """(low2, full) per-codon hamming from packed constants; idx uint32 0..63."""
    U32 = jnp.uint32
    sel = idx >> U32(4)
    lane = jnp.where(sel == 0, U32(_HAM_LOW[0]),
                     jnp.where(sel == 1, U32(_HAM_LOW[1]),
                               jnp.where(sel == 2, U32(_HAM_LOW[2]),
                                         U32(_HAM_LOW[3]))))
    low2 = (lane >> ((idx & U32(15)) << U32(1))) & U32(3)
    hlane = jnp.where(idx >> U32(5) == 0, U32(_HAM_HIGH[0]), U32(_HAM_HIGH[1]))
    hbit = (hlane >> (idx & U32(31))) & U32(1)
    return low2.astype(jnp.int32), (low2 + (hbit << U32(2))).astype(jnp.int32)


def build_buckets(values: np.ndarray, max_bits: int = 24):
    """Host-side bucket table over the AA part of a sorted metamer array.

    Returns (bucket_pair int32 [2^bits, 2], aa_lo uint32 [M], shift,
    steps): bucket b covers AA parts whose top ``40-shift`` bits equal
    b, so a probe narrows to [pair[b,0], pair[b,1]) with ONE row gather
    (lo and hi ride in the same 8-byte row — gathers are latency-bound
    per row, so the pair costs the same as one i32) and finishes with
    ``steps`` binary-search iterations comparing only the low 32 AA
    bits (valid because bits >= 8).  Replaces the 22-iteration
    jnp.searchsorted over the full array (the reference's analogue is
    the 4096-entry `split` checkpoint table, IndexCreator.cpp:811-866).

    Each search iteration is one [N]-sized random gather (~1.4 ms for
    190k queries on v5e) while the table costs 8*2^bits bytes of HBM —
    so the bits formula leans generous: +3 over log2(M) halves the
    in-bucket run three times vs +1 for 4x the (cheap) table.
    """
    aa = (values >> np.uint64(DNA_BITS)).astype(np.uint64)
    m = len(aa)
    bits = int(min(max_bits, max(8, int(np.ceil(np.log2(max(m, 2)))) + 3)))
    shift = 40 - bits
    b = (aa >> np.uint64(shift)).astype(np.int64)
    counts = np.bincount(b, minlength=1 << bits)
    bucket_lo = np.zeros((1 << bits) + 1, dtype=np.int32)
    np.cumsum(counts, out=bucket_lo[1:])
    bucket_pair = np.stack([bucket_lo[:-1], bucket_lo[1:]], axis=1)
    bucket_pair = np.ascontiguousarray(bucket_pair)
    max_run = int(counts.max()) if m else 0
    steps = max(1, int(np.ceil(np.log2(max_run + 1)))) if max_run else 1
    aa_lo = (aa & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return bucket_pair, aa_lo, shift, steps


EF_BITS = 25                 # euler_first coordinate width in the quad payload

# ---------------------------------------------------------------------- #
# Hash probe: one 64-byte-row gather replaces the bucket-table gather +
# `steps` chained bisection gathers (each chained [N] gather costs
# ~1.4-2.5 ms at N~190k on v5e — the bisection was ~15 ms of the 22 ms
# device step).  The table maps each UNIQUE 40-bit AA part to its run
# start in the sorted values array; absent queries resolve to M and fail
# the candidate equality mask exactly like a bisection miss.

HASH_SLOTS = 5               # (aa_lo32, aa_hi8|occupied, start) x 5 per row
HASH_ROW_U32 = 16            # 64-byte rows: 5 slots x 3 u32 + 1 pad
_HASH_MUL1 = np.uint32(0x9E3779B1)
_HASH_MUL2 = np.uint32(0x85EBCA6B)


def build_aa_hash(values: np.ndarray, load: float = 2.5,
                  max_chain: int = 3, min_log2_rows: int = 0,
                  max_bytes: int = 0, starts_override=None,
                  slots: int = HASH_SLOTS, row_u32: int = HASH_ROW_U32):
    """Host-side bucketized hash of unique AA parts -> run starts.

    Returns (table uint32 [R, 16], log2_rows, chain): bucketized open
    addressing with HASH_SLOTS slots per 64-byte row and linear ROW
    chaining on overflow; ``chain`` is the measured maximum chain length
    (rows a device probe must visit), kept <= max_chain by doubling R.
    The reference's analogue is the `split` checkpoint table + two-
    pointer merge (IndexCreator.cpp:811-866, KmerMatcher.cpp:251-466);
    here point lookup wins because queries arrive unsorted on device.

    Each slot also stores the run LENGTH (23 bits, saturating) above
    the occupancy flag, so probes learn candidate-cap overflow from the
    lookup itself instead of gathering a cap+1'th sentinel entry.

    starts_override: per-unique-AA run starts in a DIFFERENT coordinate
    space (align_runs4's block-aligned padded layout); run lengths are
    still measured on the unpadded `values`.
    """
    aa = (values >> np.uint64(DNA_BITS)).astype(np.uint64)
    uniq, starts = np.unique(aa, return_index=True)  # values sorted -> left edges
    n = len(uniq)
    run_len = np.diff(starts, append=len(values)).astype(np.uint32)
    run_len = np.minimum(run_len, np.uint32((1 << 23) - 1))
    if starts_override is not None:
        assert len(starts_override) == n
        starts = np.asarray(starts_override)
    lo32 = (uniq & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi8 = (uniq >> np.uint64(32)).astype(np.uint32)
    assert 3 * slots <= row_u32
    # min_log2_rows: mesh-sharded probes need one uniform table geometry
    # across all index shards (the row count is a static jit arg)
    log2_rows = max(8, int(np.ceil(np.log2(
        max(n / (load * slots / HASH_SLOTS), 1)))), min_log2_rows)
    # termination guard: never grow the table past 4 rows per unique key
    # (~20 slots/key) chasing a shorter chain — return the chain reached
    max_log2_rows = max(log2_rows, int(np.ceil(np.log2(max(n, 2)))) + 2)
    while True:
        R = 1 << log2_rows
        h = (((lo32 * _HASH_MUL1) ^ (hi8 * _HASH_MUL2))
             >> np.uint32(32 - log2_rows)).astype(np.int64)
        # vectorized linear probing over the flattened slot space: keys
        # sorted by home row fill slots in order, spilling forward when a
        # row is full — the landing slot of sorted key k is
        #   q_k = max_{j<=k}(f_j + (k - j)) = k + running_max(f_j - j)
        order = np.argsort(h, kind="stable")
        f = h[order] * slots
        k = np.arange(n, dtype=np.int64)
        q = np.maximum.accumulate(f - k) + k
        row_of = q // slots
        slot_of = q % slots
        chain = int((row_of - h[order]).max(initial=0)) + 1
        fits = n == 0 or int(row_of[-1]) < R
        # max_bytes: stop chasing a shorter chain once the NEXT doubling
        # would blow the byte budget (HBM cap for big DBs) — accept the
        # chain reached instead
        over_budget = bool(max_bytes) and \
            ((R << 1) * row_u32 * 4 > max_bytes)
        if (chain <= max_chain and fits) \
                or (fits and log2_rows >= max_log2_rows) \
                or (fits and over_budget):
            break
        log2_rows += 1
    table = np.zeros((R, row_u32), dtype=np.uint32)
    cols = 3 * slot_of
    table[row_of, cols] = lo32[order]
    table[row_of, cols + 1] = (hi8[order] | np.uint32(0x100)
                               | (run_len[order] << np.uint32(9)))
    table[row_of, cols + 2] = starts[order].astype(np.uint32)
    return table, log2_rows, chain


def _hash_search(q_aa, hash_table, log2_rows: int, chain: int, M):
    """Point lookup of run starts: ``chain`` row gathers + VPU compares.
    Slots per row derive from the row width (64-byte rows: 5 slots;
    512-byte rows: 42 — the wide geometry gathers 6x faster per op on
    v5e, profiling/prof_gather_width.py).  Returns (lo [N] i32 — M when
    absent, run_len [N] i32 — 0 when absent)."""
    U32 = jnp.uint32
    q_lo = (q_aa & _U64(0xFFFFFFFF)).astype(U32)
    q_hi = (q_aa >> _U64(32)).astype(U32)
    h = ((q_lo * U32(_HASH_MUL1)) ^ (q_hi * U32(_HASH_MUL2))) \
        >> U32(32 - log2_rows)
    R = hash_table.shape[0]
    slots = hash_table.shape[1] // 3
    lo = jnp.full(q_aa.shape, M, dtype=jnp.int32)
    rlen = jnp.zeros(q_aa.shape, dtype=jnp.int32)
    for c in range(chain):
        row = hash_table[jnp.minimum(h.astype(jnp.int32) + c, R - 1)]
        for s in range(slots):
            w1 = row[:, 3 * s + 1]
            hit = (row[:, 3 * s] == q_lo) \
                & ((w1 & U32(0x1FF)) == (q_hi | U32(0x100)))
            lo = jnp.where(hit, row[:, 3 * s + 2].astype(jnp.int32), lo)
            rlen = jnp.where(hit, (w1 >> U32(9)).astype(jnp.int32), rlen)
    return lo, rlen


def align_runs4(values: np.ndarray, *payloads):
    """Pad the sorted entry arrays so every AA run starts on a 4-entry
    (64-byte block) boundary: with run lengths known from the hash, the
    candidate window fetch then reads exactly ceil(cap/4) aligned block
    rows instead of ceil((cap+5)/4) unaligned ones — one fewer 12 MB
    row-gather per batch at cap 8 (the probe is gather-byte-bound).

    Sentinel padding entries have all-ones values (AA part can never
    match a query).  Returns (values_p, *payloads_p, starts_padded)
    where starts_padded are the per-unique-AA run starts in the padded
    coordinate space (feed to build_aa_hash(starts_override=...))."""
    aa = (np.asarray(values) >> np.uint64(DNA_BITS))
    _, starts = np.unique(aa, return_index=True)
    m = len(values)
    lens = np.diff(starts, append=m)
    new_lens = ((lens + 3) // 4) * 4
    new_starts = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(new_lens[:-1], out=new_starts[1:])
    total = int(new_lens.sum())
    run_of = np.repeat(np.arange(len(starts)), lens)
    idx = np.arange(m) - starts[run_of] + new_starts[run_of]
    values_p = np.full(total, np.uint64(0xFFFFFFFFFFFFFFFF),
                       dtype=np.uint64)
    values_p[idx] = values
    outs = [values_p]
    for p in payloads:
        p = np.asarray(p)
        pp = np.zeros(total, dtype=p.dtype)
        pp[idx] = p
        outs.append(pp)
    outs.append(new_starts)
    return tuple(outs)


def pack_db_quad(values: np.ndarray, euler_first: np.ndarray,
                 species_euk: np.ndarray) -> np.ndarray:
    """Pack the DB into a u32-quad row per entry: [M, 4] uint32.

    Columns: (value_lo32, value_hi32, payload_lo, payload_hi) where the
    payload carries euler_first (25 bits) and species+euk-flag (31 bits).
    One [cap+1, N]-indexed gather of this array replaces three separate
    gathers (u64 values + 2x i32 payloads) — XLA's u64 gather lowers to
    ~3x the cost of a u32-row gather on TPU, so fusing value and payload
    into u32 rows cuts probe time ~2.6x (measured on v5e).
    """
    v = values.astype(np.uint64)
    ef = euler_first.astype(np.uint32)
    sp = species_euk.astype(np.uint32)
    assert int(ef.max(initial=0)) < (1 << EF_BITS)
    quad = np.empty((len(v), 4), dtype=np.uint32)
    quad[:, 0] = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    quad[:, 1] = (v >> np.uint64(32)).astype(np.uint32)
    quad[:, 2] = ef | ((sp & np.uint32(0x7F)) << np.uint32(EF_BITS))
    quad[:, 3] = sp >> np.uint32(7)
    return quad


def pack_db_rows32(quad: np.ndarray, pad_entries: int = 256) -> np.ndarray:
    """Reshape a [M, 4] u32 quad DB into 512-byte rows [R, 128]
    (32 entries per row), padded with all-ones sentinel entries.

    512 B = 128 u32 = one full TPU lane width: XLA's gather lowering
    switches to a vectorized per-index copy at this row size — ~28 GB/s
    of random rows vs ~2.2 GB/s for 64 B rows on v5e
    (profiling/prof_gather_width.py, 2026-08-21).  With run starts
    4-aligned (align_runs4), a candidate window of up to 36 entries
    spans at most TWO consecutive rows — the whole candidate fetch is
    2 gather ops instead of ceil(cap/4)."""
    m = len(quad)
    total = ((m + pad_entries + 31) // 32) * 32
    blk = np.full((total, 4), 0xFFFFFFFF, dtype=np.uint32)
    blk[:m] = quad
    return blk.reshape(total // 32, 128)


def _gather_window_wide(db_w, lo, win):
    """[win, N, 4] candidate quads from 512-byte rows (32 entries each).

    Works for ARBITRARY run starts (no alignment padding, r5): fetches
    the ceil((31 + win)/32) consecutive rows that cover any in-row
    offset 0..31, then selects the window with a two-level VPU shift
    select — 8-way coarse on (offset>>2) over shifts of 4 entries, then
    4-way fine on (offset&3) over shifts of 1.  10 selects total vs 7
    for the old 4-aligned layout, for 2.5x less HBM + upload (the
    4-entry run alignment inflated short-run DBs ~2.5x)."""
    R = db_w.shape[0]
    n = lo.shape[0]
    b0 = lo >> 5
    nrows = (win + 62) // 32              # ceil((31 + win) / 32)
    rows = [db_w[jnp.clip(b0 + k, 0, R - 1)].reshape(n, 32, 4)
            for k in range(nrows)]
    ent = jnp.concatenate(rows, axis=1) if nrows > 1 else rows[0]
    s = ((lo >> 2) & 7).astype(jnp.int32)          # coarse offset/4 in 0..7
    wide = win + 3
    out = ent[:, 0:wide, :]
    for k in range(1, 8):
        out = jnp.where((s == k)[:, None, None],
                        ent[:, 4 * k:4 * k + wide, :], out)
    r = (lo & 3).astype(jnp.int32)                 # fine offset in 0..3
    fine = out[:, 0:win, :]
    for k in range(1, 4):
        fine = jnp.where((r == k)[:, None, None], out[:, k:k + win, :], fine)
    return jnp.moveaxis(fine, 1, 0)


def pack_db_blocks(quad: np.ndarray, pad_entries: int = 256) -> np.ndarray:
    """Reshape a [M, 4] u32 quad DB into 64-byte block rows [R, 16]
    (4 entries per row), padded with sentinel entries whose AA part is
    all-ones (no 5-bit AA group can be 31, so they never match a query).

    Rationale: TPU gathers are byte-bound with better throughput for
    wider rows (~1.5 GB/s at 16 B vs ~3.1 GB/s at 64 B,
    profiling/prof_gather_model.py), so the candidate window fetch reads
    ceil((cap+4)/4) aligned blocks per query instead of cap+1 entry rows
    and shuffles the window out on the VPU (_gather_blocks)."""
    m = len(quad)
    total = ((m + pad_entries + 3) // 4) * 4
    blk = np.full((total, 4), 0xFFFFFFFF, dtype=np.uint32)
    blk[:m] = quad
    return blk.reshape(total // 4, 16)


def _gather_blocks(db_blk, lo, win, aligned: bool = False):
    """[win, N, 4] candidate quads from 64-byte block rows.

    aligned=False: fetches ceil((win+3)/4) consecutive blocks starting
    at lo>>2; window entry j sits at in-superblock offset (lo&3)+j,
    selected with 4 vector compares (lo&3 is in [0, 3]).
    aligned=True (run starts block-aligned via align_runs4): exactly
    ceil(win/4) block gathers and NO shuffle — at win=cap=8 that is 2
    row gathers instead of 3 (~4.5 ms/batch on v5e at N=190k)."""
    R = db_blk.shape[0]
    n = lo.shape[0]
    b0 = lo >> 2
    if aligned:
        nblk = (win + 3) // 4
        blocks = [db_blk[jnp.clip(b0 + k, 0, R - 1)].reshape(n, 4, 4)
                  for k in range(nblk)]
        ent = jnp.concatenate(blocks, axis=1)    # [N, 4*nblk, 4]
        return jnp.moveaxis(ent[:, :win, :], 1, 0)
    nblk = (win + 6) // 4
    blocks = [db_blk[jnp.clip(b0 + k, 0, R - 1)].reshape(n, 4, 4)
              for k in range(nblk)]
    ent = jnp.concatenate(blocks, axis=1)        # [N, 4*nblk, 4]
    r = (lo & 3).astype(jnp.int32)
    outs = []
    for j in range(win):
        sel_idx = r + j
        acc = jnp.zeros((n, 4), db_blk.dtype)
        for t in range(j, j + 4):
            acc = jnp.where((sel_idx == t)[:, None], ent[:, t, :], acc)
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def _bucket_search(q_aa, q_valid, bucket_lo, db_aa_lo, bucket_shift,
                   bucket_steps, M):
    """Left-edge binary search: ONE bucket-pair row gather + low-32-bit
    bisection.  bucket_lo is the [2^bits, 2] (lo, hi) pair table."""
    qb = (q_aa >> _U64(bucket_shift)).astype(jnp.int32)
    pair = bucket_lo[qb]                         # [N, 2] one row gather
    lo = pair[:, 0]
    hi = pair[:, 1]
    q_lo32 = (q_aa & _U64(0xFFFFFFFF)).astype(jnp.uint32)
    for _ in range(bucket_steps):
        active = lo < hi
        mid = (lo + hi) >> 1
        v = db_aa_lo[jnp.clip(mid, 0, M - 1)]
        go = active & (v < q_lo32)
        hi = jnp.where(active & ~go, mid, hi)
        lo = jnp.where(go, mid + 1, lo)
    return lo


def match_kmers_quad(
    q_kmers,
    q_frames,
    q_valid,
    db_quad,
    cap: int = 64,
    kmer_format: int = 2,
    bucket_lo=None,
    db_aa_lo=None,
    bucket_shift: int = 0,
    bucket_steps: int = 0,
    lo_override=None,
    hash_table=None,
    hash_log2_rows: int = 0,
    hash_chain: int = 0,
    db_m: int = None,
    aligned: bool = False,
):
    """Probe a u32-quad-packed DB (see pack_db_quad) — cap-MAJOR layout.

    db_quad may instead be 64-byte block rows ([R, 16], pack_db_blocks);
    then db_m (the true entry count) is required.

    Single-gather variant of match_kmers_cm: the [cap+1, N] candidate
    window gathers one [M, 4] u32 row per slot; AA-run membership is a
    two-u32 compare against the gathered value halves.  Returns the same
    dict as match_kmers_cm with "taxid" = euler_first coordinates and
    "species" = species-with-euk-bit (the fused DP step's payloads).

    lo_override: precomputed left edges (callers that find run starts
    their own way, e.g. the run-count search) — skips _bucket_search.
    hash_table: build_aa_hash output — resolves run starts with `chain`
    row gathers instead of 1 + `bucket_steps` chained gathers.
    """
    U32 = jnp.uint32
    if db_quad.shape[1] == 128:
        # 512-byte rows come from pack_db_rows32 (sentinel pads never
        # AA-match, hash misses resolve lo = M), so the padded row space
        # is a correct default entry count; run starts may be arbitrary
        # (the wide window select handles any in-row offset)
        if db_m is None:
            db_m = db_quad.shape[0] * 32
        M = db_m
    elif db_quad.shape[1] == 16:
        assert db_m is not None, "block-row DB requires db_m"
        M = db_m
    else:
        M = db_m if db_m is not None else db_quad.shape[0]
    q_aa = q_kmers >> _U64(DNA_BITS)
    rlen = None
    if lo_override is not None:
        lo = lo_override
    elif hash_table is not None:
        lo, rlen = _hash_search(q_aa, hash_table, hash_log2_rows,
                                hash_chain, M)
    else:
        lo = _bucket_search(q_aa, q_valid, bucket_lo, db_aa_lo, bucket_shift,
                            bucket_steps, M)

    # with run lengths from the hash, overflow is known from the lookup
    # and the candidate window shrinks to exactly cap entries; without
    # them the window keeps a cap+1'th sentinel entry for the check
    win = cap if rlen is not None else cap + 1
    offs = jnp.arange(win, dtype=jnp.int32)[:, None]
    pos = lo[None, :] + offs
    if db_quad.shape[1] == 128:
        # 512-byte rows (32 entries, pack_db_rows32): the fast path —
        # per-op gather cost is ~flat in row width and drops 6x at the
        # full 128-lane row (prof_gather_width.py), so the whole window
        # is ceil((31+win)/32) ~= 2 gather ops regardless of cap
        assert rlen is not None, "wide rows require the AA hash"
        t_quad = _gather_window_wide(db_quad, lo, win)
    elif db_quad.shape[1] == 16:
        # 64-byte block rows (4 entries each, pack_db_blocks): gathers
        # are byte-bound at ~1.5 GB/s for 16 B rows but ~3.1 GB/s for
        # 64 B rows (profiling/prof_gather_model.py), so fetching a few
        # aligned blocks and shuffling the window out on the VPU beats
        # win narrow row gathers ~25% (no shuffle at all when run
        # starts are block-aligned, align_runs4)
        t_quad = _gather_blocks(db_quad, lo, win, aligned=aligned)
    else:
        idx = jnp.clip(pos, 0, M - 1)
        t_quad = db_quad[idx]                   # [win, N, 4]
    v_lo = t_quad[..., 0]
    v_hi = t_quad[..., 1]
    # AA equality on the split halves: high 32 AA bits live in v_hi,
    # the low 8 in v_lo's top byte
    q_hi = (q_aa >> _U64(8)).astype(U32)
    q_low8 = (q_aa & _U64(0xFF)).astype(U32)
    cmask = (v_hi == q_hi[None, :]) & ((v_lo >> U32(24)) == q_low8[None, :]) \
        & (pos < M) & q_valid[None, :]
    if rlen is not None:
        cmask = cmask & (offs < rlen[None, :])
        overflow = jnp.sum(q_valid & (rlen > cap)).astype(jnp.int32)
    else:
        overflow = jnp.sum(cmask[cap]).astype(jnp.int32)
        cmask = cmask[:cap]

    t_dna = (v_lo[:cap] & U32((1 << DNA_BITS) - 1)).astype(jnp.int32)
    q_dna = (q_kmers & _U64((1 << DNA_BITS) - 1)).astype(jnp.int32)[None, :]
    sel, hsum, rh = _hamming_filter(t_dna, q_dna, cmask, q_frames, kmer_format)

    p_lo = t_quad[:cap, :, 2]
    p_hi = t_quad[:cap, :, 3]
    ef = (p_lo & U32((1 << EF_BITS) - 1)).astype(jnp.int32)
    species = ((p_lo >> U32(EF_BITS)) | (p_hi << U32(7))).astype(jnp.int32)
    return {
        "sel": sel,
        "hamming": hsum,
        "rh": rh,
        "taxid": ef,
        "species": species,
        "dna_enc": t_dna,
        "overflow": overflow,
    }


def _hamming_filter(t_dna, q_dna, cmask, q_frames, kmer_format):
    """Shared per-codon hamming + cutoff + rh packing (cap-major)."""
    hsum = jnp.zeros_like(t_dna)
    rh_fwd = jnp.zeros_like(t_dna)
    rh_rev = jnp.zeros_like(t_dna)
    t_u = t_dna.astype(jnp.uint32)
    q_u = q_dna.astype(jnp.uint32)
    for i in range(KMER_LEN):
        qi = (q_u >> jnp.uint32(3 * i)) & jnp.uint32(7)
        ti = (t_u >> jnp.uint32(3 * i)) & jnp.uint32(7)
        h2, h = _codon_hamming((qi << jnp.uint32(3)) | ti)
        hsum = hsum + h
        rh_fwd = rh_fwd | (h2 << (2 * i))
        rh_rev = rh_rev | (h2 << (2 * (KMER_LEN - 1 - i)))

    big = jnp.int32(255)
    hsum_m = jnp.where(cmask, hsum, big)
    min_h = jnp.min(hsum_m, axis=0, keepdims=True)
    cutoff = jnp.minimum(min_h * 2, 7)
    sel = cmask & (hsum <= cutoff)

    fwd_frame = q_frames < 3
    use_fwd = jnp.logical_not(jnp.logical_xor(fwd_frame, kmer_format == 2))
    rh = jnp.where(use_fwd[None, :], rh_fwd, rh_rev)
    return sel, hsum, rh


def match_kmers_cm(
    q_kmers,
    q_frames,
    q_valid,
    db_values,
    db_taxids,
    db_species,
    cap: int = 64,
    kmer_format: int = 2,
    bucket_lo=None,
    db_aa_lo=None,
    bucket_shift: int = 0,
    bucket_steps: int = 0,
):
    """Probe sorted DB with query metamers — cap-MAJOR layout.

    All [cap, N] outputs keep N (large) as the minor axis: TPU tiles the
    two minor dims to (8, 128), so a minor axis of cap (~10) would pad
    every candidate tensor ~12.8x.  One searchsorted finds each query's
    run start; run membership is an equality test on the gathered AA
    parts (the reference's two-pointer merge makes the same comparison,
    KmerMatcher.cpp:251-466), and overflow is detected by probing one
    extra slot past the cap.

    Returns dict of [cap, N] arrays: sel (bool), hamming (int32 sum),
    rh (int32, 16-bit packed per-codon), taxid, species, dna_enc (int32,
    target 24-bit DNA part), plus overflow (int32 scalar: #queries whose
    run exceeded cap).
    """
    dna_mask = _U64((1 << DNA_BITS) - 1)
    M = db_values.shape[0]
    q_aa = q_kmers >> _U64(DNA_BITS)

    if bucket_lo is not None:
        lo = _bucket_search(q_aa, q_valid, bucket_lo, db_aa_lo, bucket_shift,
                            bucket_steps, M)
    else:
        db_aa = db_values >> _U64(DNA_BITS)
        lo = jnp.searchsorted(db_aa, q_aa, side="left").astype(jnp.int32)

    # one extra row past the cap: a query whose run still matches there
    # overflowed (exact count is not needed — the pipeline retries with
    # a doubled cap while any query overflows)
    offs = jnp.arange(cap + 1, dtype=jnp.int32)[:, None]
    pos = lo[None, :] + offs
    idx = jnp.clip(pos, 0, M - 1)
    t_vals = db_values[idx]
    cmask = ((t_vals >> _U64(DNA_BITS)) == q_aa[None, :]) \
        & (pos < M) & q_valid[None, :]
    overflow = jnp.sum(cmask[cap]).astype(jnp.int32)
    cmask = cmask[:cap]
    idx = idx[:cap]

    t_dna = (t_vals[:cap] & dna_mask).astype(jnp.int32)
    q_dna = (q_kmers & dna_mask).astype(jnp.int32)[None, :]
    sel, hsum, rh = _hamming_filter(t_dna, q_dna, cmask, q_frames, kmer_format)

    return {
        "sel": sel,
        "hamming": hsum,
        "rh": rh,
        "taxid": db_taxids[idx],
        "species": db_species[idx],
        "dna_enc": t_dna,
        "overflow": overflow,
    }


@functools.partial(jax.jit, static_argnames=("cap", "kmer_format",
                                              "bucket_shift", "bucket_steps"))
def match_kmers(
    q_kmers,
    q_frames,
    q_valid,
    db_values,
    db_taxids,
    db_species,
    cap: int = 64,
    kmer_format: int = 2,
    bucket_lo=None,
    db_aa_lo=None,
    bucket_shift: int = 0,
    bucket_steps: int = 0,
):
    """match_kmers_cm with the query-major [N, cap] public layout."""
    out = match_kmers_cm(q_kmers, q_frames, q_valid, db_values, db_taxids,
                         db_species, cap=cap, kmer_format=kmer_format,
                         bucket_lo=bucket_lo, db_aa_lo=db_aa_lo,
                         bucket_shift=bucket_shift, bucket_steps=bucket_steps)
    return {k: (v if v.ndim == 0 else v.T) for k, v in out.items()}
