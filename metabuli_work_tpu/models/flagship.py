"""The flagship device step: fused extract + probe for one read batch.

This is the single-chip "forward step" of the framework — everything the
device does per batch of reads (the host handles IO and final per-read
assignment).  Used by __graft_entry__ for compile checks and by bench.py.
"""

import functools

from ..ops import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp

from ..ops import encode_jax, match_jax


def _max_covered_dev(lens):
    """getMaxCoveredLength on device: len - (3, 4, 2)[len % 3]."""
    r = lens % 3
    sub = jnp.where(r == 0, 3, jnp.where(r == 1, 4, 2))
    return jnp.maximum(lens - sub, 0)


@functools.partial(jax.jit, static_argnames=("cap", "kmer_format", "syncmer", "smer_len"))
def classify_step(reads, lengths, db_values, db_taxids, db_species,
                  cap: int = 16, kmer_format: int = 2,
                  syncmer: bool = False, smer_len: int = 5):
    """reads uint8 [B, L], lengths int32 [B] -> match tensors.

    Returns the flat per-kmer match arrays plus query annotation; the
    host compacts/sorts them for scoring.
    """
    kmers, pos, valid = encode_jax.extract_batch(reads, lengths,
                                                 syncmer=syncmer, smer_len=smer_len)
    b = reads.shape[0]
    sids = jnp.arange(1, b + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
    out = match_jax.match_kmers(qk, qf, qv, db_values, db_taxids, db_species,
                                cap=cap, kmer_format=kmer_format)
    out["pos"] = qp
    out["frame"] = qf
    out["seq_id"] = qs
    return out


@functools.partial(jax.jit, static_argnames=("cap", "kmer_format", "syncmer",
                                              "smer_len", "paired",
                                              "bucket_shift", "bucket_steps"))
def fused_step(reads1, lens1, reads2, lens2, db_values, db_taxids, db_species,
               cap: int = 16, kmer_format: int = 2,
               syncmer: bool = False, smer_len: int = 5, paired: bool = False,
               bucket_lo=None, db_aa_lo=None,
               bucket_shift: int = 0, bucket_steps: int = 0):
    """One-dispatch device pipeline: extract (+mate2) -> probe -> compact.

    Fusing the whole per-batch device path into a single XLA program
    matters doubly here: XLA fuses the intermediate tensors away, and a
    remote/tunneled device pays per-dispatch round-trip latency that
    unfused jnp ops multiply by ~30x.

    Returns (packed int32 [6, N*cap], count, overflow).
    """
    from ..ops import compact_jax

    kmers, pos, valid = encode_jax.extract_batch(reads1, lens1,
                                                 syncmer=syncmer, smer_len=smer_len,
                                                 kmer_format=kmer_format)
    b = reads1.shape[0]
    sids = jnp.arange(1, b + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
    if paired:
        k2, p2, v2 = encode_jax.extract_batch(reads2, lens2,
                                              syncmer=syncmer, smer_len=smer_len,
                                              kmer_format=kmer_format)
        # mate-2 positions offset by maxCoveredLength(len1) + 3
        # (KmerExtractor.cpp:341-346: queryLength is getMaxCoveredLength)
        p2 = p2 + (_max_covered_dev(lens1) + 3)[:, None, None]
        qk2, qp2, qf2, qs2, qv2 = encode_jax.flatten_batch(k2, p2, v2, sids)
        qk = jnp.concatenate([qk, qk2])
        qp = jnp.concatenate([qp, qp2])
        qf = jnp.concatenate([qf, qf2])
        qs = jnp.concatenate([qs, qs2])
        qv = jnp.concatenate([qv, qv2])
    out = match_jax.match_kmers(qk, qf, qv, db_values, db_taxids, db_species,
                                cap=cap, kmer_format=kmer_format,
                                bucket_lo=bucket_lo, db_aa_lo=db_aa_lo,
                                bucket_shift=bucket_shift,
                                bucket_steps=bucket_steps)
    packed, count = compact_jax.compact_and_sort(out, qp, qf, qs)
    return packed, count, out["overflow"]


def _fused_core(reads1, lens1, reads2, lens2, db_quad, min_cons: int = 4,
                  min_cons_euk: int = 9,
                  cap: int = 16, kmer_format: int = 2,
                  syncmer: bool = False, smer_len: int = 5,
                  paired: bool = False,
                  bucket_lo=None, db_aa_lo=None,
                  bucket_shift: int = 0, bucket_steps: int = 0,
                  path_width: int = 0, win_frac: int = 0,
                  path_block: int = 16, ra1=None, ra2=None,
                  dp_pallas: bool = False, pallas_interpret: bool = False,
                  hash_table=None, hash_log2_rows: int = 0,
                  hash_chain: int = 0, probe_fn=None, db_m: int = None,
                  aligned: bool = False):
    """Full device pipeline WITH on-device path DP.

    extract (+mate2) -> probe -> per-window candidate sort -> path DP ->
    path compaction.  The host receives emitted MatchPaths (10-100x fewer
    than matches) plus resident match tensors for the later best-species
    redundancy fetch.

    db_quad: uint32 [M, 4] packed rows (match_jax.pack_db_quad) fusing
    the metamer value with two prefolded payloads — species id with
    bit 30 = "under Eukaryota" (species there get minConsCntEuk,
    reference Taxonomer.cpp:497-500) and euler_first[taxid] (the
    LCA-ready coordinate the redundancy kernel needs) — so the whole
    candidate probe is ONE u32-row gather.

    Returns (packed_hdr [7, 1+P], resident): column 0 of packed_hdr is a
    stats header (rows 0-3 = candidate-cap overflow, path_count,
    window-compaction overflow, blocked-packer lane overflow), columns
    1..P the compacted path columns; resident =
    (sel, species, ham, ef, q_pos, q_sids) stays on device for the later
    redundancy kernel.
    """
    qk, qp, qf, qs, qv, shapes, win_over = _extract_all(
        reads1, lens1, reads2, lens2, ra1, ra2, syncmer=syncmer,
        smer_len=smer_len, kmer_format=kmer_format, win_frac=win_frac,
        paired=paired)

    if probe_fn is not None:
        # mesh-sharded probe (parallel/sharding.py): each db shard probes
        # its metamer range locally, a psum over 'db' merges the
        # exclusive per-shard candidate tensors
        out = probe_fn(qk, qf, qv)
    else:
        out = match_jax.match_kmers_quad(qk, qf, qv, db_quad, cap=cap,
                                         kmer_format=kmer_format,
                                         bucket_lo=bucket_lo, db_aa_lo=db_aa_lo,
                                         bucket_shift=bucket_shift,
                                         bucket_steps=bucket_steps,
                                         hash_table=hash_table,
                                         hash_log2_rows=hash_log2_rows,
                                         hash_chain=hash_chain, db_m=db_m,
                                         aligned=aligned)
    # compact 5-column path layout when every 16-bit field provably
    # fits (g < 2^16, end+26 < 2^16, path hamming < 2^16); long-read
    # chunks beyond 16 kb keep the 7-column layout
    b = reads1.shape[0]
    lmax_all = reads1.shape[1] + (reads2.shape[1] + 3 if paired else 0)
    compact5 = (b * 6 < (1 << 16)) and (lmax_all < (1 << 14))
    return _dp_from_probe(out, qp, qs, shapes, win_over, cap=cap,
                          kmer_format=kmer_format, syncmer=syncmer,
                          smer_len=smer_len, min_cons=min_cons,
                          min_cons_euk=min_cons_euk, path_width=path_width,
                          path_block=path_block, win_frac=win_frac,
                          compact5=compact5, dp_pallas=dp_pallas,
                          pallas_interpret=pallas_interpret)


def _extract_all(reads1, lens1, reads2, lens2, ra1, ra2, *, syncmer,
                 smer_len, kmer_format, win_frac, paired):
    """Query extraction half of the fused step: 6-frame metamer encode
    (+ paired mate-2 with the len1+3 position offset,
    KmerExtractor.cpp:341-345) + optional syncmer window compaction.

    Returns flat (qk, qp, qf, qs, qv) query tensors, the per-part
    [B, 6, W] shapes, and the window-compaction overflow count."""
    # syncmer window compaction: only ~half the windows pass the anchor
    # rule, and probe gathers dominate the step — shrink the W axis to
    # win_frac/256 of its static size before probing (dyn_gap path DP
    # chains compacted slots by real position gaps).  win_frac == 0 or
    # >= 256 disables compaction.
    dyn_gap = bool(syncmer and kmer_format == 2 and 0 < win_frac < 256)
    win_over = jnp.int32(0)

    def extract_part(reads, lens, ra):
        nonlocal win_over
        kk, pp, vv = encode_jax.extract_batch(reads, lens, syncmer=syncmer,
                                              smer_len=smer_len,
                                              kmer_format=kmer_format,
                                              reads_ra=ra)
        if dyn_gap:
            W = kk.shape[2]
            w_c = max(min((W * win_frac + 255) // 256, W), 1)
            kk, pp, vv, over = encode_jax.compact_windows(kk, pp, vv, w_c)
            win_over = win_over + over
        return kk, pp, vv

    k1, p1, v1 = extract_part(reads1, lens1, ra1)
    b = reads1.shape[0]
    sids = jnp.arange(1, b + 1, dtype=jnp.int32)
    parts = [encode_jax.flatten_batch(k1, p1, v1, sids)]
    shapes = [k1.shape]  # (B, 6, W)
    if paired:
        k2, p2, v2 = extract_part(reads2, lens2, ra2)
        # mate-2 offset: maxCoveredLength(len1) + 3 (KmerExtractor.cpp:341-346)
        p2 = p2 + (_max_covered_dev(lens1) + 3)[:, None, None]
        parts.append(encode_jax.flatten_batch(k2, p2, v2, sids))
        shapes.append(k2.shape)
    else:
        # keep the dummy mate-2 parameters alive so XLA's unused-parameter
        # DCE cannot change the executable's buffer arity across cache hits
        tie = jnp.where(lens2[0] < 0, reads2[0, 0].astype(jnp.int32), 0)
        if ra2 is not None:
            tie = tie + jnp.where(lens2[0] < 0, ra2[0, 0].astype(jnp.int32), 0)
        sids = sids + tie

    qk = jnp.concatenate([p[0] for p in parts])
    qp = jnp.concatenate([p[1] for p in parts])
    qf = jnp.concatenate([p[2] for p in parts])
    qs = jnp.concatenate([p[3] for p in parts])
    qv = jnp.concatenate([p[4] for p in parts])
    return qk, qp, qf, qs, qv, shapes, win_over


def _dp_from_probe(out, qp, qs, shapes, win_over, *, cap, kmer_format,
                   syncmer, smer_len, min_cons, min_cons_euk, path_width,
                   path_block, win_frac, compact5, dp_pallas=False,
                   pallas_interpret=False):
    """Post-probe half of the fused step: per-part candidate sort +
    consecutive-match path DP + blocked packing + static-width
    compaction.  `out` is a match_kmers_quad-style candidate dict
    ([cap, N] tensors) from any probe — resident, mesh-merged, or
    range-accumulated (the DB-streaming pass loop)."""
    from ..ops import dp_jax

    dyn_gap = bool(syncmer and kmer_format == 2 and 0 < win_frac < 256)
    blk_over = jnp.int32(0)
    sp_clean = out["species"] & jnp.int32(0x3FFFFFFF)

    max_shift = (8 - smer_len) if syncmer else 1
    packed_parts = []
    sel_parts = []
    offset = 0
    for (B, F, W) in shapes:
        n = B * F * W
        sl = slice(offset, offset + n)
        offset += n
        resh = lambda a: a[:, sl].reshape(cap, B * F, W)
        # the euk flag rides in species bit 30 straight through the
        # candidate sort and the DP's species-equality compares (the bit
        # is constant per species); path_dp strips it at emission
        fields = {
            "sel": resh(out["sel"]),
            "species": resh(out["species"]),
            "dna": resh(out["dna_enc"]),
            "rh": resh(out["rh"]),
            "ham": resh(out["hamming"]),
            "pos": jnp.broadcast_to(qp[sl].reshape(1, B * F, W),
                                    (cap, B * F, W)),
        }
        if dp_pallas:
            from ..ops import dp_pallas as dpp

            # the pallas kernel ranks candidates internally but expects
            # the flip (positions ascending per lane) done by the caller
            frame_ids = jnp.arange(B * F, dtype=jnp.int32) % 6
            rev_g = ((frame_ids >= 3) if kmer_format != 1
                     else (frame_ids < 3))[None, :, None]
            fl = lambda a: jnp.where(rev_g, a[:, :, ::-1], a)
            sp_m = jnp.where(fl(fields["sel"]), fl(fields["species"]),
                             jnp.int32(-1))
            cols, psel, b_over = dpp.path_dp_blocked(
                sp_m, fl(fields["dna"]), fl(fields["rh"]),
                fl(fields["ham"]), fl(fields["pos"]),
                min_cons=min_cons, min_cons_euk=min_cons_euk,
                max_shift=max_shift, kmer_format=kmer_format,
                dyn_gap=dyn_gap, block_w=path_block, compact5=compact5,
                interpret=pallas_interpret)
        else:
            # pos is constant along the sorted cap axis (one query
            # position per window) — permuting it is a no-op, skip it
            pos_b = fields.pop("pos")
            fields = dp_jax.sort_candidates(fields, fields["sel"],
                                            fields["ham"], fields["dna"])
            fields["pos"] = pos_b
            md = jnp.where((fields["species"] >> 30) & 1 != 0,
                           jnp.int32(min_cons_euk), jnp.int32(min_cons))
            dp = dp_jax.path_dp(fields["sel"], fields["species"],
                                fields["dna"], fields["rh"], fields["ham"],
                                fields["pos"], md,
                                max_shift=max_shift, kmer_format=kmer_format,
                                dyn_gap=dyn_gap)
            cols, psel, b_over = dp_jax.pack_paths_blocked(
                dp, path_block, compact5=compact5)
        blk_over = blk_over + b_over
        packed_parts.append(cols)
        sel_parts.append(psel)

    cols = jnp.concatenate(packed_parts, axis=1)
    psel = jnp.concatenate(sel_parts)
    paths_packed, paths_count = dp_jax.compact_columns(cols, psel,
                                                       out_width=path_width)

    resident = (out["sel"], sp_clean, out["hamming"], out["taxid"], qp, qs)
    stats = jnp.stack([out["overflow"], paths_count, win_over, blk_over])
    return stats, paths_packed, resident


# ---------------------------------------------------------------------- #
# DB-bigger-than-HBM streaming: the fused step split into three jitted
# stages so the probe can loop over metamer-range passes of an index too
# large to keep resident (the reference's --max-ram split loop recast:
# QueryIndexer.cpp:30-147, KmerMatcher.cpp:166-198).  Ranges are cut at
# AA-part boundaries, so each query's whole candidate run lives in
# exactly ONE range — the per-range [cap, N] contributions are disjoint
# and merge by masked accumulation (the same exclusivity argument as the
# mesh psum merge), and the min(2*minHamming, 7) cutoff computed inside
# the owning range equals the global cutoff.

@functools.partial(jax.jit, static_argnames=(
    "syncmer", "smer_len", "kmer_format", "win_frac", "paired"))
def extract_queries_step(reads1, lens1, reads2, lens2, ra1=None, ra2=None,
                         syncmer: bool = False, smer_len: int = 5,
                         kmer_format: int = 2, win_frac: int = 0,
                         paired: bool = False):
    """Stage 1: extract once, keep flat query tensors resident across
    all DB-range passes."""
    qk, qp, qf, qs, qv, _shapes, win_over = _extract_all(
        reads1, lens1, reads2, lens2, ra1, ra2, syncmer=syncmer,
        smer_len=smer_len, kmer_format=kmer_format, win_frac=win_frac,
        paired=paired)
    return qk, qp, qf, qs, qv, win_over


@functools.partial(jax.jit, static_argnames=(
    "cap", "kmer_format", "hash_log2_rows", "hash_chain"),
    donate_argnums=(5, 6, 7, 8, 9, 10, 11))
def probe_range_step(qk, qf, qv, quad_r, hash_r,
                     acc_sel, acc_ham, acc_rh, acc_tax, acc_sp, acc_dna,
                     acc_over,
                     cap: int = 16, kmer_format: int = 2,
                     hash_log2_rows: int = 8, hash_chain: int = 1):
    """Stage 2 (one per range pass): probe one resident index range and
    fold its candidates into the accumulators (donated buffers)."""
    out = match_jax.match_kmers_quad(
        qk, qf, qv, quad_r, cap=cap, kmer_format=kmer_format,
        hash_table=hash_r, hash_log2_rows=hash_log2_rows,
        hash_chain=hash_chain)
    sel = out["sel"]
    z = lambda a: jnp.where(sel, a, jnp.zeros((), a.dtype))
    return (acc_sel | sel,
            acc_ham + z(out["hamming"]),
            acc_rh + z(out["rh"]),
            acc_tax + z(out["taxid"]),
            acc_sp + z(out["species"]),
            acc_dna + z(out["dna_enc"]),
            acc_over + out["overflow"])


@functools.partial(jax.jit, static_argnames=(
    "min_cons", "min_cons_euk", "cap", "kmer_format", "syncmer", "smer_len",
    "path_width", "win_frac", "path_block", "compact5", "shapes",
    "dp_pallas", "pallas_interpret"))
def finish_stream_step(acc_sel, acc_ham, acc_rh, acc_tax, acc_sp, acc_dna,
                       acc_over, qp, qs, win_over,
                       min_cons: int = 4, min_cons_euk: int = 9,
                       cap: int = 16, kmer_format: int = 2,
                       syncmer: bool = False, smer_len: int = 5,
                       path_width: int = 0, win_frac: int = 0,
                       path_block: int = 16, compact5: bool = False,
                       shapes: tuple = (),
                       dp_pallas: bool = False,
                       pallas_interpret: bool = False):
    """Stage 3: candidate sort + path DP + compaction over the
    range-accumulated candidates; same output contract as fused_step_dp
    (packed_hdr with the stats header column, resident tensors)."""
    out = {"sel": acc_sel, "hamming": acc_ham, "rh": acc_rh,
           "taxid": acc_tax, "species": acc_sp, "dna_enc": acc_dna,
           "overflow": acc_over}
    stats, paths_packed, resident = _dp_from_probe(
        out, qp, qs, shapes, win_over, cap=cap, kmer_format=kmer_format,
        syncmer=syncmer, smer_len=smer_len, min_cons=min_cons,
        min_cons_euk=min_cons_euk, path_width=path_width,
        path_block=path_block, win_frac=win_frac, compact5=compact5,
        dp_pallas=dp_pallas, pallas_interpret=pallas_interpret)
    hdr = jnp.zeros((paths_packed.shape[0], 1), jnp.int32)
    hdr = hdr.at[:4, 0].set(stats)
    packed_hdr = jnp.concatenate([hdr, paths_packed], axis=1)
    return packed_hdr, resident


@functools.partial(jax.jit, static_argnames=(
    "min_cons", "min_cons_euk", "cap", "kmer_format", "syncmer", "smer_len",
    "paired", "bucket_shift", "bucket_steps", "path_width", "win_frac",
    "path_block", "dp_pallas", "pallas_interpret", "hash_log2_rows",
    "hash_chain", "db_m", "aligned"))
def fused_step_dp(reads1, lens1, reads2, lens2, db_quad, min_cons: int = 4,
                  min_cons_euk: int = 9,
                  cap: int = 16, kmer_format: int = 2,
                  syncmer: bool = False, smer_len: int = 5,
                  paired: bool = False,
                  bucket_lo=None, db_aa_lo=None,
                  bucket_shift: int = 0, bucket_steps: int = 0,
                  path_width: int = 0, win_frac: int = 0,
                  path_block: int = 16, ra1=None, ra2=None,
                  dp_pallas: bool = False, pallas_interpret: bool = False,
                  hash_table=None, hash_log2_rows: int = 0,
                  hash_chain: int = 0, db_m: int = None,
                  aligned: bool = False):
    """Host-scoring variant: see _fused_core.  Returns (packed_hdr,
    resident) — column 0 of packed_hdr is the stats header (rows 0-3 =
    candidate-cap overflow, path count, window-compaction overflow,
    blocked-packer lane overflow), columns 1..P the compacted paths.
    stats ride home as HEADER COLUMN 0 of the packed array: the host
    then needs ONE blocking fetch per batch (stats + path prefix
    together) — each separate np.asarray costs a full tunnel
    round-trip (~1.5 ms) plus a queue stall."""
    stats, paths_packed, resident = _fused_core(
        reads1, lens1, reads2, lens2, db_quad, min_cons=min_cons,
        min_cons_euk=min_cons_euk, cap=cap, kmer_format=kmer_format,
        syncmer=syncmer, smer_len=smer_len, paired=paired,
        bucket_lo=bucket_lo, db_aa_lo=db_aa_lo, bucket_shift=bucket_shift,
        bucket_steps=bucket_steps, path_width=path_width, win_frac=win_frac,
        path_block=path_block, ra1=ra1, ra2=ra2, dp_pallas=dp_pallas,
        pallas_interpret=pallas_interpret, hash_table=hash_table,
        hash_log2_rows=hash_log2_rows, hash_chain=hash_chain, db_m=db_m,
        aligned=aligned)
    hdr = jnp.zeros((paths_packed.shape[0], 1), jnp.int32)
    hdr = hdr.at[:4, 0].set(stats)
    packed_hdr = jnp.concatenate([hdr, paths_packed], axis=1)
    return packed_hdr, resident


@functools.partial(jax.jit, static_argnames=(
    "min_cons", "min_cons_euk", "cap", "kmer_format", "syncmer", "smer_len",
    "paired", "bucket_shift", "bucket_steps", "path_width", "win_frac",
    "path_block", "dp_pallas", "pallas_interpret", "hash_log2_rows",
    "hash_chain", "db_m", "aligned",
    "min_score", "tie_ratio", "combine_k", "dna_shift", "n_quot", "part_w"))
def fused_step_full(reads1, lens1, reads2, lens2, db_quad,
                    ef_node, euler, depth, lift,
                    min_cons: int = 4, min_cons_euk: int = 9,
                    cap: int = 16, kmer_format: int = 2,
                    syncmer: bool = False, smer_len: int = 5,
                    paired: bool = False,
                    bucket_lo=None, db_aa_lo=None,
                    bucket_shift: int = 0, bucket_steps: int = 0,
                    path_width: int = 0, win_frac: int = 0,
                    path_block: int = 16, ra1=None, ra2=None,
                    dp_pallas: bool = False, pallas_interpret: bool = False,
                    min_score: float = 0.0, tie_ratio: float = 0.95,
                    combine_k: int = 8, dna_shift: int = 0, n_quot: int = 0,
                    part_w: tuple = (), hash_table=None,
                    hash_log2_rows: int = 0, hash_chain: int = 0,
                    db_m: int = None, aligned: bool = False):
    """Whole-batch device chain: fused step + species assign + redundancy.

    Device->host traffic shrinks from the full path array (~0.5 MB) to
    one [6, B+1] record table + the redundancy pair list (the tunnel
    link is the pipeline bottleneck — see ops/assign_jax.py).

    Returns (records, packed2): records rows = (live, tie_cnt, total
    f32 bits, tied LCA, first tied species, top species) per 1-based
    read column; column 0 rows 0-4 hold the stats header (candidate-cap
    overflow, path count, window overflow, block overflow, combine_k
    overflow).  packed2 = redundancy_counts' (rid, lca) pair columns
    with its own stats column 0.
    """
    from ..ops import assign_jax

    stats, paths_packed, resident = _fused_core(
        reads1, lens1, reads2, lens2, db_quad, min_cons=min_cons,
        min_cons_euk=min_cons_euk, cap=cap, kmer_format=kmer_format,
        syncmer=syncmer, smer_len=smer_len, paired=paired,
        bucket_lo=bucket_lo, db_aa_lo=db_aa_lo, bucket_shift=bucket_shift,
        bucket_steps=bucket_steps, path_width=path_width, win_frac=win_frac,
        path_block=path_block, ra1=ra1, ra2=ra2, dp_pallas=dp_pallas,
        pallas_interpret=pallas_interpret, hash_table=hash_table,
        hash_log2_rows=hash_log2_rows, hash_chain=hash_chain, db_m=db_m,
        aligned=aligned)

    B = reads1.shape[0]
    qlens = jnp.zeros(B + 1, jnp.int32)
    qlens = qlens.at[1:].set(
        _max_covered_dev(lens1)
        + (_max_covered_dev(lens2) if paired else 0))
    records, best_sp, over_k = assign_jax.device_assign(
        paths_packed, stats[1], qlens, ef_node, euler, depth, lift,
        min_score=min_score, tie_ratio=tie_ratio, combine_k=combine_k)
    records = records.at[:5, 0].set(
        jnp.concatenate([stats, over_k[None]]))

    sel, species, ham, ef, q_pos, q_sids = resident
    packed2 = _redundancy_core(sel, species, ham, ef, q_pos, q_sids,
                               best_sp, euler, depth, lift,
                               dna_shift=dna_shift, n_quot=n_quot,
                               part_w=part_w)
    return records, packed2


def part_widths(lmax1, lmax2, paired, syncmer, kmer_format, smer_len,
                win_frac):
    """Per-read flat slot count (6 frames x compacted windows) per part.

    Shared between fused_step_dp's extract and the pipeline so the
    redundancy kernel can rebuild read ids by broadcast instead of
    carrying [N] gather tables.
    """
    from ..ops.encode_jax import max_windows

    dyn_gap = bool(syncmer and kmer_format == 2 and 0 < win_frac < 256)

    def one(lmax):
        W = max_windows(lmax)
        if dyn_gap:
            W = max(min((W * win_frac + 255) // 256, W), 1)
        return 6 * W

    return (one(lmax1), one(lmax2)) if paired else (one(lmax1),)


def _lca_pair_lift(a, b, depth, lift):
    """Vectorized pairwise LCA via binary lifting (~2*levels gathers)."""
    levels = lift.shape[0]
    da, db = depth[a], depth[b]
    swap = db > da
    x = jnp.where(swap, b, a)            # deeper node
    y = jnp.where(swap, a, b)
    diff = jnp.abs(da - db)
    for k in range(levels):
        x = jnp.where((diff >> k) & 1 == 1, lift[k][x], x)
    eq = x == y
    for k in range(levels - 1, -1, -1):
        lx, ly = lift[k][x], lift[k][y]
        go = lx != ly
        x = jnp.where(go, lx, x)
        y = jnp.where(go, ly, y)
    return jnp.where(eq, x, lift[0][x])


@functools.partial(jax.jit, static_argnames=("dna_shift", "n_quot",
                                             "part_w", "out_w"))
def redundancy_counts(sel, species, ham, ef, q_pos, q_sids,
                      best_sp_per_read, euler, depth, lift,
                      dna_shift: int, n_quot: int, part_w: tuple = (),
                      out_w: int = 0):
    """Jitted standalone wrapper of _redundancy_core (used when the host
    computes best_sp; fused_step_full inlines the core instead).

    out_w > 0 compacts the (rid, lca) pairs into a fixed small prefix
    [2, 1+out_w] instead of the full [2, 1+B*n_quot] buffer — the pair
    fetch is the pipeline's per-batch D2H tail, so a right-sized prefix
    cuts the blocking transfer ~10x when the tunnel degrades.  The true
    pair count still rides in the stats column; count > out_w means
    rows were dropped and the caller re-runs with a doubled width."""
    return _redundancy_core(sel, species, ham, ef, q_pos, q_sids,
                            best_sp_per_read, euler, depth, lift,
                            dna_shift=dna_shift, n_quot=n_quot,
                            part_w=part_w, out_w=out_w)


def _redundancy_core(sel, species, ham, ef, q_pos, q_sids,
                     best_sp_per_read, euler, depth, lift,
                     dna_shift: int, n_quot: int, part_w: tuple = (),
                     out_w: int = 0):
    """Phase 2 on device: best-species redundancy filter + grouped LCA.

    Groups each read's best-species matches by query pos // dna_shift,
    keeps the min-hamming rows per group, and reduces each group to one
    LCA taxid — set-LCA computed as the pairwise LCA of the group's two
    extremal euler-first members (euler[min f], euler[max f]), pairwise
    LCA by binary lifting.  Returns compacted (rid, lca_taxid) int32
    pairs (one per surviving group), their count, and the best-species
    match count.  Replaces a match-level device->host fetch + host
    lexsort/LCA-fold (reference Taxonomer::filterRedundantMatches +
    per-group LCA, src/commons/Taxonomer.cpp:219-243) with two scatter
    extremes and ~2*log(depth) gathers on device.  Returns
    (packed [2, n_groups], stats int32 [pair_count, match_count]).
    """
    from ..ops import dp_jax

    I32 = jnp.int32
    cap, N = sel.shape
    B1 = best_sp_per_read.shape[0]       # B + 1
    B = B1 - 1
    n_groups = B * n_quot
    BIG = jnp.int32(0x7FFFFFFF)

    if part_w and sum(part_w) * B == N:
        # per-slot read index and best species rebuilt by broadcast
        # (part_w = static per-mate slots per read): replaces two [N]
        # gathers, ~1.4 ms each on v5e
        best1 = best_sp_per_read[1:]
        rs, ws = [], []
        for w in part_w:
            rs.append(jnp.broadcast_to(
                jnp.arange(B, dtype=I32)[:, None], (B, w)).reshape(B * w))
            ws.append(jnp.broadcast_to(
                best1[:, None], (B, w)).reshape(B * w))
        r0 = jnp.concatenate(rs) if len(rs) > 1 else rs[0]
        want = jnp.concatenate(ws) if len(ws) > 1 else ws[0]
    else:
        r0 = q_sids - 1
        want = best_sp_per_read[q_sids]                   # [N]
    sel2 = sel & (species == want[None, :]) & (want[None, :] > 0)

    quot = jnp.clip(q_pos // dna_shift, 0, n_quot - 1)
    gidx = r0 * n_quot + quot                             # [N]

    # packed-key reduction: (hamming, euler_first) lexicographic mins in
    # ONE int32 key — ham <= 32 (6 bits) rides above a 25-bit ef, so a
    # single scatter-min yields the group's min hamming AND the min ef
    # among min-hamming rows; a second key with ef complemented yields
    # the max ef.  Replaces the older 3-scatter + [N]-gather + re-test
    # flow (gathers/scatters cost ~10 ns/elem on TPU — the fewer [N]
    # passes, the better).  ef < 2^25 is asserted at taxonomy load.
    EFM = jnp.int32((1 << 25) - 1)
    hk = ham.astype(I32) << 25
    k1 = jnp.where(sel2, hk | ef, BIG)
    k2 = jnp.where(sel2, hk | (EFM - ef), BIG)
    s1 = jnp.min(k1, axis=0)                              # [N]
    s2 = jnp.min(k2, axis=0)
    g1 = jnp.full(n_groups, BIG, I32).at[gidx].min(s1, mode="drop")
    g2 = jnp.full(n_groups, BIG, I32).at[gidx].min(s2, mode="drop")
    fmin = g1 & EFM
    fmax = EFM - (g2 & EFM)

    gvalid = g1 < BIG
    a = euler[jnp.clip(fmin, 0, euler.shape[0] - 1)]
    b = euler[jnp.clip(fmax, 0, euler.shape[0] - 1)]
    lca = _lca_pair_lift(a, b, depth, lift)

    rid = jnp.arange(n_groups, dtype=I32) // n_quot + 1
    cols = jnp.stack([rid, lca.astype(I32)])
    packed, count = dp_jax.compact_columns(cols, gvalid, out_width=out_w)
    # stats as header column 0 (see fused_step_dp): one host fetch
    stats = jnp.stack([count, jnp.sum(sel2).astype(I32)])
    return jnp.concatenate([stats[:, None], packed], axis=1)


def synthetic_db(n_kmers=4096, n_species=8, seed=0):
    """Small synthetic sorted index for compile checks and dry runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    aa = rng.integers(0, 2**40, size=n_kmers, dtype=np.uint64)
    dna = rng.integers(0, 2**24, size=n_kmers, dtype=np.uint64)
    values = np.unique((aa << np.uint64(24)) | dna)
    taxids = rng.integers(2, 2 + n_species * 4, size=len(values)).astype(np.int32)
    species = (2 + (taxids - 2) % n_species).astype(np.int32)
    return values, taxids, species


def synthetic_reads(batch=32, length=150, seed=1):
    import numpy as np

    rng = np.random.default_rng(seed)
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(batch, length))
    lengths = np.full(batch, length, dtype=np.int32)
    return reads, lengths
