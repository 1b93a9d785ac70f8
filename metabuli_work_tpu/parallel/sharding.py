"""Device-mesh sharding of the classify step.

Parallelism inventory mapping (SURVEY.md section 2.9): the reference's
OpenMP thread-parallelism over query ranges and its mmap'd single-node DB
become, TPU-natively:

  * data parallelism over reads: 'dp' mesh axis, read batches sharded on
    the batch dimension;
  * index sharding: 'db' mesh axis, the sorted metamer array cut into
    contiguous value ranges at amino-acid-part boundaries (so every
    AA run lives in exactly one shard and probes never straddle shards);
  * collective merge: each device probes its local index shard with its
    dp-local queries; non-owning shards contribute empty (zero) match
    rows, so a psum over 'db' reconstructs the complete match tensor —
    the all-to-all candidate-merge of SURVEY.md section 5.8 reduced to
    one reduction because ownership is exclusive.

Everything below is shard_map over a Mesh; XLA inserts the collectives
(ICI within a slice).  Works identically on a virtual CPU mesh
(xla_force_host_platform_device_count) for testing.
"""

import functools

import numpy as np

from ..ops import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import encode_jax
from ..ops.genetic_code import HAMMING_TABLE, KMER_LEN

# numpy at module level; converted inside traces so it embeds as an HLO
# literal (module-level jax.Arrays become implicit executable args, which
# corrupts the jit dispatch cache across shapes)
_HAMMING_NP = HAMMING_TABLE.astype(np.int32)


def make_mesh(n_devices=None, dp=None):
    """Factor devices into a (dp, db) mesh; db gets the larger factor."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if dp is None:
        dp = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                dp = f
                break
    db = n // dp
    return Mesh(np.array(devs).reshape(dp, db), ("dp", "db"))


def shard_index(values, taxids, species, n_shards):
    """Cut the sorted index into n_shards ranges at AA-part boundaries.

    Returns padded [n_shards, S] arrays + per-shard entry counts.  Padding
    uses the max uint64 value so searchsorted never selects it.
    """
    m = len(values)
    aa = values >> np.uint64(24)
    bounds = [0]
    for k in range(1, n_shards):
        t = k * m // n_shards
        # advance to the next AA boundary so runs stay intact
        while t < m and t > 0 and aa[t] == aa[t - 1]:
            t += 1
        bounds.append(min(t, m))
    bounds.append(m)
    counts = np.diff(bounds)
    S = int(counts.max()) if m else 1
    pv = np.full((n_shards, S), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    pt = np.zeros((n_shards, S), dtype=np.int32)
    ps = np.zeros((n_shards, S), dtype=np.int32)
    for i in range(n_shards):
        lo, hi = bounds[i], bounds[i + 1]
        pv[i, : hi - lo] = values[lo:hi]
        pt[i, : hi - lo] = taxids[lo:hi]
        ps[i, : hi - lo] = species[lo:hi]
    return pv, pt, ps, counts.astype(np.int32)


def _probe_local(q_kmers, q_frames, q_valid, db_values, db_count, db_taxids, db_species,
                 cap, kmer_format):
    """Single-shard probe; queries owned by other shards yield zero rows.

    Mirrors ops/match_jax.match_kmers but against a padded local shard.
    """
    hamming_tbl = jnp.asarray(_HAMMING_NP)
    dna_mask = jnp.uint64((1 << 24) - 1)
    S = db_values.shape[0]
    db_aa = db_values >> jnp.uint64(24)
    q_aa = q_kmers >> jnp.uint64(24)
    lo = jnp.searchsorted(db_aa, q_aa, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(db_aa, q_aa, side="right").astype(jnp.int32)
    hi = jnp.minimum(hi, db_count)
    lo = jnp.minimum(lo, db_count)
    run = hi - lo

    offs = jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = jnp.clip(lo[:, None] + offs, 0, S - 1)
    cmask = (offs < run[:, None]) & q_valid[:, None]

    t_vals = db_values[idx]
    t_dna = (t_vals & dna_mask).astype(jnp.int32)
    q_dna = (q_kmers & dna_mask).astype(jnp.int32)[:, None]
    hsum = jnp.zeros_like(t_dna)
    rh_fwd = jnp.zeros_like(t_dna)
    rh_rev = jnp.zeros_like(t_dna)
    for i in range(KMER_LEN):
        qi = (q_dna >> (3 * i)) & 7
        ti = (t_dna >> (3 * i)) & 7
        h = hamming_tbl[(qi << 3) | ti]
        hsum = hsum + h
        h2 = h & 3
        rh_fwd = rh_fwd | (h2 << (2 * i))
        rh_rev = rh_rev | (h2 << (2 * (KMER_LEN - 1 - i)))
    hsum_m = jnp.where(cmask, hsum, 255)
    min_h = jnp.min(hsum_m, axis=1, keepdims=True)
    sel = cmask & (hsum <= jnp.minimum(min_h * 2, 7))
    use_fwd = jnp.logical_not(jnp.logical_xor(q_frames < 3, kmer_format == 2))
    rh = jnp.where(use_fwd[:, None], rh_fwd, rh_rev)
    z = jnp.int32(0)
    return {
        "sel": sel,
        "hamming": jnp.where(sel, hsum, z),
        "rh": jnp.where(sel, rh, z),
        "taxid": jnp.where(sel, db_taxids[idx], z),
        "species": jnp.where(sel, db_species[idx], z),
        "dna_enc": jnp.where(sel, t_dna, z),
    }


def make_sharded_classify_step(mesh: Mesh, cap: int = 16, kmer_format: int = 2,
                               syncmer: bool = False, smer_len: int = 5):
    """Build a jitted multi-chip classify step over `mesh`.

    Inputs (global shapes):
      reads   uint8 [B, L]      sharded P('dp', None)
      lengths int32 [B]         sharded P('dp')
      dbv     uint64 [n_db, S]  sharded P('db', None)
      dbt/dbs int32  [n_db, S]  sharded P('db', None)
      dbc     int32  [n_db]     sharded P('db')
    Output: complete match tensors, sharded P('dp') on the read axis and
    replicated over 'db'.
    """

    def step(reads, lengths, dbv, dbt, dbs, dbc):
        # local block shapes: reads [B/dp, L]; dbv [1, S]
        kmers, pos, valid = encode_jax.extract_batch(reads, lengths,
                                                     syncmer=syncmer, smer_len=smer_len)
        b = reads.shape[0]
        sids = jnp.arange(1, b + 1, dtype=jnp.int32)
        qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
        out = _probe_local(qk, qf, qv, dbv[0], dbc[0], dbt[0], dbs[0], cap, kmer_format)
        # exclusive ownership -> psum over 'db' merges shard results
        merged = {k: jax.lax.psum(v.astype(jnp.int32), "db") for k, v in out.items()}
        merged["pos"] = qp
        merged["frame"] = qf
        merged["seq_id"] = qs
        # sel counts are per-dp-shard; sum over 'dp' for the global count
        merged["match_count"] = jax.lax.psum(jnp.sum(merged["sel"] > 0), "dp")
        return merged

    shard_map = jax.shard_map

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P("dp", None), P("dp"), P("db", None), P("db", None), P("db", None), P("db")),
            out_specs={
                "sel": P("dp", None), "hamming": P("dp", None), "rh": P("dp", None),
                "taxid": P("dp", None), "species": P("dp", None), "dna_enc": P("dp", None),
                "pos": P("dp"), "frame": P("dp"), "seq_id": P("dp"),
                "match_count": P(),
            },
            check_vma=False,
        )
    )


def make_sharded_fused_dp_step(mesh: Mesh, cap: int = 16,
                               kmer_format: int = 2,
                               syncmer: bool = False, smer_len: int = 5,
                               min_cons: int = 4, min_cons_euk: int = 9,
                               path_block: int = 16, path_width: int = 4096):
    """Multi-chip version of models/flagship.fused_step_dp.

    Same (dp, db) mesh layout as make_sharded_classify_step, but the
    FULL single-chip pipeline runs after the collective: each db shard
    probes its metamer range, a psum over 'db' merges the exclusive
    per-shard candidate tensors, then every dp shard runs the candidate
    sort, the consecutive-match path DP and the blocked path compaction
    on its own reads — the only cross-device traffic is the one
    candidate-merge reduction (SURVEY.md section 5.8).

    Output (per dp shard, stacked on axis 0): path columns
    [dp, 7, path_width] in pack_paths layout plus per-shard path counts
    [dp]; g ids are LOCAL to the shard (host adds B_local*6*shard).
    """
    from ..ops import dp_jax

    def step(reads, lengths, dbv, dbt, dbs, dbc):
        kmers, pos, valid = encode_jax.extract_batch(
            reads, lengths, syncmer=syncmer, smer_len=smer_len,
            kmer_format=kmer_format)
        b, F, W = kmers.shape
        sids = jnp.arange(1, b + 1, dtype=jnp.int32)
        qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
        out = _probe_local(qk, qf, qv, dbv[0], dbc[0], dbt[0], dbs[0],
                           cap, kmer_format)
        merged = {k: jax.lax.psum(v.astype(jnp.int32), "db")
                  for k, v in out.items()}

        resh = lambda a: a.T.reshape(cap, b * F, W)
        fields = {
            "sel": resh(merged["sel"]) > 0,
            "species": resh(merged["species"]),
            "dna": resh(merged["dna_enc"]),
            "rh": resh(merged["rh"]),
            "ham": resh(merged["hamming"]),
            "pos": jnp.broadcast_to(qp.reshape(1, b * F, W), (cap, b * F, W)),
        }
        pos_b = fields.pop("pos")   # constant along cap: skip the permute
        fields = dp_jax.sort_candidates(fields, fields["sel"], fields["ham"],
                                        fields["dna"])
        fields["pos"] = pos_b
        # euk-ness rides in species bit 30 when the caller passes sp_euk
        # (same convention as the single-chip fused step)
        md = jnp.where((fields["species"] >> 30) & 1 != 0,
                       jnp.int32(min_cons_euk), jnp.int32(min_cons))
        max_shift = (8 - smer_len) if syncmer else 1
        dp = dp_jax.path_dp(fields["sel"], fields["species"], fields["dna"],
                            fields["rh"], fields["ham"], fields["pos"], md,
                            max_shift=max_shift, kmer_format=kmer_format)
        cols, psel, _ = dp_jax.pack_paths_blocked(dp, path_block)
        packed, count = dp_jax.compact_columns(cols, psel,
                                               out_width=path_width)
        return packed[None], count[None]

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P("dp", None), P("dp"), P("db", None), P("db", None),
                      P("db", None), P("db")),
            out_specs=(P("dp", None, None), P("dp")),
            check_vma=False,
        )
    )


def shard_quad_index(quad: np.ndarray, n_shards: int, wide: bool = False):
    """Cut a pack_db_quad [M, 4] uint32 array into n_shards contiguous
    metamer ranges at AA-part boundaries, plus per-shard AA hash tables
    with ONE uniform geometry (row count / chain length are static jit
    args, so every shard must share them).

    Pad rows carry an all-ones value (AA part 0xFF_FFFFFFFF) which no
    real metamer can equal (AA symbols are 5-bit codes < 21, so an
    all-ones 40-bit AA part never occurs) — a padded row can never pass
    the probe's AA-equality mask.  Hash lookups of foreign queries miss
    and resolve to lo = S, failing the pos < S test.

    wide=True: each shard is packed into 512-byte rows (pack_db_rows32
    layout, 32 entries/row) with 42-slot 512-byte hash rows — the same
    ~3x-faster probe geometry the single-chip resident path uses
    (docs/PERF_NOTES.md: XLA row-gather cost is per-index and drops ~6x
    at the full 128-lane row).  Run starts are UNALIGNED since r5 (the
    wide window select handles any in-row offset) — 16 B/kmer exactly.
    match_kmers_quad detects the [*, 128] shape and takes the wide
    window path with db_m defaulted to the padded row space.

    Returns (quads [n, S, 4] u32 — or [n, R32, 128] when wide,
    hash_tables [n, R, 16|128] uint32, log2_rows, chain,
    counts int32 [n]).
    """
    from ..ops.match_jax import build_aa_hash, pack_db_rows32

    M = quad.shape[0]
    v = quad[:, 0].astype(np.uint64) | (quad[:, 1].astype(np.uint64) << 32)
    aa = v >> np.uint64(24)
    bounds = [0]
    for k in range(1, n_shards):
        t = k * M // n_shards
        while 0 < t < M and aa[t] == aa[t - 1]:
            t += 1
        bounds.append(min(t, M))
    bounds.append(M)
    shard_values = []
    hash_kw: dict = {}
    if wide:
        hash_kw = dict(slots=42, row_u32=128)
        starts_list = [None] * n_shards
        counts = np.diff(bounds).astype(np.int32)
        S = max(int(counts.max(initial=0)), 1)
        rows = [pack_db_rows32(quad[bounds[i]:bounds[i + 1]],
                               pad_entries=S - (bounds[i + 1] - bounds[i])
                               + 256)
                for i in range(n_shards)]
        for i in range(n_shards):
            shard_values.append(v[bounds[i]:bounds[i + 1]])
        quads = np.stack(rows) if rows else \
            np.zeros((0, (S + 287) // 32, 128), np.uint32)
        builds = [build_aa_hash(sv, **hash_kw) for sv in shard_values]
    else:
        starts_list = [None] * n_shards
        counts = np.diff(bounds).astype(np.int32)
        S = max(int(counts.max()) if M else 1, 1)
        quads = np.full((n_shards, S, 4), np.uint32(0xFFFFFFFF),
                        dtype=np.uint32)
        for i in range(n_shards):
            lo, hi = bounds[i], bounds[i + 1]
            quads[i, : hi - lo] = quad[lo:hi]
            shard_values.append(v[lo:hi])
        builds = [build_aa_hash(sv) for sv in shard_values]
    # uniform hash geometry: size every table for the largest shard and
    # rebuild until all shards agree on one row count (min_log2_rows only
    # sets the start point — a pathological collision cluster can still
    # double past it, in which case every other shard re-pads up).  The
    # static chain is the max observed chain; extra chain gathers on
    # smaller shards are harmless (they just re-miss).
    log2 = max((b[1] for b in builds), default=8)
    while True:
        builds = [b if b[1] == log2
                  else build_aa_hash(sv, min_log2_rows=log2,
                                     starts_override=st, **hash_kw)
                  for sv, st, b in zip(shard_values, starts_list, builds)]
        got = max((b[1] for b in builds), default=log2)
        if got == log2:
            break
        log2 = got
    chain = max((b[2] for b in builds), default=1)
    ht = (np.stack([b[0] for b in builds]) if builds
          else np.zeros((n_shards, 256, hash_kw.get("row_u32", 16)),
                        np.uint32))
    return quads, ht, log2, chain, counts


def make_sharded_fused_dp_prod(mesh: Mesh, *, cap: int, kmer_format: int = 2,
                               syncmer: bool = False, smer_len: int = 5,
                               paired: bool = False,
                               min_cons: int = 4, min_cons_euk: int = 9,
                               path_width: int = 4096, win_frac: int = 256,
                               path_block: int = 16,
                               hash_log2_rows: int = 8, hash_chain: int = 1,
                               has_ra: bool = False,
                               dp_pallas: bool = False,
                               pallas_interpret: bool = False):
    """PRODUCTION multi-chip classify step: the complete single-chip
    fused pipeline (models/flagship._fused_core — window compaction,
    paired-end, hash probe, candidate sort, path DP, blocked packing,
    static-width compaction, overflow stats) with the probe stage
    replaced by a shard-local hash probe + one psum candidate merge over
    the 'db' mesh axis.  Everything after the collective runs dp-local,
    so per-batch cross-device traffic is exactly one [cap+1, N] int32
    reduction (SURVEY.md section 5.8).

    Inputs (global shapes):
      r1/r2 uint8 [B, L]     P('dp', None)   (+ ra1/ra2 when has_ra)
      j1/j2 int32 [B]        P('dp')
      quads uint32 [n,S,4]   P('db', None, None)
      hts   uint32 [n,R,16]  P('db', None, None)
    Outputs:
      packed_hdr int32 [dp, 7|5, 1+path_width]  (header col 0 = stats)
      resident tuple for the redundancy phase, each leading-axis 'dp'
    """
    from ..models import flagship
    from ..ops import match_jax

    def step(r1, j1, r2, j2, quads, hts, ra1=None, ra2=None):
        def probe_fn(qk, qf, qv):
            out = match_jax.match_kmers_quad(
                qk, qf, qv, quads[0], cap=cap, kmer_format=kmer_format,
                hash_table=hts[0], hash_log2_rows=hash_log2_rows,
                hash_chain=hash_chain)
            sel = out["sel"]
            z = {}
            for k, a in out.items():
                if k == "sel":
                    z[k] = sel.astype(jnp.int32)
                elif k == "overflow":
                    z[k] = a
                else:
                    # zero non-selected lanes: ownership is exclusive
                    # (AA runs never straddle shards), so psum == merge
                    z[k] = jnp.where(sel, a, jnp.zeros((), a.dtype))
            m = {k: jax.lax.psum(a, "db") for k, a in z.items()}
            m["sel"] = m["sel"] > 0
            return m

        stats, paths_packed, resident = flagship._fused_core(
            r1, j1, r2, j2, None, min_cons=min_cons,
            min_cons_euk=min_cons_euk, cap=cap, kmer_format=kmer_format,
            syncmer=syncmer, smer_len=smer_len, paired=paired,
            path_width=path_width, win_frac=win_frac, path_block=path_block,
            ra1=ra1, ra2=ra2, dp_pallas=dp_pallas,
            pallas_interpret=pallas_interpret, probe_fn=probe_fn)
        # header stats: overflow rows carry GLOBAL (psum over 'dp')
        # values so every host sees the same numbers and the per-batch
        # retry protocol stays lockstep across processes (a divergent
        # static-arg retry would deadlock the collectives).  Row 1 stays
        # the LOCAL path count (each shard's decode width); row 4 is the
        # global max path count for the width-retry decision.
        g_over = jax.lax.psum(stats[0], "dp")
        g_win = jax.lax.psum(stats[2], "dp")
        g_blk = jax.lax.psum(stats[3], "dp")
        g_wmax = jax.lax.pmax(stats[1], "dp")
        hdr = jnp.zeros((paths_packed.shape[0], 1), jnp.int32)
        hdr = hdr.at[:5, 0].set(
            jnp.stack([g_over, stats[1], g_win, g_blk, g_wmax]))
        packed_hdr = jnp.concatenate([hdr, paths_packed], axis=1)
        sel, species, ham, ef, q_pos, q_sids = resident
        return (packed_hdr[None], sel[None], species[None], ham[None],
                ef[None], q_pos[None], q_sids[None])

    dpN = P("dp", None)
    in_specs = [dpN, P("dp"), dpN, P("dp"),
                P("db", None, None), P("db", None, None)]
    if has_ra:
        in_specs += [dpN, dpN]
    out_specs = (P("dp", None, None),) * 5 + (P("dp", None),) * 2
    return jax.jit(
        jax.shard_map(step, mesh=mesh, in_specs=tuple(in_specs),
                      out_specs=out_specs, check_vma=False)
    )


def make_sharded_redundancy(mesh: Mesh, *, dna_shift: int, n_quot: int,
                            part_w: tuple):
    """Phase-2 redundancy filter over the 'dp' axis: each dp shard runs
    the single-chip _redundancy_core on its resident match tensors with
    its slice of the per-read best species.  Taxonomy tables (euler,
    depth, lift) are replicated."""
    from ..models.flagship import _redundancy_core

    def step(sel, species, ham, ef, q_pos, q_sids, best_sp,
             euler, depth, lift):
        packed2 = _redundancy_core(
            sel[0] > 0, species[0], ham[0], ef[0], q_pos[0], q_sids[0],
            best_sp[0], euler, depth, lift,
            dna_shift=dna_shift, n_quot=n_quot, part_w=part_w)
        return packed2[None]

    dp3 = P("dp", None, None)
    return jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(dp3, dp3, dp3, dp3, P("dp", None), P("dp", None),
                      P("dp", None), P(None), P(None), P(None, None)),
            out_specs=dp3, check_vma=False)
    )


def device_put_sharded_index(mesh, pv, pt, ps, counts):
    sh = NamedSharding(mesh, P("db", None))
    sh1 = NamedSharding(mesh, P("db"))
    return (
        jax.device_put(pv, sh),
        jax.device_put(pt, sh),
        jax.device_put(ps, sh),
        jax.device_put(counts, sh1),
    )


def make_sharded_stream_steps(mesh: Mesh, *, cap: int, kmer_format: int,
                              syncmer: bool, smer_len: int, paired: bool,
                              min_cons: int, min_cons_euk: int,
                              path_width: int, win_frac: int,
                              path_block: int, compact5: bool,
                              shapes: tuple,
                              hash_log2_rows: int, hash_chain: int,
                              has_ra: bool):
    """mesh x DB-streaming: the three streaming stages (extract / probe
    one range / finish) shard_map'd over the (dp, db) mesh, so a DB
    bigger than the aggregate HBM of the 'db' axis classifies on a mesh.

    Each range pass holds ONE range in HBM, itself cut into n_db
    AA-boundary shards; the probe runs shard-local and candidate merges
    ride one psum over 'db' exactly like the resident mesh step
    (make_sharded_fused_dp_prod).  Accumulators are sharded over 'dp'
    on their N axis and replicated over 'db'; candidate exclusivity
    (AA runs never straddle range or shard cuts) makes masked
    accumulation across passes equal to a single-pass probe.

    Reference analog: per-thread DB-region streams under --max-ram
    (KmerMatcher.cpp:166-198, QueryIndexer.cpp:30-147)."""
    from ..models import flagship
    from ..ops import match_jax

    dpN = P("dp", None)

    # ---- stage 1: extract (dp-local; db ranks replicate) ----
    def ex_step(r1, j1, r2, j2, ra1=None, ra2=None):
        qk, qp, qf, qs, qv, _sh, win_over = flagship._extract_all(
            r1, j1, r2, j2, ra1, ra2, syncmer=syncmer, smer_len=smer_len,
            kmer_format=kmer_format, win_frac=win_frac, paired=paired)
        return qk, qp, qf, qs, qv, win_over[None]

    ex_in = [dpN, P("dp"), dpN, P("dp")] + ([dpN, dpN] if has_ra else [])
    extract = jax.jit(jax.shard_map(
        ex_step, mesh=mesh, in_specs=tuple(ex_in),
        out_specs=(P("dp"),) * 5 + (P("dp"),), check_vma=False))

    # ---- stage 2: probe one range (db-local probe + psum merge) ----
    def pr_step(qk, qf, qv, quad_r, hts_r,
                sel, ham, rh, tax, sp, dna, over):
        out = match_jax.match_kmers_quad(
            qk, qf, qv, quad_r[0], cap=cap, kmer_format=kmer_format,
            hash_table=hts_r[0], hash_log2_rows=hash_log2_rows,
            hash_chain=hash_chain)
        s = out["sel"]
        z = {}
        for k, a in out.items():
            if k == "sel":
                z[k] = s.astype(jnp.int32)
            elif k == "overflow":
                z[k] = a
            else:
                z[k] = jnp.where(s, a, jnp.zeros((), a.dtype))
        m = {k: jax.lax.psum(a, "db") for k, a in z.items()}
        return (sel | (m["sel"] > 0), ham + m["hamming"], rh + m["rh"],
                tax + m["taxid"], sp + m["species"], dna + m["dna_enc"],
                over + m["overflow"])

    accN = P(None, "dp")
    pr_in = ((P("dp"),) * 3 + (P("db", None, None),) * 2
             + (accN,) * 6 + (P(),))
    probe = jax.jit(jax.shard_map(
        pr_step, mesh=mesh, in_specs=pr_in,
        out_specs=(accN,) * 6 + (P(),), check_vma=False),
        donate_argnums=(5, 6, 7, 8, 9, 10, 11))

    # ---- stage 3: finish (dp-local DP + lockstep stats header) ----
    def fin_step(sel, ham, rh, tax, sp, dna, over, qp, qs, win_over):
        out = {"sel": sel > 0, "hamming": ham, "rh": rh, "taxid": tax,
               "species": sp, "dna_enc": dna, "overflow": over}
        stats, paths_packed, resident = flagship._dp_from_probe(
            out, qp, qs, shapes, win_over[0], cap=cap,
            kmer_format=kmer_format, syncmer=syncmer, smer_len=smer_len,
            min_cons=min_cons, min_cons_euk=min_cons_euk,
            path_width=path_width, path_block=path_block,
            win_frac=win_frac, compact5=compact5)
        # header rows mirror make_sharded_fused_dp_prod: global (psum'd
        # over 'dp') overflow stats keep the per-batch retry protocol
        # lockstep across processes; row 1 stays the LOCAL path count,
        # row 4 the global max for the width-retry decision
        g_over = jax.lax.psum(stats[0], "dp")
        g_win = jax.lax.psum(stats[2], "dp")
        g_blk = jax.lax.psum(stats[3], "dp")
        g_wmax = jax.lax.pmax(stats[1], "dp")
        hdr = jnp.zeros((paths_packed.shape[0], 1), jnp.int32)
        hdr = hdr.at[:5, 0].set(
            jnp.stack([g_over, stats[1], g_win, g_blk, g_wmax]))
        packed_hdr = jnp.concatenate([hdr, paths_packed], axis=1)
        r_sel, r_sp, r_ham, r_ef, r_qp, r_qs = resident
        return (packed_hdr[None], r_sel.astype(jnp.int32)[None],
                r_sp[None], r_ham[None], r_ef[None], r_qp[None],
                r_qs[None])

    fin_in = (accN,) * 6 + (P(), P("dp"), P("dp"), P("dp"))
    fin_out = (P("dp", None, None),) * 5 + (P("dp", None),) * 2
    finish = jax.jit(jax.shard_map(
        fin_step, mesh=mesh, in_specs=fin_in, out_specs=fin_out,
        check_vma=False))
    return extract, probe, finish
