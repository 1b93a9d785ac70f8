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
        fields = dp_jax.sort_candidates(fields, fields["sel"], fields["ham"],
                                        fields["dna"])
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


def device_put_sharded_index(mesh, pv, pt, ps, counts):
    sh = NamedSharding(mesh, P("db", None))
    sh1 = NamedSharding(mesh, P("db"))
    return (
        jax.device_put(pv, sh),
        jax.device_put(pt, sh),
        jax.device_put(ps, sh),
        jax.device_put(counts, sh1),
    )
