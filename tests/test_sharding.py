"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_shard_index_aa_boundaries():
    from metabuli_work_tpu.parallel.sharding import shard_index

    rng = np.random.default_rng(4)
    aa = np.sort(rng.integers(0, 1000, 5000).astype(np.uint64))
    values = np.unique((aa << np.uint64(24)) | rng.integers(0, 2**24, 5000).astype(np.uint64))
    taxids = np.ones(len(values), np.int32)
    species = np.ones(len(values), np.int32)
    pv, pt, ps, counts = shard_index(values, taxids, species, 4)
    assert counts.sum() == len(values)
    # no AA part spans two shards
    edges = []
    for i in range(4):
        vals = pv[i, :counts[i]]
        edges.append((vals[0] >> np.uint64(24), vals[-1] >> np.uint64(24)))
    for i in range(3):
        assert edges[i][1] < edges[i + 1][0]


def test_sharded_step_equals_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from metabuli_work_tpu.models.flagship import classify_step
    from metabuli_work_tpu.parallel.sharding import (
        device_put_sharded_index,
        make_mesh,
        make_sharded_classify_step,
        shard_index,
    )

    # guaranteed matches: index a genome and derive the reads from it
    from metabuli_work_tpu.index.builder import IndexBuilder
    from tests.tests_helpers_tax import make_flat_tax

    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 4000))
    builder = IndexBuilder(make_flat_tax(), syncmer=False, mask_mode=0)
    builder.add_sequence(genome, 4)
    index = builder.finalize()
    values = index.values
    taxids = index.taxids.astype(np.int32)
    species = index.species.astype(np.int32)

    B, L = 16, 96
    reads = np.zeros((B, L), dtype=np.uint8)
    for i in range(B):
        s = int(rng.integers(0, len(genome) - L))
        reads[i] = np.frombuffer(genome[s:s + L].encode(), np.uint8)
    lengths = np.full(B, L, np.int32)

    # single-device reference result
    out1 = classify_step(jnp.asarray(reads), jnp.asarray(lengths),
                         jnp.asarray(values), jnp.asarray(taxids),
                         jnp.asarray(species), cap=8)
    sel1 = np.asarray(out1["sel"])
    tax1 = np.asarray(out1["taxid"])
    assert sel1.sum() > 0, "test needs a non-empty match set"

    mesh = make_mesh(8)
    db_ax = mesh.shape["db"]
    pv, pt, ps, counts = shard_index(values, taxids, species, db_ax)
    dbv, dbt, dbs, dbc = device_put_sharded_index(mesh, pv, pt, ps, counts)
    r = jax.device_put(jnp.asarray(reads), NamedSharding(mesh, P("dp", None)))
    l = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P("dp")))
    step = make_sharded_classify_step(mesh, cap=8)
    out8 = step(r, l, dbv, dbt, dbs, dbc)

    sel8 = np.asarray(out8["sel"]) > 0
    assert np.array_equal(sel8, sel1)
    assert np.array_equal(np.asarray(out8["taxid"])[sel8], tax1[sel1])
    assert int(np.asarray(out8["match_count"])) == int(sel1.sum())


def test_sharded_fused_dp_equals_single_device():
    """Full-pipeline multi-chip step (probe + psum merge + candidate sort
    + path DP + blocked compaction) emits the same path set as the
    single-chip path-DP flow on an 8-device CPU mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from metabuli_work_tpu.models.flagship import synthetic_db
    from metabuli_work_tpu.ops import dp_jax, encode_jax, match_jax
    from metabuli_work_tpu.parallel.sharding import (
        device_put_sharded_index,
        make_mesh,
        make_sharded_fused_dp_step,
        shard_index,
    )

    rng = np.random.default_rng(11)
    # build reads FROM a genome and index that genome so real
    # consecutive-match paths exist
    genome = "".join(rng.choice(list("ACGT"), 4000))
    from metabuli_work_tpu.index.builder import IndexBuilder
    from tests.tests_helpers_tax import make_flat_tax

    tax = make_flat_tax()
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    builder.add_sequence(genome, 4)
    index = builder.finalize()
    values, taxids, species = index.values, index.taxids, index.species

    B, L = 16, 96
    reads = np.zeros((B, L), dtype=np.uint8)
    for i in range(B):
        s = int(rng.integers(0, len(genome) - L))
        reads[i] = np.frombuffer(genome[s:s + L].encode(), np.uint8)
    lengths = np.full(B, L, np.int32)

    cap, pb, pw = 8, 16, 4096

    # single-device reference: same pieces, no mesh
    kmers, pos, valid = encode_jax.extract_batch(jnp.asarray(reads),
                                                 jnp.asarray(lengths))
    F, W = kmers.shape[1], kmers.shape[2]
    sids = jnp.arange(1, B + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
    out = match_jax.match_kmers(qk, qf, qv, jnp.asarray(values),
                                jnp.asarray(taxids.astype(np.int32)),
                                jnp.asarray(species.astype(np.int32)),
                                cap=cap)
    resh = lambda a: np.asarray(a).T.reshape(cap, B * F, W)
    fields = {
        "sel": jnp.asarray(resh(out["sel"])),
        "species": jnp.asarray(resh(out["species"])),
        "dna": jnp.asarray(resh(out["dna_enc"])),
        "rh": jnp.asarray(resh(out["rh"])),
        "ham": jnp.asarray(resh(out["hamming"])),
        "pos": jnp.broadcast_to(qp.reshape(1, B * F, W), (cap, B * F, W)),
    }
    fields = dp_jax.sort_candidates(fields, fields["sel"], fields["ham"],
                                    fields["dna"])
    md = jnp.full(fields["sel"].shape, jnp.int32(4))
    dp = dp_jax.path_dp(fields["sel"], fields["species"], fields["dna"],
                        fields["rh"], fields["ham"], fields["pos"], md,
                        max_shift=1, kmer_format=2)
    cols1, psel1, _ = dp_jax.pack_paths_blocked(dp, pb)
    ref_rows = {tuple(int(x) for x in col)
                for col in np.asarray(cols1).T[np.asarray(psel1)]}
    assert ref_rows, "test needs a non-empty path set"

    mesh = make_mesh(8)
    db_ax = mesh.shape["db"]
    dp_ax = mesh.shape["dp"]
    pv, pt, ps, counts = shard_index(values, taxids.astype(np.int32),
                                     species.astype(np.int32), db_ax)
    dbv, dbt, dbs, dbc = device_put_sharded_index(mesh, pv, pt, ps, counts)
    r = jax.device_put(jnp.asarray(reads), NamedSharding(mesh, P("dp", None)))
    l = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P("dp")))
    step = make_sharded_fused_dp_step(mesh, cap=cap, path_block=pb,
                                      path_width=pw)
    packed, count = step(r, l, dbv, dbt, dbs, dbc)
    packed = np.asarray(packed)
    count = np.asarray(count)

    got_rows = set()
    b_local = B // dp_ax
    for s in range(dp_ax):
        n = int(count[s])
        rows = packed[s][:, :n].T
        for row in rows:
            row = [int(x) for x in row]
            row[0] += s * b_local * 6      # g ids are shard-local
            got_rows.add(tuple(row))
    assert got_rows == ref_rows


def test_scaling_runs():
    from metabuli_work_tpu.parallel.scaling import measure_scaling

    res = measure_scaling(device_counts=(1, 4), batch=8, length=96,
                          n_kmers=4096, iters=1)
    assert set(res.keys()) == {1, 4}
    assert all(r > 0 for r in res.values())
