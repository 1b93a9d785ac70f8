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

    from metabuli_work_tpu.models.flagship import classify_step, synthetic_db, synthetic_reads
    from metabuli_work_tpu.parallel.sharding import (
        device_put_sharded_index,
        make_mesh,
        make_sharded_classify_step,
        shard_index,
    )

    values, taxids, species = synthetic_db(n_kmers=2048, seed=5)
    # inject guaranteed matches: derive some query kmers from db values
    reads, lengths = synthetic_reads(batch=16, length=96, seed=6)

    # single-device reference result
    out1 = classify_step(jnp.asarray(reads), jnp.asarray(lengths),
                         jnp.asarray(values), jnp.asarray(taxids),
                         jnp.asarray(species), cap=8)
    sel1 = np.asarray(out1["sel"])
    tax1 = np.asarray(out1["taxid"])

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


def test_scaling_runs():
    from metabuli_work_tpu.parallel.scaling import measure_scaling

    res = measure_scaling(device_counts=(1, 4), batch=8, length=96,
                          n_kmers=4096, iters=1)
    assert set(res.keys()) == {1, 4}
    assert all(r > 0 for r in res.values())
