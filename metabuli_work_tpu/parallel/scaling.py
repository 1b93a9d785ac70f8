"""Multi-device scaling measurement (BASELINE: >=80% linear 1->N).

Runs the sharded classify step over meshes of increasing size and
reports reads/s per configuration.  On real hardware pass the actual
device count; in CI this runs on the virtual CPU mesh
(xla_force_host_platform_device_count).
"""

import time

import numpy as np


def measure_scaling(device_counts=(1, 2, 4, 8), batch=64, length=150,
                    n_kmers=65536, iters=3):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.flagship import synthetic_db, synthetic_reads
    from .sharding import (
        device_put_sharded_index,
        make_mesh,
        make_sharded_classify_step,
        shard_index,
    )

    values, taxids, species = synthetic_db(n_kmers=n_kmers)
    results = {}
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        db_ax = mesh.shape["db"]
        pv, pt, ps, counts = shard_index(values, taxids, species, db_ax)
        dbv, dbt, dbs, dbc = device_put_sharded_index(mesh, pv, pt, ps, counts)
        b = batch * mesh.shape["dp"]
        reads, lengths = synthetic_reads(batch=b, length=length)
        reads = jax.device_put(jnp.asarray(reads), NamedSharding(mesh, P("dp", None)))
        lengths = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P("dp")))
        step = make_sharded_classify_step(mesh, cap=8)
        jax.block_until_ready(step(reads, lengths, dbv, dbt, dbs, dbc))  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(reads, lengths, dbv, dbt, dbs, dbc)
            jax.block_until_ready(out["match_count"])
        dt = (time.perf_counter() - t0) / iters
        results[n] = b / dt
    base = results.get(device_counts[0])
    print("devices\treads_per_s\tspeedup\tefficiency")
    for n, rate in results.items():
        sp = rate / base if base else 0
        print(f"{n}\t{rate:.0f}\t{sp:.2f}\t{sp / (n / device_counts[0]):.2f}")
    return results
