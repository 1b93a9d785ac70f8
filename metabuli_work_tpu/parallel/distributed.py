"""Multi-host distributed runtime (SURVEY.md section 5.8).

The reference is a single-host tool (its MPI build flag is vestigial —
no Metabuli command communicates, src/version/Version.cpp:1-5); scaling
past one host is a new capability of this framework:

  * `init_distributed` — `jax.distributed.initialize` entry point; every
    process runs the same program (SPMD).
  * `make_global_mesh` — a (dp, db) mesh with 'dp' across processes and
    'db' within: each host feeds/scores its own read rows (host IO and
    per-read scoring never cross DCN) while the index shards live on the
    host's local chips and the candidate-merge psum rides ICI.
  * Classifier integration: pass the global mesh to
    classify.pipeline.Classifier — `_fetch_rows` gives each process only
    its addressable dp rows, the overflow stats are psum'd over 'dp' on
    device so every process takes identical retry decisions, and
    classify_file returns the process-local reads' results.

CPU testing recipe (tests/test_distributed.py): N subprocesses, each
`--xla_force_host_platform_device_count=K`, coordinator on localhost —
collectives run over Gloo; results merged and compared against a
single-process run.
"""

import os

import numpy as np


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize the JAX distributed runtime.

    Arguments default to the standard env vars (JAX reads
    COORDINATOR_ADDRESS etc. on TPU pods automatically; explicit args
    are for CPU tests and manual launches).  Safe to call once per
    process, before any other JAX API touches devices.
    """
    import jax

    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)
    return jax.process_index(), jax.process_count()


def make_global_mesh(dp_per_process: int = 1):
    """(dp, db) mesh over ALL processes' devices.

    'dp' rows = processes (x dp_per_process rows within each process
    when a host drives several read shards); 'db' = the remaining local
    devices, so the index-shard psum stays on intra-host links.
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    dp_local = max(1, min(dp_per_process, per))
    while per % dp_local:
        dp_local -= 1
    arr = np.array(devs).reshape(n_proc * dp_local, per // dp_local)
    return Mesh(arr, ("dp", "db"))


def process_local_rows(mesh) -> list:
    """Global 'dp' row indices whose devices belong to this process."""
    import jax

    pid = jax.process_index()
    rows = []
    devs = np.asarray(mesh.devices)
    for r in range(devs.shape[0]):
        if any(d.process_index == pid for d in devs[r]):
            rows.append(r)
    return rows


def merge_process_results(local_records: dict, out_path: str):
    """Write this process's per-read records as JSON (one file per
    process); the launcher merges the shards — keeps result collection
    off the collective path."""
    import json

    with open(out_path, "w") as f:
        json.dump(local_records, f)
