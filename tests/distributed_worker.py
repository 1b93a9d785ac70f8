"""Subprocess worker for the 2-process CPU distributed test.

Usage: python distributed_worker.py <port> <pid> <nproc> <db_dir> <reads>
       <out_json> <local_dev_count>

Each process initializes jax.distributed against the shared coordinator,
builds the (dp=processes, db=local devices) global mesh, classifies the
SAME reads file through the production mesh path, and dumps its OWN read
shard's results as JSON.  The launcher merges the shards and compares
against a single-process run.
"""

import json
import os
import sys


def main():
    port, pid, nproc, db_dir, reads, out_json, ndev = sys.argv[1:8]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from metabuli_work_tpu.parallel.distributed import (
        init_distributed,
        make_global_mesh,
    )

    init_distributed(f"localhost:{port}", int(nproc), int(pid))
    assert jax.process_count() == int(nproc)
    mesh = make_global_mesh()

    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    clf = Classifier(db_dir, params, mesh=mesh)
    assert clf.mesh is not None
    results = clf.classify_file(reads)

    import numpy as np

    records = {}
    for qr in results:
        r = qr.result
        records[qr.name] = [bool(r.is_classified),
                            int(r.classification if r.is_classified else 0),
                            float(np.float32(r.score))]
    with open(out_json, "w") as f:
        json.dump(records, f)
    print(f"proc {pid}: {len(records)} reads scored", flush=True)


if __name__ == "__main__":
    main()
