"""Multi-host runtime: 2-process CPU integration test (VERDICT r1 item 2).

Launches two REAL processes, each with 2 virtual CPU devices, connected
through jax.distributed (Gloo collectives).  The global mesh is
(dp=2 processes, db=2 local devices); each process classifies its own
read shard of the same input through the production mesh path.  The
merged per-read classifications must equal a single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database

rng = np.random.default_rng(31)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dist_db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("distdb")
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom"),
             (10, 2, "genus"), (11, 10, "species"),
             (20, 2, "genus"), (21, 20, "species")]
    with open(d / "nodes.dmp", "w") as f:
        for tid, par, rank in nodes:
            f.write(f"{tid}\t|\t{par}\t|\t{rank}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for tid, _, _ in nodes:
            f.write(f"{tid}\t|\tn{tid}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    genomes = {"DA": ("".join(rng.choice(list("ACGT"), 8000)), 11),
               "DB": ("".join(rng.choice(list("ACGT"), 8000)), 21)}
    fasta = tmp / "genomes.fna"
    with open(fasta, "w") as f:
        for acc, (seq, _) in genomes.items():
            f.write(f">{acc}\n{seq}\n")
    (tmp / "fastas.txt").write_text(str(fasta) + "\n")
    with open(tmp / "acc2taxid.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        for acc, (_, tid) in genomes.items():
            f.write(f"{acc}\t{acc}.1\t{tid}\t0\n")
    db_dir = tmp / "db"
    build_database(str(db_dir), str(tmp / "fastas.txt"),
                   str(tmp / "acc2taxid.map"), str(d), mask_mode=0)

    reads = tmp / "reads.fna"
    with open(reads, "w") as f:
        for i in range(20):
            acc = "DA" if i % 2 == 0 else "DB"
            g = genomes[acc][0]
            st = int(rng.integers(0, len(g) - 150))
            f.write(f">r{i}\n{g[st:st + 150]}\n")
        for i in range(20, 24):
            f.write(f">r{i}\n{''.join(rng.choice(list('ACGT'), 150))}\n")
    return tmp, db_dir, reads


def test_two_process_classify_equals_single(dist_db):
    tmp, db_dir, reads = dist_db

    # single-process reference result
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    single = Classifier(str(db_dir), params).classify_file(str(reads))
    want = {}
    for qr in single:
        r = qr.result
        want[qr.name] = [bool(r.is_classified),
                         int(r.classification if r.is_classified else 0),
                         float(np.float32(r.score))]
    assert sum(1 for v in want.values() if v[0]) >= 16

    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    worker = os.path.join(REPO, "tests", "distributed_worker.py")
    procs, outs = [], []
    for pid in range(nproc):
        out_json = str(tmp / f"out_{pid}.json")
        outs.append(out_json)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(nproc),
             str(db_dir), str(reads), out_json, "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    merged = {}
    for out_json in outs:
        part = json.load(open(out_json))
        assert part, "each process must own a non-empty read shard"
        for k, v in part.items():
            assert k not in merged, f"read {k} scored by two processes"
            merged[k] = v
    assert merged == want
