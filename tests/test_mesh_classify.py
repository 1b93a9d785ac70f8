"""Multi-chip PRODUCTION classify path vs single chip (8-device CPU mesh).

VERDICT r1 item 1: the mesh-sharded fused step must be the production
path — driven by Classifier.classify_file / drive_batches with full
feature parity (hash probe, paired-end, window compaction, overflow
stats, redundancy filter) — and a CPU-mesh test must assert the FINAL
per-read classifications (not just path sets) equal the single-device
run on genome-derived reads.
"""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database

rng = np.random.default_rng(23)


def _random_genome(n):
    return "".join(rng.choice(list("ACGT"), size=n))


def _sample_read(genome, length=150):
    start = int(rng.integers(0, len(genome) - length))
    read = genome[start:start + length]
    if rng.random() < 0.5:
        comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
        read = "".join(comp[c] for c in reversed(read))
    return read


@pytest.fixture(scope="module", params=[False, True],
                ids=["plain", "syncmer"])
def mesh_db(request, tmp_path_factory):
    syncmer = request.param
    tmp = tmp_path_factory.mktemp(f"meshdb_{syncmer}")
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

    genomes = {"MA": (_random_genome(9000), 11),
               "MB": (_random_genome(9000), 21)}
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
                   str(tmp / "acc2taxid.map"), str(d), mask_mode=0,
                   syncmer=syncmer)
    return tmp, db_dir, genomes


def _res_tuple(qr):
    r = qr.result
    cls = r.classification if r.is_classified else 0
    return (qr.name, bool(r.is_classified), int(cls),
            float(np.float32(r.score)))


def test_mesh_classify_equals_single(mesh_db):
    from metabuli_work_tpu.parallel.sharding import make_mesh

    tmp, db_dir, genomes = mesh_db
    reads = tmp / "reads.fna"
    # 22 reads: NOT a multiple of any batch, so both the batch remainder
    # and dp padding paths run
    with open(reads, "w") as f:
        for i in range(18):
            acc = "MA" if i % 2 == 0 else "MB"
            f.write(f">r{i}\n{_sample_read(genomes[acc][0])}\n")
        for i in range(18, 22):
            f.write(f">r{i}\n{_random_genome(150)}\n")

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    single = Classifier(str(db_dir), params).classify_file(str(reads))
    mesh = make_mesh(8)
    clf_m = Classifier(str(db_dir), params, mesh=mesh)
    assert clf_m.mesh is not None
    meshed = clf_m.classify_file(str(reads))

    assert len(single) == len(meshed) == 22
    n_classified = sum(1 for q in single if q.result.is_classified)
    assert n_classified >= 15, "test needs real classifications"
    for qs, qm in zip(single, meshed):
        assert _res_tuple(qs) == _res_tuple(qm)
    # tax_cnt dicts (the redundancy-filter output) must agree too
    for qs, qm in zip(single, meshed):
        assert getattr(qs.result, "tax_cnt", None) == \
            getattr(qm.result, "tax_cnt", None)


def test_mesh_classify_paired_equals_single(mesh_db):
    from metabuli_work_tpu.parallel.sharding import make_mesh

    tmp, db_dir, genomes = mesh_db
    g, tid = genomes["MA"]
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    r1p, r2p = tmp / "m_r1.fq", tmp / "m_r2.fq"
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for i in range(10):
            start = int(rng.integers(0, len(g) - 400))
            frag = g[start:start + 300]
            f1.write(f"@p{i}\n{frag[:150]}\n+\n{'I' * 150}\n")
            rc = "".join(comp[c] for c in reversed(frag[-150:]))
            f2.write(f"@p{i}\n{rc}\n+\n{'I' * 150}\n")

    params = ClassifyParams(seq_mode=2, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    single = Classifier(str(db_dir), params).classify_file(str(r1p), str(r2p))
    clf_m = Classifier(str(db_dir), params, mesh=make_mesh(8))
    meshed = clf_m.classify_file(str(r1p), str(r2p))
    assert len(single) == len(meshed) == 10
    assert sum(1 for q in single if q.result.is_classified) >= 8
    for qs, qm in zip(single, meshed):
        assert _res_tuple(qs) == _res_tuple(qm)
