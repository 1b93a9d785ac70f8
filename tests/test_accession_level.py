"""Accession-level classification (VERDICT r1 item 10).

--accession-level 1 at build labels k-mers per accession (fresh taxonomy
nodes under each sequence's taxon, reference IndexCreator.cpp:196-200);
classify's lower-rank BFS then descends to individual accessions
(Taxonomer.cpp:252-313).
"""

import os

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database

rng = np.random.default_rng(71)


@pytest.fixture(scope="module")
def acc_db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("accdb")
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (10, 1, "genus"), (100, 10, "species")]
    with open(d / "nodes.dmp", "w") as f:
        for tid, par, rank in nodes:
            f.write(f"{tid}\t|\t{par}\t|\t{rank}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for tid, _, _ in nodes:
            f.write(f"{tid}\t|\tn{tid}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    # two DISTINCT genomes under the SAME species -> only accession-level
    # labels can tell them apart
    genomes = {"ACC1.1": "".join(rng.choice(list("ACGT"), 8000)),
               "ACC2.1": "".join(rng.choice(list("ACGT"), 8000))}
    fasta = tmp / "g.fna"
    with open(fasta, "w") as f:
        for acc, seq in genomes.items():
            f.write(f">{acc}\n{seq}\n")
    (tmp / "fastas.txt").write_text(str(fasta) + "\n")
    with open(tmp / "acc2taxid.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        f.write("ACC1\tACC1.1\t100\t0\nACC2\tACC2.1\t100\t0\n")
    db_acc = tmp / "db_acc"
    build_database(str(db_acc), str(tmp / "fastas.txt"),
                   str(tmp / "acc2taxid.map"), str(d), mask_mode=0,
                   accession_level=True)
    db_plain = tmp / "db_plain"
    build_database(str(db_plain), str(tmp / "fastas.txt"),
                   str(tmp / "acc2taxid.map"), str(d), mask_mode=0)

    reads = tmp / "reads.fna"
    with open(reads, "w") as f:
        for i in range(12):
            acc = "ACC1.1" if i % 2 == 0 else "ACC2.1"
            g = genomes[acc]
            st = int(rng.integers(0, len(g) - 150))
            f.write(f">r{i}_{acc.split('.')[0]}\n{g[st:st + 150]}\n")
    return tmp, db_acc, db_plain, reads


def test_accession_db_metadata(acc_db):
    tmp, db_acc, db_plain, reads = acc_db
    assert os.path.exists(db_acc / "accession2index")
    lines = open(db_acc / "accession2index").read().splitlines()
    assert len(lines) == 2
    names = {ln.split("\t")[0] for ln in lines}
    assert names == {"ACC1.1", "ACC2.1"}


def test_accession_level_classification(acc_db):
    tmp, db_acc, db_plain, reads = acc_db
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    clf = Classifier(str(db_acc), params)
    # the DB-sticky handshake turns accession mode on from db meta
    assert clf.taxonomer.accession_level == 1
    results = clf.classify_file(str(reads))
    tax = clf.taxonomy
    acc2tid = dict(ln.split("\t")
                   for ln in open(db_acc / "accession2index")
                   .read().splitlines())
    hits = 0
    for qr in results:
        assert qr.result.is_classified
        want_acc = "ACC1.1" if qr.name.endswith("ACC1") else "ACC2.1"
        got = tax.orig_of(qr.result.classification)
        if got == int(acc2tid[want_acc]):
            hits += 1
        # never the WRONG accession
        other = "ACC2.1" if want_acc == "ACC1.1" else "ACC1.1"
        assert got != int(acc2tid[other])
    assert hits >= 10, f"only {hits}/12 reads reached their accession"


def test_plain_db_stays_at_species(acc_db):
    tmp, db_acc, db_plain, reads = acc_db
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    clf = Classifier(str(db_plain), params)
    assert clf.taxonomer.accession_level == 0
    results = clf.classify_file(str(reads))
    tax = clf.taxonomy
    for qr in results:
        assert qr.result.is_classified
        assert tax.orig_of(qr.result.classification) == 100


def test_accession_suppression_mode2(acc_db):
    """--accession-level 2 on an accession DB suppresses the descent."""
    tmp, db_acc, db_plain, reads = acc_db
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8, accession_level=2)
    clf = Classifier(str(db_acc), params)
    assert clf.taxonomer.accession_level == 2
    results = clf.classify_file(str(reads))
    tax = clf.taxonomy
    for qr in results:
        assert qr.result.is_classified
        assert tax.orig_of(qr.result.classification) == 100
