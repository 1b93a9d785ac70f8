"""Tests for filter / classifiedRefiner / updateDB / EM commands."""

import os

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database
from metabuli_work_tpu.index.format import load_index

rng = np.random.default_rng(21)


def rgen(n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cmds")
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom"),
             (10, 2, "genus"), (11, 10, "species"),
             (20, 2, "genus"), (21, 20, "species")]
    names = {1: "root", 2: "Bacteria", 10: "G1", 11: "SpA", 20: "G2", 21: "SpB"}
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t, nm in names.items():
            f.write(f"{t}\t|\t{nm}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")

    gA, gB = rgen(10000), rgen(10000)
    fasta = tmp / "g.fna"
    fasta.write_text(f">A1\n{gA}\n")
    (tmp / "fastas.txt").write_text(str(fasta) + "\n")
    (tmp / "a2t.map").write_text("accession\taccession.version\ttaxid\tgi\nA1\tA1.1\t11\t0\n")
    db = tmp / "db"
    build_database(str(db), str(tmp / "fastas.txt"), str(tmp / "a2t.map"), str(d), mask_mode=0)
    return tmp, db, d, gA, gB


def _reads(path, genome, n, prefix, length=150):
    with open(path, "a") as f:
        for i in range(n):
            s = int(rng.integers(0, len(genome) - length))
            f.write(f">{prefix}{i}\n{genome[s:s+length]}\n")


def test_filter(setup, tmp_path):
    tmp, db, d, gA, gB = setup
    reads = tmp_path / "mix.fna"
    _reads(reads, gA, 10, "contam")   # matches DB -> removed
    _reads(reads, gB, 10, "clean")    # unrelated -> kept
    from metabuli_work_tpu.classify.filter import filter_reads

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5, batch_size=32)
    paths = filter_reads(str(reads), [str(db)], str(tmp_path), "f1", params)
    kept = open(paths[0][0]).read()
    removed = open(paths[0][1]).read()
    assert kept.count(">") == 10 and "clean" in kept and "contam" not in kept
    assert removed.count(">") == 10 and "contam" in removed


def test_refiner(setup, tmp_path):
    tmp, db, d, gA, gB = setup
    cls = tmp_path / "c.tsv"
    cls.write_text(
        "#is_classified\tname\ttaxID\tquery_length\tscore\trank\ttaxID:match_count\n"
        "1\tr0\t11\t150\t0.9\tspecies\t11:3 \n"
        "1\tr1\t11\t150\t0.1\tspecies\t11:1 \n"
        "0\tr2\t0\t150\t0\t-\t-\t\n"
    )
    from metabuli_work_tpu.report.refiner import refine

    out = refine(str(cls), str(db), str(tmp_path / "out.tsv"), min_score=0.5)
    lines = [l for l in open(out).read().splitlines() if not l.startswith("#")]
    assert len(lines) == 1 and lines[0].split("\t")[1] == "r0"

    out2 = refine(str(cls), str(db), str(tmp_path / "out2.tsv"), rank="genus")
    lines = [l for l in open(out2).read().splitlines() if not l.startswith("#")]
    assert all(l.split("\t")[2] == "10" for l in lines)


def test_update_db(setup, tmp_path):
    tmp, db, d, gA, gB = setup
    fasta2 = tmp_path / "g2.fna"
    fasta2.write_text(f">B1\n{gB}\n")
    (tmp_path / "fastas2.txt").write_text(str(fasta2) + "\n")
    (tmp_path / "a2t2.map").write_text("accession\taccession.version\ttaxid\tgi\nB1\tB1.1\t21\t0\n")

    from metabuli_work_tpu.index.update import update_database

    old = load_index(str(db))
    new = update_database(str(db), str(tmp_path / "db2"), str(tmp_path / "fastas2.txt"),
                          str(tmp_path / "a2t2.map"))
    assert new.size > old.size
    # both species present, index sorted & consistent
    sp = set(np.unique(new.species).tolist())
    tax = new.taxonomy
    assert {tax.orig_of(s) for s in sp} == {11, 21}
    assert np.all(np.diff(new.values.astype(np.uint64)) >= np.uint64(0))

    # classification against updated DB finds the new species
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5, batch_size=16)
    clf = Classifier(str(tmp_path / "db2"), params)
    reads = tmp_path / "rb.fna"
    _reads(reads, gB, 8, "rb")
    res = clf.classify_file(str(reads))
    ok = sum(1 for q in res if q.result.is_classified and
             clf.taxonomy.orig_of(clf.taxonomy.species_of(q.result.classification)) == 21)
    assert ok >= 7


def test_update_db_new_taxa(setup, tmp_path):
    tmp, db, d, gA, gB = setup
    (tmp_path / "newtaxa.tsv").write_text("99\t20\tspecies\tSpNew\n")
    fasta2 = tmp_path / "g3.fna"
    fasta2.write_text(f">C1\n{gB}\n")
    (tmp_path / "fastas3.txt").write_text(str(fasta2) + "\n")
    (tmp_path / "a2t3.map").write_text("accession\taccession.version\ttaxid\tgi\nC1\tC1.1\t99\t0\n")

    from metabuli_work_tpu.index.update import update_database

    new = update_database(str(db), str(tmp_path / "db3"), str(tmp_path / "fastas3.txt"),
                          str(tmp_path / "a2t3.map"), new_taxa_path=str(tmp_path / "newtaxa.tsv"))
    tax = new.taxonomy
    i99 = tax.to_internal(99)
    assert i99 != 0 and tax.rank_of(i99) == "species"
    assert int(tax.genus_of(i99)) == tax.to_internal(20)


def test_em_pipeline(setup, tmp_path):
    tmp, db, d, gA, gB = setup
    reads = tmp_path / "em_reads.fna"
    _reads(reads, gA, 12, "em")
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=16, em=True)
    clf = Classifier(str(db), params)
    results = clf.classify_file(str(reads))
    from metabuli_work_tpu.classify.em import run_em

    run_em(results, clf, str(tmp_path), "emjob")
    assert os.path.exists(tmp_path / "emjob_EM_report.tsv")
    assert os.path.exists(tmp_path / "emjob_EM+reclassify_results.tsv")
    recls = open(tmp_path / "emjob_EM+reclassify_results.tsv").read().splitlines()
    cls_rows = [l for l in recls if l.startswith("1\t")]
    assert len(cls_rows) >= 10
    assert all(l.split("\t")[2] == "11" for l in cls_rows)

    # binary MappingRes stream (reference common.h:24-31): 12-byte packed
    # records, qid/species/score^2, round-trips through the loader
    from metabuli_work_tpu.classify.em import (MAPPING_DTYPE,
                                               load_mapping_results)

    mp = tmp_path / "emjob_mapping_results.txt"
    assert os.path.exists(mp)
    assert MAPPING_DTYPE.itemsize == 12
    assert os.path.getsize(mp) % 12 == 0
    qids, sps, scores = load_mapping_results(str(mp))
    assert len(qids) >= 10 and (scores > 0).all()
    exp = [(qi, sp, sc) for qi, qr in enumerate(results)
           for sp, sc in (qr.result.species_scores or ())]
    assert len(qids) == len(exp)
    assert [(int(q), int(s)) for q, s in zip(qids, sps)] \
        == [(q, s) for q, s, _ in exp]

    # sp2uniqKmerCnt text cache in the DB dir (Classifier.cpp:392-437)
    cache = db / "sp2uniqKmerCnt"
    assert cache.exists()
    lines = cache.read_text().splitlines()
    assert lines and all(len(l.split()) == 2 for l in lines)
    from metabuli_work_tpu.classify.em import species_unique_kmer_counts

    cached = species_unique_kmer_counts(clf.index, str(db))
    fresh = species_unique_kmer_counts(clf.index, None)
    assert cached == fresh
