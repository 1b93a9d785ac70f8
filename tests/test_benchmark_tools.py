"""Tests for benchmark-set machinery and stratified graders."""

import os

import numpy as np
import pytest

from metabuli_work_tpu.taxonomy import Taxonomy


@pytest.fixture
def taxdir(tmp_path):
    d = tmp_path / "taxdump"
    d.mkdir()
    # family 100 -> genera 110, 120 -> species 111,112 / 121,122
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom"), (100, 2, "family"),
             (110, 100, "genus"), (111, 110, "species"), (112, 110, "species"),
             (120, 100, "genus"), (121, 120, "species"), (122, 120, "species")]
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t, _, _ in nodes:
            f.write(f"{t}\t|\tname{t}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    return str(d)


def test_make_test_sets(taxdir, tmp_path):
    from metabuli_work_tpu.report.benchmark import make_test_sets

    al = tmp_path / "assemblies.tsv"
    al.write_text("a111.fna\t111\na112.fna\t112\na121.fna\t121\na122.fna\t122\n")
    exc, db = make_test_sets(str(al), taxdir, str(tmp_path / "sets"),
                             rank="species", seed=7)
    exc_rows = open(exc).read().splitlines()
    db_rows = open(db).read().splitlines()
    assert len(exc_rows) + len(db_rows) == 4
    # one species excluded per genus
    assert len(exc_rows) == 2
    exc_taxa = {int(r.split("\t")[1]) for r in exc_rows}
    assert len(exc_taxa & {111, 112}) == 1
    assert len(exc_taxa & {121, 122}) == 1
    # deterministic under the same seed
    exc2, _ = make_test_sets(str(al), taxdir, str(tmp_path / "sets2"),
                             rank="species", seed=7)
    assert open(exc).read() == open(exc2).read()


def test_grade_group(taxdir, tmp_path):
    from metabuli_work_tpu.report.benchmark import grade_group

    groups = tmp_path / "groups"
    groups.write_text("5\t1\t2\t3\t\n9\t4\t5\t\n")
    answer = tmp_path / "ans.tsv"
    # group 5: members 1,2 species 111, member 3 species 121 -> purity 2/3
    # group 9: both 121 -> purity 1
    answer.write_text("1\t111\n2\t111\n3\t121\n4\t121\n5\t121\n")
    res = grade_group(str(groups), str(answer), taxdir, ranks=["species", "genus"])
    assert abs(res["species"] - (2 / 3 * 3 + 1.0 * 2) / 5) < 1e-9


def test_mapping2taxon(taxdir, tmp_path):
    from metabuli_work_tpu.report.benchmark import mapping2taxon

    mapping = tmp_path / "map.tsv"
    mapping.write_text("r1\t111\nr2\t122\n")
    out = mapping2taxon(str(mapping), taxdir, str(tmp_path / "out.tsv"), rank="genus")
    rows = [l.split("\t") for l in open(out).read().splitlines()]
    assert rows[0][1] == "110" and rows[1][1] == "120"


def test_grade_by_strata(taxdir, tmp_path):
    from metabuli_work_tpu.report.benchmark import grade_by_strata

    cls = tmp_path / "c.tsv"
    cls.write_text(
        "#is_classified\tname\ttaxID\tquery_length\tscore\trank\tx\n"
        "1\tr1\t111\t150\t0.9\tspecies\t-\n"
        "1\tr2\t112\t150\t0.9\tspecies\t-\n"
        "1\tr3\t121\t150\t0.9\tspecies\t-\n"
    )
    ans = tmp_path / "a.tsv"
    ans.write_text("r1\t111\nr2\t111\nr3\t121\n")
    strata = tmp_path / "s.tsv"
    strata.write_text("r1\thigh\nr2\tlow\nr3\thigh\n")
    res = grade_by_strata(str(cls), str(ans), taxdir, str(strata), ranks=["species"])
    assert set(res.keys()) == {"high", "low"}
    assert res["high"]["species"][0] == 1.0   # r1, r3 correct
    assert res["low"]["species"][0] == 0.0    # r2 wrong at species


def test_grade_group_by_strata(taxdir, tmp_path):
    from metabuli_work_tpu.report.benchmark import grade_group_by_strata

    groups = tmp_path / "groups"
    groups.write_text("5\t1\t2\t3\t\n9\t4\t5\t\n")
    answer = tmp_path / "ans.tsv"
    answer.write_text("1\t111\n2\t111\n3\t121\n4\t121\n5\t121\n")
    strata = tmp_path / "s.tsv"
    # high: members 1,2 (pure) + 4,5 (pure); low: member 3 alone (pure)
    strata.write_text("1\thigh\n2\thigh\n3\tlow\n4\thigh\n5\thigh\n")
    res = grade_group_by_strata(str(groups), str(answer), taxdir, str(strata),
                                ranks=["species"])
    assert set(res.keys()) == {"high", "low"}
    assert abs(res["high"]["species"] - 1.0) < 1e-9
    assert abs(res["low"]["species"] - 1.0) < 1e-9
