"""Interrupted-build resume (SURVEY 5.4: flush-granularity resumability).

The reference's flush files are naturally resumable but its resume hooks
are commented out (reference workflow/build.cpp:110-113); here `build
--resume` adopts the spilled runs recorded in <dbdir>/.build_runs/
manifest.json and skips the covered input records.  The test kills a
build partway through (after several flushes), resumes it, and asserts
the resulting index equals an uninterrupted build's.
"""

import json
import os

import numpy as np
import pytest

from metabuli_work_tpu.index.builder import IndexBuilder, build_database


def _write_taxdump(d):
    d.mkdir()
    nodes = [(1, 1, "no rank"), (2, 1, "genus")] + \
        [(1000 + i, 2, "species") for i in range(4)]
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\t\t|\t0\t|\t0\t|\t0\t|\t0\t|"
                    f"\t0\t|\t0\t|\t0\t|\t\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t, _, _ in nodes:
            f.write(f"{t}\t|\tn{t}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")


def _inputs(tmp_path, n_seqs=12, seq_len=9_000):
    rng = np.random.default_rng(42)
    _write_taxdump(tmp_path / "taxdump")
    fa = tmp_path / "g.fna"
    with open(fa, "w") as f, open(tmp_path / "acc2taxid.map", "w") as m:
        m.write("accession\taccession.version\ttaxid\tgi\n")
        for i in range(n_seqs):
            seq = "".join(rng.choice(list("ACGT"), seq_len))
            f.write(f">S{i}\n{seq}\n")
            m.write(f"S{i}\tS{i}.1\t{1000 + i % 4}\t0\n")
    (tmp_path / "fastas.txt").write_text(f"{fa}\n")
    return tmp_path


# flush after ~8k k-mers so 12 x 9kb sequences (~18k k-mers each, 6
# frames) spill many runs
TINY_RAM = 8_192 * 32 / (1 << 30)


def _build(db, tmp, resume=False):
    return build_database(
        str(db), str(tmp / "fastas.txt"), str(tmp / "acc2taxid.map"),
        str(tmp / "taxdump"), syncmer=False, mask_mode=0,
        max_ram_gb=TINY_RAM, resume=resume)


def test_resume_equals_uninterrupted(tmp_path, monkeypatch):
    tmp = _inputs(tmp_path)

    clean = _build(tmp_path / "CLEAN", tmp)
    assert clean.size > 50_000

    # interrupted build: die after the 5th sequence
    calls = {"n": 0}
    orig = IndexBuilder.add_sequence

    def bomb(self, seq, taxid_internal, cds_blocks=None):
        calls["n"] += 1
        if calls["n"] > 5:
            raise KeyboardInterrupt("simulated crash")
        return orig(self, seq, taxid_internal, cds_blocks)

    monkeypatch.setattr(IndexBuilder, "add_sequence", bomb)
    with pytest.raises(KeyboardInterrupt):
        _build(tmp_path / "DB", tmp)
    monkeypatch.setattr(IndexBuilder, "add_sequence", orig)

    man_path = tmp_path / "DB" / ".build_runs" / "manifest.json"
    assert man_path.exists(), "crash must leave a resume manifest"
    man = json.loads(man_path.read_text())
    assert 0 < man["processed"] < 12
    assert len(man["runs"]) >= 1

    resumed = _build(tmp_path / "DB", tmp, resume=True)
    assert not (tmp_path / "DB" / ".build_runs").exists(), \
        "completed build must clear its checkpoint"

    assert resumed.size == clean.size
    assert (np.asarray(resumed.values) == np.asarray(clean.values)).all()
    assert (np.asarray(resumed.taxids) == np.asarray(clean.taxids)).all()
    # acc2taxid bookkeeping also complete
    lines = (tmp_path / "DB" / "acc2taxid.map").read_text().splitlines()
    assert len(lines) == 12


def test_resume_refuses_changed_params(tmp_path, monkeypatch):
    tmp = _inputs(tmp_path)
    calls = {"n": 0}
    orig = IndexBuilder.add_sequence

    def bomb(self, seq, taxid_internal, cds_blocks=None):
        calls["n"] += 1
        if calls["n"] > 5:
            raise KeyboardInterrupt()
        return orig(self, seq, taxid_internal, cds_blocks)

    monkeypatch.setattr(IndexBuilder, "add_sequence", bomb)
    with pytest.raises(KeyboardInterrupt):
        _build(tmp_path / "DB", tmp)
    monkeypatch.setattr(IndexBuilder, "add_sequence", orig)

    with pytest.raises(RuntimeError, match="resume"):
        build_database(
            str(tmp_path / "DB"), str(tmp / "fastas.txt"),
            str(tmp / "acc2taxid.map"), str(tmp / "taxdump"),
            syncmer=True,   # changed parameter
            mask_mode=0, max_ram_gb=TINY_RAM, resume=True)
