"""Degraded-D2H-link resilience (r5).

Two mechanisms keep throughput when the device->host path slows down
(reference analog: the C++ task farm never exposes a D2H stall at all,
KmerExtractor.cpp:113-193, so parity demands our stalls stay hidden):

  1. the redundancy pair fetch is a small fixed prefix compacted inside
     the kernel (pipeline._pair_width); overflow re-runs the standalone
     kernel wider and stickily grows the width — results must be
     identical at ANY width, including pathological w=2;
  2. a sustained blocking-sync EMA above _SYNC_SWITCH_S flips the
     pipeline to the device-assign flow mid-run (only [6, B+1] records
     cross the link); mixed-flow runs must equal pure host-flow runs.
"""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database

rng = np.random.default_rng(7)


def _genome(n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("degraded")
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (2, 1, "genus"), (11, 2, "species"),
             (21, 2, "species")]
    with open(d / "nodes.dmp", "w") as f:
        for tid, par, rank in nodes:
            f.write(f"{tid}\t|\t{par}\t|\t{rank}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for tid, _, _ in nodes:
            f.write(f"{tid}\t|\tn{tid}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    genomes = {"GA": (_genome(9000), 11), "GB": (_genome(9000), 21)}
    fasta = tmp / "g.fna"
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
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    # enough batches (batch_size=8) that the sync EMA accumulates
    # _SYNC_MIN_SAMPLES while dispatches are still happening — the
    # detector only flips BETWEEN dispatches, not in the drain loop
    with open(reads, "w") as f:
        for i in range(200):
            g = genomes["GA" if i % 2 == 0 else "GB"][0]
            s = int(rng.integers(0, len(g) - 150))
            r = g[s:s + 150]
            if rng.random() < 0.5:
                r = "".join(comp[c] for c in reversed(r))
            f.write(f">r{i}\n{r}\n")
    return db_dir, reads


def _res(qr):
    r = qr.result
    return (r.is_classified, r.classification, round(r.score, 6),
            tuple(sorted((r.tax_cnt or {}).items())))


def _run(db_dir, reads, **tweak):
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    clf = Classifier(str(db_dir), params)
    for k, v in tweak.items():
        setattr(clf, k, v)
    out = clf.classify_file(str(reads))
    return clf, [_res(q) for q in out]


def test_pair_prefix_overflow_rerun(db):
    """w=2 prefix overflows on every batch; the re-run path must yield
    bit-identical results and stickily grow the width."""
    db_dir, reads = db
    _, want = _run(db_dir, reads)
    clf, got = _run(db_dir, reads, _pair_width=2)
    assert got == want
    assert clf._pair_width > 2, "overflow must stickily grow the width"


def test_auto_switch_to_device_assign(db):
    """Force the degraded-link detector (threshold 0) — the detector
    kicks off a background compile of the device-assign flow, keeps the
    host flow until it is ready, then flips; results must stay
    identical before, across, and after the flip."""
    db_dir, reads = db
    _, want = _run(db_dir, reads)
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    clf = Classifier(str(db_dir), params)
    assert clf._da_auto_ok and not clf._device_assign
    clf._SYNC_SWITCH_S = 0.0
    out = clf.classify_file(str(reads))
    assert getattr(clf, "_da_state", "off") in ("compiling", "ready"), \
        "detector must have started the background compile"
    assert [_res(q) for q in out] == want
    clf._da_thread.join(timeout=120)
    assert clf._da_state == "ready"
    out2 = clf.classify_file(str(reads))
    assert clf._device_assign, "flow must flip once the compile is ready"
    assert [_res(q) for q in out2] == want


def test_env_pin_disables_auto_switch(db, monkeypatch):
    monkeypatch.setenv("METABULI_DEVICE_ASSIGN", "0")
    db_dir, reads = db
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)
    clf = Classifier(str(db_dir), params)
    assert not clf._da_auto_ok and not clf._device_assign


def test_device_donor_shares_index(db):
    """from_memory(device_donor=...) must reuse the donor's device
    arrays (no second upload) and classify identically."""
    db_dir, reads = db
    from metabuli_work_tpu.index.format import load_index

    index = load_index(str(db_dir))
    p1 = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                        batch_size=8)
    from metabuli_work_tpu.classify.pipeline import Classifier as C

    clf0 = C.from_memory(index, p1)
    want = [_res(q) for q in clf0.classify_file(str(reads))]
    p2 = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                        batch_size=16)
    clf1 = C.from_memory(index, p2, device_donor=clf0)
    assert clf1.db_quad is clf0.db_quad
    assert clf1.hash_table is clf0.hash_table
    got = [_res(q) for q in clf1.classify_file(str(reads))]
    assert got == want
