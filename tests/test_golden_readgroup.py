"""GOLDEN parity for the read-group subsystem (VERDICT r2 item 1) —
the fork's signature feature (src/read-group/GroupGenerator.cpp:26-893,
GroupApplier.cpp:29-226), previously validated only against self-written
oracles.  Diffs vs the reference binary:

  * create-common-kmer-list : common-kmer DB contents
  * grouping                : the read PARTITION (groups/groupMap up to
                              group-id renaming)
  * apply-group             : per-read updated classifications

on ORF-rich genomes with reads drawn to create genuine k-mer-sharing
structure (overlapping windows per species).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from tests.test_golden_matrix import (BINARY, BUILD_DIR, REFERENCE,
                                      _mutate, _rc, _write_taxdump,
                                      orf_rich_genome)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE) or shutil.which("g++") is None,
    reason="reference sources or C++ toolchain unavailable")


@pytest.fixture(scope="module")
def ref_binary():
    if not os.path.exists(BINARY):
        r = subprocess.run(["make", "-j8"], cwd=BUILD_DIR,
                           capture_output=True, timeout=1800)
        if r.returncode != 0:
            pytest.skip("reference binary build failed")
    return BINARY


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    rng = np.random.default_rng(424242)
    tmp = tmp_path_factory.mktemp("golden_rg")
    _write_taxdump(tmp / "taxdump")

    ga = orf_rich_genome(rng, 140_000)
    gc = orf_rich_genome(rng, 130_000)
    genomes = {"GA": (ga, 101), "GC": (gc, 201)}
    for acc, (seq, _) in genomes.items():
        (tmp / f"{acc}.fna").write_text(f">{acc}\n{seq}\n")
    (tmp / "fastas.txt").write_text(
        "".join(f"{tmp}/{a}.fna\n" for a in genomes))
    with open(tmp / "acc2taxid.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        for acc, (_, tid) in genomes.items():
            f.write(f"{acc}\t{acc}.1\t{tid}\t0\n")

    # reads in overlapping tiles so same-region reads share k-mers ->
    # real grouping structure; a few dispersed reads stay ungrouped
    r = np.random.default_rng(5)
    with open(tmp / "reads.fq", "w") as f:
        i = 0
        for acc, (g, _) in genomes.items():
            for c0 in range(0, 4000, 400):        # 10 tiles x 2 clusters
                for rep in range(4):
                    s = c0 + int(r.integers(0, 120))
                    seq = _mutate(g[s:s + 150], 0.005, r)
                    if r.random() < 0.5:
                        seq = _rc(seq)
                    f.write(f"@t{i}_{acc.lower()}\n{seq}\n+\n"
                            f"{'I' * len(seq)}\n")
                    i += 1
        for j in range(10):
            s = int(r.integers(50_000, 100_000))
            seq = _mutate(ga[s:s + 150], 0.005, r)
            f.write(f"@lone{j}\n{seq}\n+\n{'I' * 150}\n")
    return tmp


@pytest.fixture(scope="module")
def common_dbs(ref_binary, env):
    """Reference + framework common-kmer DBs from the same inputs."""
    tmp = env
    refdb = tmp / "REF_COMMON"
    refdb.mkdir()
    r = subprocess.run(
        [ref_binary, "create-common-kmer-list", str(refdb),
         str(tmp / "fastas.txt"), str(tmp / "acc2taxid.map"),
         str(tmp / "taxdump"), "--mask", "0", "--syncmer", "1",
         "--max-ram", "8"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]

    from metabuli_work_tpu.index.common import build_common_kmer_db

    mydb = tmp / "MY_COMMON"
    build_common_kmer_db(str(mydb), str(tmp / "fastas.txt"),
                         str(tmp / "acc2taxid.map"), str(tmp / "taxdump"),
                         syncmer=True)
    return refdb, mydb


def _load_partition(groups_path):
    """group file -> set of frozensets of member read ids (1-based)."""
    parts = []
    for line in open(groups_path):
        toks = line.split()
        if len(toks) >= 2:
            parts.append(frozenset(int(t) for t in toks[1:]))
    return set(p for p in parts if p)


def test_golden_common_kmer_db(common_dbs):
    """Common-kmer DB contents vs the binary.

    Upstream behaviors established while building this cell (all
    verified against the source):
    - the single-flush path skips the >= 2-species merge filter, so
      small inputs yield the full deduped set (index/common.py);
    - --syncmer 1 is recorded in db.parameters but never applied (the
      scanners come from kmerFormat, fixed at 3);
    - with --syncmer 1 the per-batch k-mer buffer reservation uses the
      METAMER estimate L*1.3/3/((8-smerLen+1)/2) (IndexCreator.cpp:
      1045-1053) while the dna2aa extraction emits ~L/3 k-mers per
      strandx frame — the binary SILENTLY LOSES every k-mer past the
      reservation (writes land beyond startIndexOfReserve and are
      never filtered/written).  The observed reference count equals
      the sum of batch estimates exactly (58,499 = floor(140k*1.3/6) +
      floor(130k*1.3/6) on this fixture).

    The framework does not replicate the data loss; the contract is
    ref SUBSET-OF mine, with every surviving reference k-mer present."""
    from metabuli_work_tpu.index.format import load_reference_db

    refdb, mydb = common_dbs
    ref = load_reference_db(str(refdb))
    rv = np.unique(np.asarray(ref.values, dtype=np.uint64))
    mv = np.unique(np.load(os.path.join(str(mydb), "kmers.npy")))
    missing = np.setdiff1d(rv, mv)
    assert len(missing) == 0, \
        (f"{len(missing)} reference common k-mers absent from mine "
         f"(ref {len(rv)}, mine {len(mv)}); first {missing[:5]}")
    assert len(mv) >= len(rv)


@pytest.fixture(scope="module")
def groupings(ref_binary, env, common_dbs):
    tmp = env
    refdb, mydb = common_dbs
    refout = tmp / "REF_GROUPS"
    refout.mkdir()
    r = subprocess.run(
        [ref_binary, "grouping", str(tmp / "reads.fq"), str(refdb),
         str(refout), "--seq-mode", "1", "--max-ram", "8",
         "--threads", "2"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]

    from metabuli_work_tpu.readgroup.grouping import (GroupingParams,
                                                     run_grouping)

    myout = tmp / "MY_GROUPS"
    myout.mkdir()
    run_grouping(str(tmp / "reads.fq"), str(mydb), str(myout),
                 GroupingParams(syncmer=True, seq_mode=1))
    return refout, myout


def test_golden_grouping_partition(groupings):
    refout, myout = groupings
    ref_parts = _load_partition(refout / "groups")
    my_parts = _load_partition(myout / "groups")
    assert len(ref_parts) >= 2, "reference should form groups"
    assert ref_parts == my_parts, \
        (f"partitions differ: {len(ref_parts)} ref vs {len(my_parts)} "
         f"mine; sym-diff (first 3): "
         f"{[sorted(p) for p in list(ref_parts ^ my_parts)[:3]]}")


def test_golden_apply_group(ref_binary, env, common_dbs, groupings):
    """apply-group: per-read updated classifications must agree."""
    tmp = env
    refout, myout = groupings

    # a classification TSV over the same reads (use the reference
    # binary against a plain DB of the two genomes)
    db = tmp / "DB_cls"
    db.mkdir()
    r = subprocess.run(
        [ref_binary, "build", str(db), str(tmp / "fastas.txt"),
         str(tmp / "acc2taxid.map"), "--taxonomy-path",
         str(tmp / "taxdump"), "--mask", "0"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0
    out = tmp / "OUT_cls"
    out.mkdir()
    r = subprocess.run(
        [ref_binary, "classify", str(tmp / "reads.fq"), str(db),
         str(out), "rg", "--seq-mode", "1", "--min-score", "0.5",
         "--min-sp-score", "0.7", "--max-ram", "8", "--threads", "2"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0

    ref_ap = tmp / "REF_APPLY"
    ref_ap.mkdir()
    r = subprocess.run(
        [ref_binary, "apply-group", str(refout / "groups"),
         str(refout / "groupMap"), str(tmp / "taxdump"),
         str(out / "rg_classifications.tsv"), str(ref_ap)],
        capture_output=True, timeout=900)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]

    from metabuli_work_tpu.readgroup.apply import ApplyParams, apply_groups

    my_ap = tmp / "MY_APPLY"
    my_ap.mkdir()
    apply_groups(str(myout / "groups"), str(myout / "groupMap"),
                 str(tmp / "taxdump"), str(out / "rg_classifications.tsv"),
                 str(my_ap), ApplyParams())

    def parse_updated(d):
        path = [p for p in os.listdir(d) if "updated" in p]
        assert path, f"no updated classifications in {os.listdir(d)}"
        rows = {}
        for line in open(os.path.join(d, path[0])):
            if line.startswith("#"):
                continue
            c = line.rstrip("\n").split("\t")
            if len(c) >= 3:
                rows[c[1]] = (int(c[0]), int(c[2]))
        return rows

    ref_rows = parse_updated(ref_ap)
    my_rows = parse_updated(my_ap)
    assert ref_rows.keys() == my_rows.keys()
    bad = [k for k in ref_rows if ref_rows[k] != my_rows[k]]
    assert not bad, \
        (f"{len(bad)}/{len(ref_rows)} updated reads differ; first 3: "
         f"{[(k, ref_rows[k], my_rows[k]) for k in bad[:3]]}")
