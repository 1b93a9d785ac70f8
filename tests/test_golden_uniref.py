"""GOLDEN parity for the UniRef subsystem vs the reference binary.

VERDICT r3 item 6: uniref was the only §2 component never diffed
against the binary.  This module drives the reference's three UniRef
commands (create-uniref-tree / create-unirefdb / assign-uniref —
/root/reference/src/workflow/{create-uniref-tree,create-unirefdb,
assign-uniref}.cpp) on a synthetic UniRef100 XML + protein FASTA and
diffs per-query assignments (cluster NAME + k-mer match count) against
this framework's uniref/{tree,db,classifier}.py.

Cluster names are compared instead of numeric ids: the reference packs
ids into rank-banded ranges sized by --uniref-size
(UnirefTree.cpp:108-112) while this framework uses dense discovery
order — the name IS the cluster identity.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
BUILD_DIR = os.path.join(REPO, "reference_build")
BINARY = os.path.join(BUILD_DIR, "build", "metabuli")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE) or shutil.which("g++") is None,
    reason="reference sources or C++ toolchain unavailable")

_AAS = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def ref_binary():
    if not os.path.exists(BINARY):
        r = subprocess.run(["make", "-j8"], cwd=BUILD_DIR,
                           capture_output=True, timeout=1800)
        if r.returncode != 0:
            pytest.skip("reference binary build failed:\n"
                        + r.stderr.decode(errors="replace")[-2000:])
    return BINARY


def _protein(rng, n):
    return "".join(_AAS[int(i)] for i in rng.integers(0, 20, size=n))


def _mutate_aa(seq, rate, rng):
    out = list(seq)
    for i in np.nonzero(rng.random(len(out)) < rate)[0]:
        out[int(i)] = _AAS[int(rng.integers(0, 20))]
    return "".join(out)


@pytest.fixture(scope="module")
def uniref_env(tmp_path_factory):
    """Synthetic UniRef100 XML (12 x U100 -> 6 x U90 -> 3 x U50), one
    protein per U100 cluster, and a query set of mutated fragments."""
    rng = np.random.default_rng(4242)
    tmp = tmp_path_factory.mktemp("golden_uniref")

    # > 4096 DB k-mers: the binary writes `split` anchors every
    # (kmerCnt / --split-num=4096) entries, so a smaller DB yields an
    # all-zero split file and makeQueryKmerSplits indexes data[-1]
    # (segfault, KmerMatcher.cpp:670) — an upstream small-DB edge this
    # test sidesteps by using a realistic k-mer count
    n100, n90, n50 = 24, 12, 6
    proteins = {}
    entries = []
    for i in range(n100):
        u100 = f"UniRef100_P{i:03d}"
        u90 = f"UniRef90_Q{i // 2:03d}"
        u50 = f"UniRef50_R{i // 4:03d}"
        seq = _protein(rng, int(rng.integers(250, 650)))
        proteins[u100] = seq
        # property order matters for the reference's yxml state machine:
        # "UniRef90 ID" must precede "UniRef50 ID" (UnirefTree.cpp:177-182),
        # and both live under <representativeMember>
        entries.append(
            f'<entry id="{u100}" updated="2026-01-01">\n'
            f'  <name>Cluster: test {i}</name>\n'
            f'  <representativeMember>\n'
            f'    <dbReference type="UniProtKB ID" id="M{i}">\n'
            f'      <property type="UniRef90 ID" value="{u90}"/>\n'
            f'      <property type="UniRef50 ID" value="{u50}"/>\n'
            f'    </dbReference>\n'
            f'    <sequence length="{len(seq)}">{seq}</sequence>\n'
            f'  </representativeMember>\n'
            f'</entry>')
    xml = tmp / "uniref100.xml"
    xml.write_text('<?xml version="1.0" encoding="ISO-8859-1"?>\n'
                   '<UniRef100 xmlns="http://uniprot.org/uniref">\n'
                   + "\n".join(entries) + "\n</UniRef100>\n")

    fasta = tmp / "uniref100.fasta"
    with open(fasta, "w") as f:
        for name, seq in proteins.items():
            f.write(f">{name}\n{seq}\n")

    # queries: mutated fragments of cluster members (some spanning two
    # clusters' LCA behavior via heavy mutation), plus pure random
    queries = []
    names = list(proteins)
    for i in range(24):
        src = names[i % len(names)]
        seq = proteins[src]
        ln = int(rng.integers(40, max(41, len(seq))))
        s = int(rng.integers(0, len(seq) - ln + 1))
        q = _mutate_aa(seq[s:s + ln], 0.05 if i % 3 else 0.0, rng)
        queries.append((f"q{i}_{src}", q))
    for i in range(6):
        queries.append((f"rand{i}", _protein(rng, 60)))
    qf = tmp / "queries.fasta"
    with open(qf, "w") as f:
        for name, seq in queries:
            f.write(f">{name}\n{seq}\n")
    return tmp, (n100, n90, n50)


def _parse_uniref_tsv(path):
    rows = {}
    for line in open(path):
        if line.startswith("queryId"):
            continue
        c = line.rstrip("\n").split("\t")
        rows[c[1]] = (c[3], int(c[5]))   # name -> (cluster name, matches)
    return rows


def test_golden_uniref(ref_binary, uniref_env, tmp_path_factory):
    tmp, (n100, n90, n50) = uniref_env

    # --- reference binary pipeline
    tree_dir = tmp / "TREE"
    r = subprocess.run(
        [ref_binary, "create-uniref-tree", str(tree_dir),
         str(tmp / "uniref100.xml"), "--uniref-size",
         f"{n100},{n90},{n50}"],
        capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-1500:] \
        + r.stderr.decode(errors="replace")[-500:]
    tree_mtbl = tree_dir / "uniref_tree.mtbl"
    assert tree_mtbl.exists()

    db_dir = tmp / "REFDB"
    db_dir.mkdir(exist_ok=True)
    r = subprocess.run(
        [ref_binary, "create-uniref-db", str(db_dir),
         str(tmp / "uniref100.fasta"), str(tree_mtbl),
         "--max-ram", "4"],
        capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-1500:] \
        + r.stderr.decode(errors="replace")[-500:]

    out_dir = tmp / "REFOUT"
    out_dir.mkdir(exist_ok=True)
    r = subprocess.run(
        [ref_binary, "assign_uniref", str(tmp / "queries.fasta"),
         str(db_dir), str(tree_mtbl), str(out_dir),
         "--max-ram", "4", "--threads", "2"],
        capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-1500:] \
        + r.stderr.decode(errors="replace")[-500:]
    ref = _parse_uniref_tsv(out_dir / "uniref_classifications.tsv")
    assert len(ref) == 30
    n_hit = sum(1 for v in ref.values() if v[0] != "-")
    assert n_hit >= 20, f"reference should classify most queries: {n_hit}"

    # --- this framework
    from metabuli_work_tpu.uniref.classifier import assign_uniref
    from metabuli_work_tpu.uniref.db import build_uniref_db
    from metabuli_work_tpu.uniref.tree import UnirefTree

    wd = tmp_path_factory.mktemp("my_uniref")
    tree = UnirefTree.from_xml(str(tmp / "uniref100.xml"))
    tree.save(str(wd / "uniref_tree.npz"))
    build_uniref_db(str(wd / "DB"), str(tmp / "uniref100.fasta"),
                    str(wd / "uniref_tree.npz"))
    my_path = assign_uniref(str(tmp / "queries.fasta"), str(wd / "DB"),
                            str(wd / "OUT"))
    mine = _parse_uniref_tsv(my_path)

    assert mine.keys() == ref.keys()
    # kmerMatchCnt is compared only for CLASSIFIED queries: the
    # reference's ProteinQuery.kmerMatchCnt (common.h:135, no default
    # initializer) is only assigned inside a match block
    # (UnirefClassifier.cpp assignUniref), so never-matched queries
    # print stale/uninitialized memory there
    def norm(v):
        return v if v[0] != "-" else ("-",)

    bad = [(q, ref[q], mine[q]) for q in ref if norm(ref[q]) != norm(mine[q])]
    assert not bad, (f"{len(bad)}/{len(ref)} uniref assignments differ; "
                     f"first 3: {bad[:3]}")
