"""UniRef subsystem tests: tree parsing, DB build, classification."""

import numpy as np
import pytest

from metabuli_work_tpu.ops.encode_aa import extract_protein_kmers
from metabuli_work_tpu.uniref.tree import UnirefTree

rng = np.random.default_rng(13)

XML = """<?xml version="1.0"?>
<UniRef100 xmlns="http://uniprot.org/uniref">
<entry id="UniRef100_A1" updated="2024-01-01">
  <name>Cluster A1</name>
  <property type="UniRef90 ID" value="UniRef90_A"/>
  <property type="UniRef50 ID" value="UniRef50_X"/>
  <representativeMember><dbReference type="UniProtKB ID" id="A1_HUMAN"/></representativeMember>
</entry>
<entry id="UniRef100_A2">
  <property type="UniRef90 ID" value="UniRef90_A"/>
  <property type="UniRef50 ID" value="UniRef50_X"/>
</entry>
<entry id="UniRef100_B1">
  <property type="UniRef90 ID" value="UniRef90_B"/>
  <property type="UniRef50 ID" value="UniRef50_X"/>
</entry>
<entry id="UniRef100_C1">
  <property type="UniRef90 ID" value="UniRef90_C"/>
  <property type="UniRef50 ID" value="UniRef50_Y"/>
</entry>
</UniRef100>
"""


def random_protein(n):
    return "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), size=n))


@pytest.fixture
def tree(tmp_path):
    p = tmp_path / "u.xml"
    p.write_text(XML)
    return UnirefTree.from_xml(str(p))


def test_tree_structure(tree):
    a1 = tree.name2id["UniRef100_A1"]
    a2 = tree.name2id["UniRef100_A2"]
    b1 = tree.name2id["UniRef100_B1"]
    c1 = tree.name2id["UniRef100_C1"]
    a90 = tree.name2id["UniRef90_A"]
    x50 = tree.name2id["UniRef50_X"]
    assert tree.lca_pair(a1, a2) == a90
    assert tree.lca_pair(a1, b1) == x50
    assert tree.lca_pair(a1, c1) == 0
    assert tree.is_ancestor(x50, a1) and not tree.is_ancestor(a1, x50)


def test_tree_save_load(tree, tmp_path):
    p = tmp_path / "t.npz"
    tree.save(str(p))
    t2 = UnirefTree.load(str(p))
    assert t2.names == tree.names
    assert np.array_equal(t2.parent, tree.parent)


def test_protein_kmers():
    seq = "ARNDCQEGHILKMFPSTWYV"  # 20 residues -> 9 12-mers
    km, pos = extract_protein_kmers(seq, k=12)
    assert len(km) == 9
    assert pos.tolist() == list(range(9))
    # X breaks windows
    km2, _ = extract_protein_kmers(seq[:10] + "X" + seq[10:], k=12)
    assert len(km2) < len(km) + 1
    # first kmer value: A=0 R=1 N=2 D=3 C=4 Q=5 E=6 G=7 H=8 I=9 L=10 K=11
    want = 0
    for c in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]:
        want = (want << 5) | c
    assert int(km[0]) == want


def test_uniref_db_and_classify(tree, tmp_path):
    from metabuli_work_tpu.uniref.classifier import assign_uniref
    from metabuli_work_tpu.uniref.db import build_uniref_db

    tree_path = tmp_path / "tree.npz"
    tree.save(str(tree_path))

    # proteins: A1/A2 share half their sequence; C1 distinct
    shared = random_protein(60)
    pa1 = shared + random_protein(40)
    pa2 = shared + random_protein(40)
    pc1 = random_protein(100)
    fasta = tmp_path / "prot.fna"
    fasta.write_text(f">UniRef100_A1\n{pa1}\n>UniRef100_A2\n{pa2}\n>UniRef100_C1\n{pc1}\n")

    db = tmp_path / "udb"
    values, ids = build_uniref_db(str(db), str(fasta), str(tree_path))
    assert len(values) > 0
    # k-mers of the shared block are labeled UniRef90_A (LCA of A1, A2)
    a90 = tree.name2id["UniRef90_A"]
    km_shared, _ = extract_protein_kmers(shared[10:40])
    idx = np.searchsorted(values, km_shared)
    hit = (idx < len(values)) & (values[np.minimum(idx, len(values) - 1)] == km_shared)
    assert hit.mean() > 0.9
    assert set(ids[idx[hit]].tolist()) == {a90}

    # classify: a query equal to pa1 -> A1; shared-only query -> UniRef90_A
    q = tmp_path / "q.fna"
    q.write_text(f">q1\n{pa1}\n>q2\n{shared}\n>q3\n{random_protein(80)}\n")
    out = assign_uniref(str(q), str(db), str(tmp_path / "uout"))
    rows = [l.split("\t") for l in open(out).read().splitlines()[1:]]
    assert rows[0][3] == "UniRef100_A1"
    assert rows[1][3] == "UniRef90_A"
    assert rows[2][2] == "0"
