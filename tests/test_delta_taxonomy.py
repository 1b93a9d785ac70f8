"""Delta codec roundtrip + taxonomy LCA tests."""

import numpy as np
import pytest

from metabuli_work_tpu.index.delta import count_entries, decode_deltas, encode_deltas
from metabuli_work_tpu.taxonomy import Taxonomy

rng = np.random.default_rng(7)


def test_delta_roundtrip_small():
    vals = np.array([0, 1, 2, 100, 2**15, 2**15 + 1, 2**30, 2**45, 2**63, 2**64 - 1], dtype=np.uint64)
    enc = encode_deltas(vals)
    assert count_entries(enc) == len(vals)
    dec = decode_deltas(enc)
    assert np.array_equal(dec, vals)


def test_delta_roundtrip_random():
    vals = np.sort(rng.integers(0, 2**63, size=10000, dtype=np.uint64))
    enc = encode_deltas(vals)
    dec = decode_deltas(enc)
    assert np.array_equal(dec, vals)


def test_delta_first_value_is_delta_from_zero():
    vals = np.array([5], dtype=np.uint64)
    enc = encode_deltas(vals)
    assert enc.tolist() == [0x8000 | 5]


def make_taxdump(tmp_path):
    """Tiny taxonomy:
       1 root
       └─ 2 (superkingdom Bacteria)
          ├─ 10 (genus G1) ── 11 (species S1) ── 111 (strain)
          │                └─ 12 (species S2)
          └─ 20 (genus G2) ── 21 (species S3)
    """
    nodes = [
        (1, 1, "no rank"),
        (2, 1, "superkingdom"),
        (10, 2, "genus"),
        (11, 10, "species"),
        (111, 11, "strain"),
        (12, 10, "species"),
        (20, 2, "genus"),
        (21, 20, "species"),
    ]
    names = {1: "root", 2: "Bacteria", 10: "G1", 11: "S1", 111: "S1 strain", 12: "S2", 20: "G2", 21: "S3"}
    d = tmp_path / "taxdump"
    d.mkdir()
    with open(d / "nodes.dmp", "w") as f:
        for tid, par, rank in nodes:
            f.write(f"{tid}\t|\t{par}\t|\t{rank}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for tid, nm in names.items():
            f.write(f"{tid}\t|\t{nm}\t|\t\t|\tscientific name\t|\n")
    with open(d / "merged.dmp", "w") as f:
        f.write("999\t|\t21\t|\n")
    return str(d)


@pytest.fixture
def tax(tmp_path):
    return Taxonomy.from_taxdump(make_taxdump(tmp_path))


def test_taxonomy_basic(tax):
    assert tax.orig_of(tax.root) == 1
    i11 = tax.to_internal(11)
    i12 = tax.to_internal(12)
    i21 = tax.to_internal(21)
    i111 = tax.to_internal(111)
    assert tax.rank_of(i11) == "species"
    assert tax.name_of(i11) == "S1"
    # merged id resolves
    assert tax.to_internal(999) == i21
    # species/genus rank ancestors
    assert int(tax.species_of(i111)) == i11
    assert int(tax.genus_of(i111)) == tax.to_internal(10)
    assert int(tax.species_of(i12)) == i12


def test_taxonomy_lca(tax):
    i11, i12, i21, i111 = (tax.to_internal(t) for t in (11, 12, 21, 111))
    i10, i2 = tax.to_internal(10), tax.to_internal(2)
    assert int(tax.lca_pair(i11, i12)) == i10
    assert int(tax.lca_pair(i11, i21)) == i2
    assert int(tax.lca_pair(i111, i11)) == i11
    assert int(tax.lca_pair(i11, i11)) == i11
    # vectorized
    a = np.array([i11, i11, i111, i11])
    b = np.array([i12, i21, i11, 0])
    got = tax.lca_pair(a, b)
    assert got.tolist() == [i10, i2, i11, i11]
    # list LCA
    assert tax.lca_list([i11, i12, i21]) == i2
    assert tax.lca_list([i111]) == i111


def test_taxonomy_lca_reduce(tax):
    i11, i12, i21 = (tax.to_internal(t) for t in (11, 12, 21))
    i10, i2 = tax.to_internal(10), tax.to_internal(2)
    vals = np.array([i11, i12, i21, i11, i11, i12])
    segs = np.array([0, 0, 1, 1, 2, 2])
    got = tax.lca_reduce(vals, segs, 3)
    assert got.tolist() == [i10, i2, i10]


def test_taxonomy_save_load(tax, tmp_path):
    p = tmp_path / "tax.npz"
    tax.save(p)
    t2 = Taxonomy.load(p)
    assert np.array_equal(t2.parent, tax.parent)
    assert t2.orig_of(t2.to_internal(11)) == 11
    i11, i21 = t2.to_internal(11), t2.to_internal(21)
    assert int(t2.lca_pair(i11, i21)) == t2.to_internal(2)


def test_is_ancestor(tax):
    i2, i11, i111 = tax.to_internal(2), tax.to_internal(11), tax.to_internal(111)
    assert tax.is_ancestor(i2, i111)
    assert tax.is_ancestor(i11, i111)
    assert not tax.is_ancestor(i111, i11)
