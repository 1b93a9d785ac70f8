"""Tests for GTDB converter + taxonomy plumbing utilities + convertDB."""

import numpy as np

from metabuli_work_tpu.taxonomy import Taxonomy
from metabuli_work_tpu.taxonomy.gtdb import gtdb_to_taxdump


def test_gtdb_to_taxdump(tmp_path):
    tsv = tmp_path / "gtdb.tsv"
    tsv.write_text(
        "GCA_000001.1\td__Bacteria;p__Proteobacteria;c__Gammaproteobacteria;"
        "o__Enterobacterales;f__Enterobacteriaceae;g__Escherichia;s__Escherichia coli\n"
        "GCA_000002.1\td__Bacteria;p__Proteobacteria;c__Gammaproteobacteria;"
        "o__Enterobacterales;f__Enterobacteriaceae;g__Escherichia;s__Escherichia coli\n"
        "GCA_000003.1\td__Bacteria;p__Firmicutes;c__Bacilli;o__Bacillales;"
        "f__Bacillaceae;g__Bacillus;s__Bacillus subtilis\n"
    )
    out = tmp_path / "dump"
    acc2taxid = gtdb_to_taxdump([str(tsv)], str(out))
    assert len(acc2taxid) == 3
    tax = Taxonomy.from_taxdump(str(out))
    a1 = tax.to_internal(acc2taxid["GCA_000001.1"])
    a2 = tax.to_internal(acc2taxid["GCA_000002.1"])
    a3 = tax.to_internal(acc2taxid["GCA_000003.1"])
    # same species for the two E. coli assemblies
    assert int(tax.species_of(a1)) == int(tax.species_of(a2)) != 0
    assert int(tax.species_of(a1)) != int(tax.species_of(a3))
    assert tax.rank_of(int(tax.species_of(a1))) == "species"
    assert tax.name_of(int(tax.species_of(a1))) == "Escherichia coli"
    # LCA of the two species is superkingdom-level Bacteria
    lca = int(tax.lca_pair(int(tax.species_of(a1)), int(tax.species_of(a3))))
    assert tax.name_of(lca) == "Bacteria"
    # acc2taxid map file written and loadable by the builder
    from metabuli_work_tpu.index.builder import load_acc2taxid

    m = load_acc2taxid(str(out / "gtdb_acc2taxid.map"))
    assert m["GCA_000001"] == acc2taxid["GCA_000001.1"]


def test_count_common_and_aa_offset(tmp_path):
    from metabuli_work_tpu.taxonomy.tools import count_common_kmers, make_aa_offset

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    np.save(a / "kmers.npy", np.array([1, 2, 3, 5, 8], dtype=np.uint64))
    np.save(b / "kmers.npy", np.array([2, 3, 13], dtype=np.uint64))
    assert count_common_kmers(str(a), str(b)) == 2

    vals = (np.array([7, 7, 7, 9, 9, 12], dtype=np.uint64) << np.uint64(24)) | np.uint64(5)
    np.save(a / "kmers.npy", np.sort(vals))
    starts = make_aa_offset(str(a))
    assert starts.tolist() == [0, 3, 5]


def test_filter_by_genus(tmp_path):
    from metabuli_work_tpu.taxonomy.tools import filter_by_genus

    d = tmp_path / "dump"
    d.mkdir()
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in [(1, 1, "no rank"), (10, 1, "genus"), (11, 10, "species"),
                        (20, 1, "genus"), (21, 20, "species")]:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t in (1, 10, 11, 20, 21):
            f.write(f"{t}\t|\tn{t}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    cls = tmp_path / "c.tsv"
    cls.write_text("#h\n1\tr1\t11\t150\t0.9\tspecies\t-\n1\tr2\t21\t150\t0.9\tspecies\t-\n")
    out = filter_by_genus(str(cls), str(d), [10], str(tmp_path / "o.tsv"))
    rows = [l for l in open(out).read().splitlines() if not l.startswith("#")]
    assert len(rows) == 1 and "\tr1\t" in rows[0]
