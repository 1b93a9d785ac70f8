"""Scalable DB build (VERDICT r1 item 5): bounded-memory k-way merge of
spilled runs + multiprocess extraction, both equal to the in-RAM build.
"""

import numpy as np
import pytest

from metabuli_work_tpu.index.builder import IndexBuilder, build_database
from tests.tests_helpers_tax import make_flat_tax

rng = np.random.default_rng(53)


def _genomes(n=6, length=5000):
    return ["".join(rng.choice(list("ACGT"), length)) for _ in range(n)]


def test_streaming_merge_equals_in_ram():
    tax = make_flat_tax()
    genomes = _genomes()

    ram = IndexBuilder(tax, syncmer=False, mask_mode=0)
    for i, g in enumerate(genomes):
        ram.add_sequence(g, 3 + i)
    ref = ram.finalize()

    # tiny flush budget: every genome spills its own run
    spill = IndexBuilder(tax, syncmer=False, mask_mode=0)
    spill.flush_kmers = 4000
    for i, g in enumerate(genomes):
        spill.add_sequence(g, 3 + i)
    assert len(spill._runs) >= 4, f"only {len(spill._runs)} runs spilled"
    got = spill.finalize()

    assert np.array_equal(np.asarray(got.values), ref.values)
    assert np.array_equal(np.asarray(got.taxids), ref.taxids)
    assert np.array_equal(np.asarray(got.species), ref.species)
    # bounded memory: the merge never held more than a small multiple of
    # the flush budget in RAM, independent of total index size
    assert spill.merge_rounds >= 2
    assert spill.merge_peak_rows < ref.size, \
        "merge materialized the whole index"
    assert spill.merge_peak_rows <= spill.flush_kmers * 2


def test_streaming_merge_cross_run_lca():
    """The same (value, species) in different runs must still collapse to
    one entry with the LCA taxid."""
    tax = make_flat_tax()
    g = _genomes(1, 3000)[0]
    sp_internal = 3          # species node; strains are 3+16=19
    strain = 19

    ram = IndexBuilder(tax, syncmer=False, mask_mode=0)
    ram.add_sequence(g, sp_internal)
    ram.add_sequence(g, strain)
    ref = ram.finalize()

    spill = IndexBuilder(tax, syncmer=False, mask_mode=0)
    spill.flush_kmers = 1     # force a flush per sequence
    spill.add_sequence(g, sp_internal)
    spill.add_sequence(g, strain)
    assert len(spill._runs) >= 2
    got = spill.finalize()
    assert np.array_equal(np.asarray(got.values), ref.values)
    assert np.array_equal(np.asarray(got.taxids), ref.taxids)
    # LCA of species and its strain is the species
    assert set(np.unique(np.asarray(got.taxids))) == {sp_internal}


def test_parallel_build_equals_sequential(tmp_path):
    d = tmp_path / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (10, 1, "genus"),
             (100, 10, "species"), (200, 10, "species")]
    with open(d / "nodes.dmp", "w") as f:
        for tid, par, rank in nodes:
            f.write(f"{tid}\t|\t{par}\t|\t{rank}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for tid, _, _ in nodes:
            f.write(f"{tid}\t|\tn{tid}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    fasta = tmp_path / "g.fna"
    with open(fasta, "w") as f:
        for i, g in enumerate(_genomes(4, 4000)):
            f.write(f">A{i}\n{g}\n")
    (tmp_path / "fastas.txt").write_text(str(fasta) + "\n")
    with open(tmp_path / "acc2taxid.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        for i in range(4):
            f.write(f"A{i}\tA{i}.1\t{100 if i % 2 else 200}\t0\n")

    seq = build_database(str(tmp_path / "db_seq"), str(tmp_path / "fastas.txt"),
                         str(tmp_path / "acc2taxid.map"), str(d),
                         mask_mode=1, threads=1)
    par = build_database(str(tmp_path / "db_par"), str(tmp_path / "fastas.txt"),
                         str(tmp_path / "acc2taxid.map"), str(d),
                         mask_mode=1, threads=3)
    assert np.array_equal(np.asarray(par.values), np.asarray(seq.values))
    assert np.array_equal(np.asarray(par.taxids), np.asarray(seq.taxids))
    assert np.array_equal(np.asarray(par.species), np.asarray(seq.species))
