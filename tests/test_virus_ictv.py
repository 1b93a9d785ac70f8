"""Tests for ICTV formatting and virus benchmark sets."""

from metabuli_work_tpu.report.virus_benchmark import ictv_format, make_virus_benchmark_set
from metabuli_work_tpu.taxonomy import Taxonomy


def test_ictv_format(tmp_path):
    tsv = tmp_path / "ictv.tsv"
    tsv.write_text(
        "Realm\tKingdom\tPhylum\tClass\tOrder\tFamily\tGenus\tSpecies\n"
        "Riboviria\tOrthornavirae\tPisuviricota\tPisoniviricetes\tNidovirales\t"
        "Coronaviridae\tBetacoronavirus\tSevere acute respiratory syndrome-related coronavirus\n"
        "Riboviria\tOrthornavirae\tPisuviricota\tPisoniviricetes\tNidovirales\t"
        "Coronaviridae\tAlphacoronavirus\tHuman coronavirus 229E\n"
        "Duplodnaviria\tHeunggongvirae\tUroviricota\tCaudoviricetes\t\t"
        "Straboviridae\tTequatrovirus\tEscherichia virus T4\n"
    )
    out = ictv_format(str(tsv), str(tmp_path / "dump"))
    tax = Taxonomy.from_taxdump(out)
    sars = None
    for i in range(1, tax.num_nodes()):
        if tax.name_of(i).startswith("Severe acute"):
            sars = i
    assert sars is not None
    assert tax.rank_of(sars) == "species"
    # genus ancestor
    assert tax.name_of(int(tax.genus_of(sars))) == "Betacoronavirus"
    h229 = [i for i in range(1, tax.num_nodes()) if tax.name_of(i).startswith("Human corona")][0]
    lca = int(tax.lca_pair(sars, h229))
    assert tax.name_of(lca) == "Coronaviridae"


def test_make_virus_benchmark_set(tmp_path):
    tsv = tmp_path / "ictv.tsv"
    tsv.write_text(
        "Realm\tFamily\tGenus\tSpecies\n"
        "R\tF1\tG1\tS1\nR\tF1\tG2\tS2\nR\tF2\tG3\tS3\nR\tF2\tG4\tS4\n"
    )
    dump = ictv_format(str(tsv), str(tmp_path / "dump"))
    tax = Taxonomy.from_taxdump(dump)
    sp_ids = {tax.name_of(i): tax.orig_of(i) for i in range(1, tax.num_nodes())
              if tax.rank_of(i) == "species"}
    al = tmp_path / "assemblies.tsv"
    al.write_text("".join(f"a_{n}.fna\t{t}\n" for n, t in sp_ids.items()))
    exc, db = make_virus_benchmark_set(str(al), dump, str(tmp_path / "sets"), rank="genus")
    n_exc = len(open(exc).read().splitlines())
    n_db = len(open(db).read().splitlines())
    assert n_exc == 2 and n_db == 2  # one genus excluded per family
