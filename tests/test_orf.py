"""ORF-prediction build path (index/orf.py — Prodigal's role in the
reference build, src/commons/IndexCreator.cpp:1124-1212)."""

import numpy as np

from metabuli_work_tpu.index.orf import predict_orfs

rng = np.random.default_rng(3)


def _random_noncoding(n):
    # random sequence dense in stop codons in all frames
    return "".join(rng.choice(list("ACGT"), size=n))


def _make_gene(n_codons, seed=0):
    r = np.random.default_rng(seed)
    body = []
    # sense codons only (avoid TAA/TAG/TGA)
    sense = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"
             if a + b + c not in ("TAA", "TAG", "TGA")]
    for _ in range(n_codons - 2):
        body.append(sense[int(r.integers(0, len(sense)))])
    return "ATG" + "".join(body) + "TAA"


def test_forward_gene_found():
    gene = _make_gene(60)                      # 180 nt
    seq = _random_noncoding(100) + gene + _random_noncoding(100)
    blocks = predict_orfs(seq, min_gene=90)
    fwd = [b for b in blocks if b[2] > 0]
    covering = [b for b in fwd if b[0] <= 100 and b[1] >= 100 + len(gene) - 1]
    assert covering, blocks
    # the gene's own call keeps its reading frame through the extension
    assert any((100 - b[0]) % 3 == 0 for b in covering), covering


def test_reverse_gene_found():
    gene = _make_gene(70, seed=1)
    comp = str.maketrans("ACGT", "TGCA")
    rc = gene.translate(comp)[::-1]
    seq = _random_noncoding(90) + rc + _random_noncoding(90)
    blocks = predict_orfs(seq, min_gene=90)
    rev = [b for b in blocks if b[2] < 0]
    assert any(b[0] <= 90 and b[1] >= 90 + len(rc) - 1 for b in rev), blocks


def test_short_orfs_rejected():
    gene = _make_gene(10)  # 30 nt < min_gene
    seq = _random_noncoding(50) + gene + _random_noncoding(50)
    blocks = predict_orfs(seq, min_gene=90)
    # no block need cover the short gene specifically
    assert all(not (b[0] >= 40 and b[1] <= 90) for b in blocks)


def test_orf_build_shrinks_index(tmp_path):
    """--orf-prediction indexes fewer k-mers than 6-frame extraction and
    the ORF index is a subset of in-frame windows."""
    from metabuli_work_tpu.index.builder import IndexBuilder
    from metabuli_work_tpu.taxonomy import Taxonomy

    parent = np.array([0, 1, 1, 1])
    tax = Taxonomy(parent, np.array([0, 0, 1, 1]), np.array([0, 0, 1, 2]),
                   ["no rank", "species"], ["root", "A", "B"],
                   np.array([0, 1, 11, 21]))
    genes = "".join(_make_gene(80, seed=i) for i in range(5))
    seq = _random_noncoding(200) + genes + _random_noncoding(200)

    b1 = IndexBuilder(tax, mask_mode=0)
    b1.add_sequence(seq, 2)
    full = b1.finalize()

    from metabuli_work_tpu.index.orf import predict_orfs

    b2 = IndexBuilder(tax, mask_mode=0)
    b2.add_sequence(seq, 2, cds_blocks=predict_orfs(seq))
    orf = b2.finalize()

    assert 0 < orf.size < full.size
    assert np.all(np.isin(orf.values, full.values))
