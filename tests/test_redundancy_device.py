"""Device redundancy filter (grouped min-hamming + set-LCA) vs the host
filter_redundant_arrays (itself pinned to the scalar reference,
Taxonomer::filterRedundantMatches, src/commons/Taxonomer.cpp:219-243)."""

import numpy as np
import pytest

from metabuli_work_tpu.classify.taxonomer_vec import VectorTaxonomer


def make_deep_tax(seed=0, n=64):
    """Random tree (parent < child, so DFS-ordered) with non-trivial depth."""
    from metabuli_work_tpu.taxonomy import Taxonomy

    rng = np.random.default_rng(seed)
    parent = [0, 1]
    rank = ["no rank", "no rank"]
    for t in range(2, n):
        parent.append(int(rng.integers(1, t)))
        rank.append("species" if rng.random() < 0.5 else "no rank")
    rank_pool = sorted(set(rank))
    rank_idx = [rank_pool.index(r) for r in rank]
    return Taxonomy(np.array(parent), np.array(rank_idx), np.arange(n),
                    rank_pool, [f"n{i}" for i in range(n)], np.arange(n))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_redundancy_equals_host(seed):
    import jax.numpy as jnp

    from metabuli_work_tpu.models.flagship import redundancy_counts

    tax = make_deep_tax(seed)
    n_nodes = tax.num_nodes()
    rng = np.random.default_rng(seed + 10)

    B, N, cap = 7, 96, 5
    n_quot = 20
    dna_shift = 3

    sel = rng.random((N, cap)) < 0.4
    taxid = rng.integers(2, n_nodes, (N, cap)).astype(np.int32)
    species = np.asarray(tax.species_of(taxid.ravel())).reshape(N, cap).astype(np.int32)
    species = np.where(species > 0, species, taxid)
    ham = rng.integers(0, 7, (N, cap)).astype(np.int32)
    q_sids = np.repeat(np.arange(1, B + 1, dtype=np.int32), N // B + 1)[:N]
    q_pos = rng.integers(0, n_quot * dna_shift - 1, N).astype(np.int32)
    best_sp = np.zeros(B + 1, dtype=np.int32)
    for r in range(1, B + 1):
        rows = (q_sids == r)[:, None] & sel
        if rows.any():
            best_sp[r] = species[rows][0]

    # host ground truth
    vt = VectorTaxonomer(tax, kmer_format=2, seq_mode=1)
    qidf = np.broadcast_to(q_sids[:, None], (N, cap))
    want = best_sp[qidf]
    sel2 = sel & (species == want) & (want > 0)
    tax_host = vt.filter_redundant_arrays(
        qidf[sel2].astype(np.int64),
        np.broadcast_to(q_pos[:, None], (N, cap))[sel2].astype(np.int64),
        ham[sel2].astype(np.int64), taxid[sel2].astype(np.int64))

    depth, lift = tax.lca_lift_tables()
    ef = tax.euler_first.astype(np.int32)[taxid]
    packed_hdr = redundancy_counts(
        jnp.asarray(sel.T), jnp.asarray(species.T), jnp.asarray(ham.T),
        jnp.asarray(ef.T), jnp.asarray(q_pos), jnp.asarray(q_sids),
        jnp.asarray(best_sp),
        jnp.asarray(tax.euler.astype(np.int32)),
        jnp.asarray(depth), jnp.asarray(lift),
        dna_shift=dna_shift, n_quot=n_quot)
    hdr2 = np.asarray(packed_hdr)
    n2 = int(hdr2[0, 0])
    assert int(hdr2[1, 0]) == int(sel2.sum())
    m2 = hdr2[:, 1:n2 + 1]
    tax_dev: dict = {}
    for r, t in zip(m2[0].tolist(), m2[1].tolist()):
        tax_dev.setdefault(r, {})[t] = tax_dev.get(r, {}).get(t, 0) + 1

    assert tax_dev == {k: v for k, v in tax_host.items() if v}
