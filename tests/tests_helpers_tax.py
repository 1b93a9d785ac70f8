"""Shared tiny-taxonomy builder for tests."""

import numpy as np

from metabuli_work_tpu.taxonomy import Taxonomy


def make_flat_tax(n_species=16):
    """root(1) -> genus(2) -> species 3..; strains species_id+n."""
    parent = [0, 1, 1]
    rank = ["no rank", "no rank", "genus"]
    for i in range(n_species):
        parent.append(2)
        rank.append("species")
    for i in range(n_species):
        parent.append(3 + i)
        rank.append("strain")
    rank_pool = sorted(set(rank))
    rank_idx = [rank_pool.index(r) for r in rank]
    n = len(parent)
    return Taxonomy(np.array(parent), np.array(rank_idx), np.arange(n),
                    rank_pool, [f"n{i}" for i in range(n)],
                    np.arange(n))
