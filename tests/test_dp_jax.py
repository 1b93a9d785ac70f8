"""Device path-DP vs the host vectorized DP (itself pinned to the scalar
reference semantics)."""

import numpy as np
import pytest

from metabuli_work_tpu.classify.taxonomer import MATCH_DTYPE, sort_matches
from metabuli_work_tpu.classify.taxonomer_vec import VectorTaxonomer

rng = np.random.default_rng(77)


def make_tensor_workload(G_reads=6, W=20, cap=4, n_species=3, density=0.25,
                         chain_prob=0.8, max_shift=1, seed=0):
    """Random [G, W, cap] candidate tensors with plantable chains.

    pos follows the real layout: frame f (g%6), forward pos = f%3 + 3w,
    reverse pos descending.
    """
    r = np.random.default_rng(seed)
    G = G_reads * 6
    sel = r.random((G, W, cap)) < density
    species = r.integers(2, 2 + n_species, (G, W, cap)).astype(np.int32)
    dna = r.integers(0, 2**24, (G, W, cap)).astype(np.int32)
    rh = r.integers(0, 2**16, (G, W, cap)).astype(np.int32)
    ham = r.integers(0, 6, (G, W, cap)).astype(np.int32)

    # plant consecutive chains so depth >= min_cons_cnt paths exist:
    # dna shifted by 3*shift with new codons appended
    for g in range(G):
        for j in range(cap):
            w = 0
            while w < W - 1:
                if sel[g, w, j] and r.random() < chain_prob and W - w > 3:
                    length = int(r.integers(3, min(12, W - w)))
                    for t in range(1, length):
                        sel[g, w + t, j] = True
                        species[g, w + t, j] = species[g, w, j]
                        fwd = (g % 6) < 3
                        prev = int(dna[g, w + t - 1, j])
                        new_codon = int(r.integers(0, 8))
                        if fwd:
                            # next = (prev >> 3) | new << 21 fails...
                            # isConsecutive2 fwd: prev & mask21 == next >> 3
                            nxt = ((prev & ((1 << 21) - 1)) << 3) | new_codon
                        else:
                            nxt = (prev >> 3) | (new_codon << 21)
                        dna[g, w + t, j] = nxt
                    w += length
                else:
                    w += 1

    # positions per layout
    pos = np.zeros((G, W, cap), dtype=np.int32)
    for g in range(G):
        f = g % 6
        if f < 3:
            p = (f % 3) + 3 * np.arange(W)
        else:
            seq_end = (f % 3) + 3 * (W + 8) - 1  # arbitrary consistent end
            p = seq_end - 3 * (np.arange(W) + 8) + 1
        pos[g] = p[:, None]
    taxid = species + 10
    return sel, species, dna, rh, ham, pos, taxid


def tensors_to_matches(sel, species, dna, rh, ham, pos, taxid, G_reads):
    rows = []
    G, W, cap = sel.shape
    for g in range(G):
        rid = g // 6 + 1
        f = g % 6
        for w in range(W):
            for j in range(cap):
                if sel[g, w, j]:
                    rows.append((rid, pos[g, w, j], f, taxid[g, w, j],
                                 species[g, w, j], dna[g, w, j], rh[g, w, j],
                                 ham[g, w, j]))
    m = np.zeros(len(rows), dtype=MATCH_DTYPE)
    for i, row in enumerate(rows):
        m[i] = row
    return sort_matches(m)


def run_device_dp(sel, species, dna, rh, ham, pos, max_shift, min_depth_val):
    """[G, W, cap] test tensors -> cap-major kernel -> [G, T, cap] output."""
    import jax.numpy as jnp

    from metabuli_work_tpu.ops import dp_jax

    cm = lambda a: jnp.asarray(np.moveaxis(a, 2, 0))        # -> [cap, G, W]
    fields = {
        "sel": cm(sel), "species": cm(species), "dna": cm(dna),
        "rh": cm(rh), "ham": cm(ham), "pos": cm(pos),
    }
    import functools
    import jax

    fields = dp_jax.sort_candidates(fields, fields["sel"], fields["ham"], fields["dna"])
    md = jnp.full(fields["sel"].shape, min_depth_val, dtype=jnp.int32)
    jitted = jax.jit(functools.partial(dp_jax.path_dp, max_shift=max_shift,
                                       kmer_format=2))
    out = jitted(fields["sel"], fields["species"], fields["dna"],
                 fields["rh"], fields["ham"], fields["pos"], md)
    # [T, cap, G] -> [G, T, cap]
    return {k: np.moveaxis(np.asarray(v), 2, 0) for k, v in out.items()}


def host_paths(m, taxonomer):
    paths = taxonomer._dp_paths(m)
    return paths


def canon(paths_list):
    """Canonical multiset of path tuples for comparison."""
    return sorted(paths_list)


@pytest.mark.parametrize("max_shift", [1, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_dp_equals_host(max_shift, seed):
    from tests_helpers_tax import make_flat_tax

    sel, species, dna, rh, ham, pos, taxid = make_tensor_workload(
        max_shift=max_shift, seed=seed)
    m = tensors_to_matches(sel, species, dna, rh, ham, pos, taxid, 6)

    tax = make_flat_tax(16)
    vt = VectorTaxonomer(tax, kmer_format=2, seq_mode=1,
                         syncmer=(max_shift != 1), smer_len=8 - max_shift,
                         min_cons_cnt=4)
    hp = vt._dp_paths(m)
    want = canon([
        (int(hp["qid"][i]), int(hp["species"][i]),
         int(hp["start"][i]), int(hp["end"][i]),
         float(np.float32(hp["score"][i])), int(hp["hamming"][i]),
         int(hp["depth"][i]), int(hp["rh_start"][i]))
        for i in range(len(hp["idx"]))
    ])

    out = run_device_dp(sel, species, dna, rh, ham, pos, max_shift, 4)
    got = []
    G = sel.shape[0]
    for g in range(G):
        rid = g // 6 + 1
        em = out["emit"][g]
        for t in range(em.shape[0]):
            for j in range(em.shape[1]):
                if em[t, j]:
                    got.append((
                        rid, int(out["species"][g, t, j]),
                        int(out["start"][g, t, j]), int(out["end"][g, t, j]),
                        float(np.float32(out["score"][g, t, j])),
                        int(out["hamming"][g, t, j]),
                        int(out["depth"][g, t, j]),
                        int(out["rh_start"][g, t, j]),
                    ))
    assert canon(got) == want
