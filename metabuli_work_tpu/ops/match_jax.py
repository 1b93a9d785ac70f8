"""Index probe + candidate hamming filter — the hot match kernel.

TPU-native replacement for the reference's two-pointer merge over a
delta-encoded stream (reference src/commons/KmerMatcher.cpp:251-466):
the DB here is a *sorted uint64 array* resident in device memory, and the
probe is a batched ``searchsorted`` on the 40-bit amino-acid part followed
by a bounded candidate gather and a vectorized per-codon hamming filter
(reference compareDna, src/commons/KmerMatcher.cpp:1117-1146).

Equivalence notes:
* the reference memoizes candidate lists across equal AA parts; with
  independent binary searches every query slot simply recomputes the same
  run bounds, so results are identical.
* candidate selection keeps hamming <= min(2*minHamming, 7) among the
  candidates of the same AA run (KmerMatcher.cpp:1136).
* per-codon 2-bit hamming packing follows getHammings/getHammings_reverse
  (KmerMatcher.h:386-416): codon i (from the k-mer's low bits) lands in
  2-bit field i (forward) or 7-i (reverse); values are mod-4 truncations
  of the full per-codon distance.
"""

import functools

from . import _jax_setup  # noqa: F401  (must precede jax.numpy use of u64)
import jax
import jax.numpy as jnp
import numpy as np

from .genetic_code import HAMMING_TABLE, KMER_LEN

_HAMMING_NP = HAMMING_TABLE.astype(np.int32)  # np: becomes an HLO literal inside traces
_U64 = jnp.uint64
DNA_BITS = 24


def match_kmers_cm(
    q_kmers,
    q_frames,
    q_valid,
    db_values,
    db_taxids,
    db_species,
    cap: int = 64,
    kmer_format: int = 2,
):
    """Probe sorted DB with query metamers — cap-MAJOR layout.

    All [cap, N] outputs keep N (large) as the minor axis: TPU tiles the
    two minor dims to (8, 128), so a minor axis of cap (~10) would pad
    every candidate tensor ~12.8x.  One searchsorted finds each query's
    run start; run membership is an equality test on the gathered AA
    parts (the reference's two-pointer merge makes the same comparison,
    KmerMatcher.cpp:251-466), and overflow is detected by probing one
    extra slot past the cap.

    Returns dict of [cap, N] arrays: sel (bool), hamming (int32 sum),
    rh (int32, 16-bit packed per-codon), taxid, species, dna_enc (int32,
    target 24-bit DNA part), plus overflow (int32 scalar: #queries whose
    run exceeded cap).
    """
    hamming_tbl = jnp.asarray(_HAMMING_NP)
    dna_mask = _U64((1 << DNA_BITS) - 1)
    M = db_values.shape[0]
    db_aa = db_values >> _U64(DNA_BITS)
    q_aa = q_kmers >> _U64(DNA_BITS)

    lo = jnp.searchsorted(db_aa, q_aa, side="left").astype(jnp.int32)

    # one extra row past the cap: a query whose run still matches there
    # overflowed (exact count is not needed — the pipeline retries with
    # a doubled cap while any query overflows)
    offs = jnp.arange(cap + 1, dtype=jnp.int32)[:, None]
    pos = lo[None, :] + offs
    idx = jnp.clip(pos, 0, M - 1)
    t_vals = db_values[idx]
    cmask = ((t_vals >> _U64(DNA_BITS)) == q_aa[None, :]) \
        & (pos < M) & q_valid[None, :]
    overflow = jnp.sum(cmask[cap]).astype(jnp.int32)
    cmask = cmask[:cap]
    idx = idx[:cap]

    t_dna = (t_vals[:cap] & dna_mask).astype(jnp.int32)
    q_dna = (q_kmers & dna_mask).astype(jnp.int32)[None, :]

    hsum = jnp.zeros_like(t_dna)
    rh_fwd = jnp.zeros_like(t_dna)
    rh_rev = jnp.zeros_like(t_dna)
    for i in range(KMER_LEN):
        qi = (q_dna >> (3 * i)) & 7
        ti = (t_dna >> (3 * i)) & 7
        h = hamming_tbl[(qi << 3) | ti]
        hsum = hsum + h
        h2 = h & 3
        rh_fwd = rh_fwd | (h2 << (2 * i))
        rh_rev = rh_rev | (h2 << (2 * (KMER_LEN - 1 - i)))

    big = jnp.int32(255)
    hsum_m = jnp.where(cmask, hsum, big)
    min_h = jnp.min(hsum_m, axis=0, keepdims=True)
    cutoff = jnp.minimum(min_h * 2, 7)
    sel = cmask & (hsum <= cutoff)

    # forward packing iff NOT ((frame < 3) XOR (kmer_format == 2))
    fwd_frame = q_frames < 3
    use_fwd = jnp.logical_not(jnp.logical_xor(fwd_frame, kmer_format == 2))
    rh = jnp.where(use_fwd[None, :], rh_fwd, rh_rev)

    return {
        "sel": sel,
        "hamming": hsum,
        "rh": rh,
        "taxid": db_taxids[idx],
        "species": db_species[idx],
        "dna_enc": t_dna,
        "overflow": overflow,
    }


@functools.partial(jax.jit, static_argnames=("cap", "kmer_format"))
def match_kmers(
    q_kmers,
    q_frames,
    q_valid,
    db_values,
    db_taxids,
    db_species,
    cap: int = 64,
    kmer_format: int = 2,
):
    """match_kmers_cm with the query-major [N, cap] public layout."""
    out = match_kmers_cm(q_kmers, q_frames, q_valid, db_values, db_taxids,
                         db_species, cap=cap, kmer_format=kmer_format)
    return {k: (v if v.ndim == 0 else v.T) for k, v in out.items()}
