"""The flagship device step: fused extract + probe for one read batch.

This is the single-chip "forward step" of the framework — everything the
device does per batch of reads (the host handles IO and final per-read
assignment).  Used by __graft_entry__ for compile checks and by bench.py.
"""

import functools

from ..ops import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp

from ..ops import encode_jax, match_jax


@functools.partial(jax.jit, static_argnames=("cap", "kmer_format", "syncmer", "smer_len"))
def classify_step(reads, lengths, db_values, db_taxids, db_species,
                  cap: int = 16, kmer_format: int = 2,
                  syncmer: bool = False, smer_len: int = 5):
    """reads uint8 [B, L], lengths int32 [B] -> match tensors.

    Returns the flat per-kmer match arrays plus query annotation; the
    host compacts/sorts them for scoring.
    """
    kmers, pos, valid = encode_jax.extract_batch(reads, lengths,
                                                 syncmer=syncmer, smer_len=smer_len)
    b = reads.shape[0]
    sids = jnp.arange(1, b + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
    out = match_jax.match_kmers(qk, qf, qv, db_values, db_taxids, db_species,
                                cap=cap, kmer_format=kmer_format)
    out["pos"] = qp
    out["frame"] = qf
    out["seq_id"] = qs
    return out


@functools.partial(jax.jit, static_argnames=("cap", "kmer_format", "syncmer", "smer_len", "paired"))
def fused_step(reads1, lens1, reads2, lens2, db_values, db_taxids, db_species,
               cap: int = 16, kmer_format: int = 2,
               syncmer: bool = False, smer_len: int = 5, paired: bool = False):
    """One-dispatch device pipeline: extract (+mate2) -> probe -> compact.

    Fusing the whole per-batch device path into a single XLA program
    matters doubly here: XLA fuses the intermediate tensors away, and a
    remote/tunneled device pays per-dispatch round-trip latency that
    unfused jnp ops multiply by ~30x.

    Returns (packed int32 [6, N*cap], count, overflow).
    """
    from ..ops import compact_jax

    kmers, pos, valid = encode_jax.extract_batch(reads1, lens1,
                                                 syncmer=syncmer, smer_len=smer_len,
                                                 kmer_format=kmer_format)
    b = reads1.shape[0]
    sids = jnp.arange(1, b + 1, dtype=jnp.int32)
    qk, qp, qf, qs, qv = encode_jax.flatten_batch(kmers, pos, valid, sids)
    if paired:
        k2, p2, v2 = encode_jax.extract_batch(reads2, lens2,
                                              syncmer=syncmer, smer_len=smer_len,
                                              kmer_format=kmer_format)
        # mate-2 positions offset by len1 + 3 (KmerExtractor.cpp:341-345)
        p2 = p2 + (lens1 + 3)[:, None, None]
        qk2, qp2, qf2, qs2, qv2 = encode_jax.flatten_batch(k2, p2, v2, sids)
        qk = jnp.concatenate([qk, qk2])
        qp = jnp.concatenate([qp, qp2])
        qf = jnp.concatenate([qf, qf2])
        qs = jnp.concatenate([qs, qs2])
        qv = jnp.concatenate([qv, qv2])
    out = match_jax.match_kmers(qk, qf, qv, db_values, db_taxids, db_species,
                                cap=cap, kmer_format=kmer_format)
    packed, count = compact_jax.compact_and_sort(out, qp, qf, qs)
    return packed, count, out["overflow"]


def synthetic_db(n_kmers=4096, n_species=8, seed=0):
    """Small synthetic sorted index for compile checks and dry runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    aa = rng.integers(0, 2**40, size=n_kmers, dtype=np.uint64)
    dna = rng.integers(0, 2**24, size=n_kmers, dtype=np.uint64)
    values = np.unique((aa << np.uint64(24)) | dna)
    taxids = rng.integers(2, 2 + n_species * 4, size=len(values)).astype(np.int32)
    species = (2 + (taxids - 2) % n_species).astype(np.int32)
    return values, taxids, species


def synthetic_reads(batch=32, length=150, seed=1):
    import numpy as np

    rng = np.random.default_rng(seed)
    reads = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(batch, length))
    lengths = np.full(batch, length, dtype=np.int32)
    return reads, lengths
