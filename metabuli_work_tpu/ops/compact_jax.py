"""Device-side match compaction (prefix-sum scatter).

The probe produces [N, cap] candidate tensors, mostly empty.  Shipping
them to the host raw costs hundreds of MB per batch; instead this kernel
packs every match into six int32 words (TPU-native lanes — no emulated
u64 scatter), compacts valid rows to the front with a cumsum + scatter
(O(N)), and returns ONE stacked [6, N*cap] tensor so the host pays a
single transfer for the `count` prefix.  The host decodes fields with
vectorized shifts and applies the reference's compareMatches total order
(qid, species, frame, pos, hamming, dnaEncoding — reference
src/commons/KmerMatcher.cpp:1149-1166) with one np.lexsort on the small
compacted set.

Packed int32 columns:
  0 qid | 1 species | 2 (frame << 27) | (ham << 19) | rh(16->bits 3..18)
  3 pos | 4 dna_enc | 5 taxid
"""

import functools

from . import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp

N_COLS = 6


@jax.jit
def compact_and_sort(out, q_pos, q_frames, q_sids):
    """out: dict from match_kmers; q_*: [N] query annotation.

    Returns (packed int32 [N_COLS, N*cap], count int32): match rows
    compacted to the front of each column.
    """
    sel = out["sel"]
    N, cap = sel.shape
    total = N * cap

    def bc(x):
        return jnp.broadcast_to(x[:, None], (N, cap)).reshape(total)

    flat = lambda x: x.reshape(total)
    self = flat(sel)
    meta = (
        (bc(q_frames) << 27)
        | (flat(out["hamming"]) << 19)
        | (flat(out["rh"]) << 3)
    )
    cols = [
        bc(q_sids),
        flat(out["species"]),
        meta,
        bc(q_pos),
        flat(out["dna_enc"]),
        flat(out["taxid"]),
    ]

    dest = jnp.cumsum(self.astype(jnp.int32)) - 1
    dest = jnp.where(self, dest, total - 1)  # invalid rows pile on the tail
    packed = jnp.zeros((N_COLS, total), dtype=jnp.int32)
    for i, arr in enumerate(cols):
        packed = packed.at[i, dest].set(arr.astype(jnp.int32), mode="drop")
    count = jnp.sum(self).astype(jnp.int32)
    return packed, count


def decode_matches(packed, match_dtype):
    """numpy decode of device-packed matches -> MATCH_DTYPE record array."""
    import numpy as np

    p = np.asarray(packed)
    m = np.zeros(p.shape[1], dtype=match_dtype)
    m["qid"] = p[0]
    m["species"] = p[1]
    meta = p[2].astype(np.uint32)
    m["frame"] = (meta >> np.uint32(27)).astype(np.uint8)
    m["ham"] = ((meta >> np.uint32(19)) & np.uint32(0xFF)).astype(np.uint8)
    m["rh"] = ((meta >> np.uint32(3)) & np.uint32(0xFFFF)).astype(np.uint16)
    m["pos"] = p[3].astype(np.uint32)
    m["dna"] = p[4].astype(np.uint32)
    m["taxid"] = p[5]
    return m


def fetch_compacted(packed_count, bucket_quantum: int = 1 << 15):
    """Transfer only the match prefix (rounded up to a bucket) to host."""
    import numpy as np

    packed, count = packed_count
    n = int(count)
    total = packed.shape[1]
    k = min(-(-max(n, 1) // bucket_quantum) * bucket_quantum, total)
    arr = np.asarray(packed[:, :k])  # one transfer
    return arr[:, :n]
