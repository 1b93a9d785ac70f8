"""Device-side match compaction (prefix-sum scatter).

The probe produces [N, cap] candidate tensors, mostly empty.  Shipping
them to the host raw costs hundreds of MB per batch; instead this kernel
packs every match into three uint64 key words + one payload word and
compacts valid rows to the front with a cumsum + scatter (O(N)).  The
host transfers only the first `count` rows, decodes fields with
vectorized shifts, and applies the reference's compareMatches total
order (qid, species, frame, pos, hamming, dnaEncoding — reference
src/commons/KmerMatcher.cpp:1149-1166) with one np.lexsort on the small
compacted set.

Key layout (bits):
  key1 = qid(32) << 32 | species(32)         [all-ones when invalid]
  key2 = frame(3) << 42 | pos(32) << 10 | hamming(8)
  key3 = dna_enc(24)
  payload = taxid(32) << 16 | rh(16)
"""

import functools

from . import _jax_setup  # noqa: F401
import jax
import jax.numpy as jnp

_U64 = jnp.uint64
_INVALID = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@jax.jit
def compact_and_sort(out, q_pos, q_frames, q_sids):
    """out: dict from match_kmers; q_*: [N] query annotation.

    Returns (key1, key2, key3, payload) uint64 [N*cap] sorted with
    matches first, plus count (int32 scalar).
    """
    sel = out["sel"]
    N, cap = sel.shape

    def bc(x):
        return jnp.broadcast_to(x[:, None], (N, cap)).reshape(N * cap)

    flat = lambda x: x.reshape(N * cap)
    self = flat(sel)
    qid = bc(q_sids).astype(_U64)
    species = flat(out["species"]).astype(_U64)
    frame = bc(q_frames).astype(_U64)
    pos = bc(q_pos).astype(_U64)
    ham = flat(out["hamming"]).astype(_U64)
    dna = flat(out["dna_enc"]).astype(_U64)
    taxid = flat(out["taxid"]).astype(_U64)
    rh = flat(out["rh"]).astype(_U64)

    key1 = (qid << _U64(32)) | species
    key2 = (frame << _U64(42)) | (pos << _U64(10)) | ham
    key3 = dna
    payload = (taxid << _U64(16)) | rh

    # O(N) compaction: scatter valid rows to the front via prefix sum.
    # (A full device sort of u64 keys is pathologically slow on TPU — the
    # final compareMatches ordering is applied host-side on the small
    # compacted prefix instead.)
    dest = jnp.cumsum(self.astype(jnp.int32)) - 1
    total = self.shape[0]
    dest = jnp.where(self, dest, total - 1)  # invalid rows pile on the tail
    out = []
    for arr in (key1, key2, key3, payload):
        buf = jnp.zeros(total, dtype=_U64)
        buf = buf.at[dest].set(arr, mode="drop", unique_indices=False)
        out.append(buf)
    count = jnp.sum(self).astype(jnp.int32)
    return out[0], out[1], out[2], out[3], count


def decode_matches(key1, key2, key3, payload, match_dtype):
    """numpy decode of device-packed matches -> MATCH_DTYPE record array."""
    import numpy as np

    k1 = np.asarray(key1, dtype=np.uint64)
    k2 = np.asarray(key2, dtype=np.uint64)
    k3 = np.asarray(key3, dtype=np.uint64)
    pl = np.asarray(payload, dtype=np.uint64)
    m = np.zeros(len(k1), dtype=match_dtype)
    m["qid"] = (k1 >> np.uint64(32)).astype(np.int64)
    m["species"] = (k1 & np.uint64(0xFFFFFFFF)).astype(np.int32)
    m["frame"] = (k2 >> np.uint64(42)).astype(np.uint8)
    m["pos"] = ((k2 >> np.uint64(10)) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    m["ham"] = (k2 & np.uint64(0xFF)).astype(np.uint8)
    m["dna"] = k3.astype(np.uint32)
    m["taxid"] = (pl >> np.uint64(16)).astype(np.int32)
    m["rh"] = (pl & np.uint64(0xFFFF)).astype(np.uint16)
    return m


def fetch_compacted(packed, bucket_quantum: int = 1 << 15):
    """Transfer only the match prefix (rounded up to a bucket) to host."""
    import numpy as np

    key1, key2, key3, payload, count = packed
    n = int(count)
    total = key1.shape[0]
    k = min(-(-max(n, 1) // bucket_quantum) * bucket_quantum, total)
    arrs = [np.asarray(a[:k]) for a in (key1, key2, key3, payload)]
    return [a[:n] for a in arrs]
