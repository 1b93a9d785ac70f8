"""Persistent cache of the device-ready packed index layout.

Packing the resident index (pack_db_quad + pack_db_rows32 +
build_aa_hash) is a deterministic function of the sorted entry arrays
and the layout geometry, but costs ~2 minutes of single-core numpy at
the 100M-kmer scale — paid on EVERY process start (bench, CLI classify,
tests) even though the DB never changed.  The reference amortizes the
analogous cost by writing its diffIdx/split files once at build time
(IndexCreator.cpp:782-866) and mmapping them at classify
(KmerMatcher.cpp:137-164); this module is the same move for the
TPU-side layout: pack once, mmap ever after.

Cache entries live under METABULI_PACK_CACHE (default
~/.cache/mwt_packed; set to "0" to disable), keyed by a blake2b of the
entry arrays + geometry, stored as plain .npy files so reloads are
mmap-backed (jnp.asarray streams pages straight into the transfer
buffer without a malloc'd copy).
"""

import hashlib
import json
import os
import tempfile

import numpy as np

LAYOUT_VERSION = 2    # bump on any packed-layout change (r5: unaligned rows)


def cache_root():
    env = os.environ.get("METABULI_PACK_CACHE")
    if env == "0":
        return None
    return env or os.path.join(os.path.expanduser("~/.cache"), "mwt_packed")


def _key(parts, geom: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(f"v{LAYOUT_VERSION}:{geom}".encode())
    for a in parts:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode() + str(a.shape).encode())
        h.update(memoryview(a))
    return h.hexdigest()


def load_or_pack_wide(values, db_ef, sp_euk, *, max_chain, max_bytes,
                      slots=42, row_u32=128):
    """Device-ready wide layout: (rows [R,128] u32, hash_table,
    log2_rows, chain, db_m) — from the cache when the same DB + geometry
    was packed before, else packed fresh and cached.

    Arrays returned from the cache are read-only mmaps; callers only
    ever feed them to jnp.asarray / device_put.
    """
    from ..ops.match_jax import build_aa_hash, pack_db_quad, pack_db_rows32

    geom = f"wide:{max_chain}:{max_bytes}:{slots}:{row_u32}"
    root = cache_root()
    entry = None
    if root is not None:
        key = _key((values, db_ef, sp_euk), geom)
        entry = os.path.join(root, key)
        meta_p = os.path.join(entry, "meta.json")
        if os.path.exists(meta_p):
            try:
                with open(meta_p) as f:
                    meta = json.load(f)
                rows = np.load(os.path.join(entry, "rows.npy"),
                               mmap_mode="r")
                ht = np.load(os.path.join(entry, "hash.npy"), mmap_mode="r")
                return (rows, ht, int(meta["log2_rows"]),
                        int(meta["chain"]), int(meta["db_m"]))
            except Exception:
                pass    # unreadable entry: fall through and re-pack

    rows = pack_db_rows32(pack_db_quad(values, db_ef, sp_euk))
    ht, log2_rows, chain = build_aa_hash(
        values, max_chain=max_chain, max_bytes=max_bytes,
        slots=slots, row_u32=row_u32)
    db_m = len(values)
    if entry is not None:
        try:
            os.makedirs(root, exist_ok=True)
            tmp = tempfile.mkdtemp(dir=root, prefix=".tmp_")
            np.save(os.path.join(tmp, "rows.npy"), rows)
            np.save(os.path.join(tmp, "hash.npy"), ht)
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump({"log2_rows": log2_rows, "chain": chain,
                           "db_m": db_m}, f)
            os.replace(tmp, entry)   # atomic publish; loser of a race loses
        except OSError:
            pass
    return rows, ht, log2_rows, chain, db_m
