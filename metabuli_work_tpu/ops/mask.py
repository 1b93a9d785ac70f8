"""Low-complexity masking (tantan-equivalent stage).

The reference masks repeats with tantan before k-mer extraction
(SeqIterator::maskLowComplexityRegions, src/commons/SeqIterator.cpp:161;
mask defaults: build on, classify off — workflow/build.cpp:21-22,
workflow/classify.cpp).  This module provides a vectorized DUST-style
masker: windows whose triplet-composition score exceeds a threshold are
replaced with 'N' so downstream extraction skips them.  It is a
behavioral stand-in, not a bit-exact tantan port — masked DBs therefore
differ from reference DBs in low-complexity regions (classify defaults
to mask off, so query-side parity is unaffected).
"""

import numpy as np

_WINDOW = 64
# DUST score threshold scaled from mask_prob: higher prob -> mask less.
_BASE_THRESHOLD = 2.0


def mask_low_complexity(seq: str, mask_prob: float = 0.9) -> str:
    n = len(seq)
    if n < _WINDOW:
        return seq
    arr = np.frombuffer(seq.upper().encode("ascii", "replace"), dtype=np.uint8)
    code = np.full(n, 255, dtype=np.uint8)
    for i, ch in enumerate(b"ACGT"):
        code[arr == ch] = i
    valid = code < 4

    # triplet ids over valid positions
    if n < 3:
        return seq
    t = code[:-2].astype(np.int32) * 16 + code[1:-1].astype(np.int32) * 4 + code[2:].astype(np.int32)
    t_valid = valid[:-2] & valid[1:-1] & valid[2:]
    t = np.where(t_valid, t, 64)

    # windowed triplet-count score: sum c*(c-1)/2 over 64 triplet types
    counts = np.zeros((65, n - 2), dtype=np.int32)
    onehot = np.zeros((65, n - 2), dtype=np.int32)
    onehot[t, np.arange(n - 2)] = 1
    np.cumsum(onehot, axis=1, out=counts)
    w = _WINDOW - 2
    if counts.shape[1] <= w:
        return seq
    win = counts[:64, w:] - counts[:64, :-w]
    score = (win * (win - 1) // 2).sum(axis=0) / max(w - 1, 1)

    thr = _BASE_THRESHOLD / max(1.0 - mask_prob, 0.05) * 0.5
    bad = score > thr
    if not bad.any():
        return seq
    mask = np.zeros(n, dtype=bool)
    idx = np.nonzero(bad)[0]
    for start in idx:
        mask[start : start + _WINDOW] = True
    out = arr.copy()
    out[mask] = ord("N")
    return out.tobytes().decode("ascii")
