"""Min-hash strandness check (index/minhash.py) vs reference semantics
(SeqIterator::getMinHashList / compareMinHashList,
/root/reference/src/commons/SeqIterator.cpp:65-113)."""

import numpy as np
import pytest

from metabuli_work_tpu.index.minhash import (
    KMER_LEN, SKETCH_SIZE, minhash_sketch, minhash_similar, same_strand)

_RC = str.maketrans("ACGT", "TGCA")


def _rc(s):
    return s.translate(_RC)[::-1]


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_sketch_shape_and_determinism():
    rng = np.random.default_rng(0)
    s = _rand_seq(rng, 5000)
    sk = minhash_sketch(s)
    assert sk.dtype == np.uint64
    assert len(sk) <= SKETCH_SIZE
    assert (np.diff(sk.astype(np.uint64)) > 0).all()   # sorted unique
    assert np.array_equal(sk, minhash_sketch(s))


def test_sketch_short_sequence_empty():
    assert len(minhash_sketch("ACGT" * 5)) == 0        # < 24 nt
    assert len(minhash_sketch("A" * (KMER_LEN - 1))) == 0
    assert len(minhash_sketch("A" * KMER_LEN)) == 1


def test_same_sequence_similar():
    rng = np.random.default_rng(1)
    s = _rand_seq(rng, 20000)
    assert same_strand(s, s)


def test_reverse_complement_dissimilar():
    rng = np.random.default_rng(2)
    s = _rand_seq(rng, 20000)
    assert not same_strand(s, _rc(s))


def test_mutated_same_strand_still_similar():
    rng = np.random.default_rng(3)
    s = list(_rand_seq(rng, 20000))
    t = s.copy()
    mut = rng.random(len(t)) < 0.005    # 0.5% mutations
    for i in np.nonzero(mut)[0]:
        t[i] = rng.choice(list("ACGT"))
    assert same_strand("".join(s), "".join(t))


def test_unrelated_dissimilar():
    rng = np.random.default_rng(4)
    a = _rand_seq(rng, 20000)
    b = _rand_seq(rng, 20000)
    assert not same_strand(a, b)


def test_length_ratio_threshold():
    """compareMinHashList scales the threshold by len2/len1: a short
    exact substring of a long sequence still passes."""
    rng = np.random.default_rng(5)
    long = _rand_seq(rng, 30000)
    sub = long[1000:7000]
    sk_l = minhash_sketch(long)
    sk_s = minhash_sketch(sub)
    assert minhash_similar(sk_l, sk_s, len(long), len(sub))


def test_empty_inputs():
    e = np.zeros(0, dtype=np.uint64)
    assert not minhash_similar(e, e, 0, 0)
    assert not same_strand("", "ACGT" * 100)
