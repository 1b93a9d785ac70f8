"""Encoding tests: numpy oracle vs naive scalar oracle vs JAX batch kernel."""

import numpy as np
import pytest

from metabuli_work_tpu.ops import encode_np
from metabuli_work_tpu.ops.genetic_code import (
    CODON2AA,
    CODON2NUM,
    NUC_CODE,
    max_covered_length,
    query_kmer_count,
)

from naive_oracle import naive_six_frames, naive_syncmer_keep

rng = np.random.default_rng(42)


def random_seq(n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return "".join(rng.choice(list(alpha), size=n, p=p))


def test_nuc_codes():
    assert NUC_CODE[ord("A")] == 0
    assert NUC_CODE[ord("C")] == 1
    assert NUC_CODE[ord("T")] == 2
    assert NUC_CODE[ord("G")] == 3
    assert NUC_CODE[ord("N")] == 7
    assert NUC_CODE[ord("a")] == 0
    assert NUC_CODE[ord(".")] == 7  # invalid behaves like N


def test_codon_tables_cover_all():
    # all 64 ACGT codons valid, unique ordinal within an AA
    seen = {}
    for i0 in range(4):
        for i1 in range(4):
            for i2 in range(4):
                idx = (i0 << 6) | (i1 << 3) | i2
                aa, num = CODON2AA[idx], CODON2NUM[idx]
                assert aa <= 20
                key = (int(aa), int(num))
                assert key not in seen, f"duplicate (aa, ordinal) {key}"
                seen[key] = idx
    assert len(seen) == 64


def test_max_covered():
    assert int(max_covered_length(150)) == 147  # 150%3==0 -> L-3
    assert int(max_covered_length(151)) == 147
    assert int(max_covered_length(152)) == 150
    assert int(query_kmer_count(150)) == (147 // 3 - 7) * 6


@pytest.mark.parametrize("with_n", [False, True])
@pytest.mark.parametrize("length", [24, 60, 149, 150, 151, 152, 313])
def test_numpy_vs_naive(length, with_n):
    seq = random_seq(length, with_n)
    kmers, pos, frames = encode_np.extract_query_kmers(seq)
    got = sorted(zip(kmers.tolist(), pos.tolist(), frames.tolist()))
    want = sorted(naive_six_frames(seq))
    assert got == want


def test_numpy_vs_naive_many_random():
    for _ in range(20):
        length = int(rng.integers(24, 400))
        seq = random_seq(length, with_n=True)
        kmers, pos, frames = encode_np.extract_query_kmers(seq)
        got = sorted(zip(kmers.tolist(), pos.tolist(), frames.tolist()))
        want = sorted(naive_six_frames(seq))
        assert got == want


def test_syncmer_mask_against_naive():
    # check the anchor rule in isolation per frame
    from metabuli_work_tpu.ops.encode_np import scan_frame
    from metabuli_work_tpu.ops.genetic_code import seq_to_codes

    seq = random_seq(300)
    codes = seq_to_codes(seq)
    used = int(encode_np.max_covered_length(len(seq)))
    full = scan_frame(codes, 0, used, True, syncmer=False)
    sync = scan_frame(codes, 0, used, True, syncmer=True, smer_len=5)
    # derive AA ids of frame 0
    from metabuli_work_tpu.ops.encode_np import codon_indices
    from metabuli_work_tpu.ops.genetic_code import CODON2AA as C2A

    aa = C2A[codon_indices(codes, 0, used // 3)]
    keep = naive_syncmer_keep([int(a) for a in aa])
    expected = full.kmers[np.array(keep, dtype=bool)[: len(full.kmers)]]
    # no Ns in this sequence so windows line up 1:1
    assert np.array_equal(sync.kmers, expected)
    assert len(sync.kmers) < len(full.kmers)


def test_jax_batch_matches_numpy():
    import jax.numpy as jnp

    from metabuli_work_tpu.ops import encode_jax

    lengths = [24, 80, 150, 151, 152, 200]
    seqs = [random_seq(L, with_n=True) for L in lengths]
    lmax = 240
    arr = np.full((len(seqs), lmax), ord("N"), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        b = s.encode()
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)

    kmers, pos, valid = encode_jax.extract_batch(jnp.asarray(arr), jnp.asarray(lens))
    kmers, pos, valid = np.asarray(kmers), np.asarray(pos), np.asarray(valid)

    for i, s in enumerate(seqs):
        want_k, want_p, want_f = encode_np.extract_query_kmers(s)
        want = sorted(zip(want_k.tolist(), want_p.tolist(), want_f.tolist()))
        got = []
        for f in range(6):
            sel = valid[i, f]
            got.extend(
                zip(kmers[i, f][sel].tolist(), pos[i, f][sel].tolist(), [f] * int(sel.sum()))
            )
        assert sorted(got) == want, f"read {i} len {len(s)}"


def test_jax_batch_syncmer_matches_numpy():
    import jax.numpy as jnp

    from metabuli_work_tpu.ops import encode_jax

    seqs = [random_seq(150, with_n=True) for _ in range(4)]
    lmax = 192
    arr = np.full((len(seqs), lmax), ord("N"), dtype=np.uint8)
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)

    kmers, pos, valid = encode_jax.extract_batch(
        jnp.asarray(arr), jnp.asarray(lens), syncmer=True, smer_len=5
    )
    kmers, pos, valid = np.asarray(kmers), np.asarray(pos), np.asarray(valid)
    for i, s in enumerate(seqs):
        want_k, want_p, want_f = encode_np.extract_query_kmers(s, syncmer=True, smer_len=5)
        want = sorted(zip(want_k.tolist(), want_p.tolist(), want_f.tolist()))
        got = []
        for f in range(6):
            sel = valid[i, f]
            got.extend(zip(kmers[i, f][sel].tolist(), pos[i, f][sel].tolist(), [f] * int(sel.sum())))
        assert sorted(got) == want
