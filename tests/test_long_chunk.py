"""Long reads beyond the 64k row cap (VERDICT r1 item 9 / weak 5).

A 200 kb synthetic contig must classify IDENTICALLY through the chunked
long-read path and through one direct full-length device row (same
kernels, no chunking) — proving the chunk globalization (frame/pos
remap), ownership dedup, and end-trim filters are exact.  Previously the
tail beyond 65,536 bases was silently dropped.
"""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams, _bucket_len
from metabuli_work_tpu.classify.taxonomer import MATCH_DTYPE, sort_matches
from metabuli_work_tpu.index.builder import IndexBuilder
from tests.tests_helpers_tax import make_flat_tax

rng = np.random.default_rng(61)


@pytest.fixture(scope="module")
def long_setup():
    tax = make_flat_tax()
    g1 = "".join(rng.choice(list("ACGT"), 30000))
    g2 = "".join(rng.choice(list("ACGT"), 30000))
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    builder.add_sequence(g1, 3)
    builder.add_sequence(g2, 4)
    index = builder.finalize()

    # 200 kb contig: alternating segments of genome 1 and random filler,
    # with a few N's sprinkled near future chunk boundaries
    parts = []
    total = 0
    while total < 200_000:
        s = int(rng.integers(0, len(g1) - 5000))
        seg = g1[s:s + 5000]
        filler = "".join(rng.choice(list("ACGT"), 3000))
        parts.append(seg + filler)
        total += len(seg) + len(filler)
    contig = "".join(parts)[:200_011]   # length % 3 == 2 on purpose
    contig = contig[:49000] + "NNN" + contig[49003:]
    return index, contig


def _direct_whole_row(clf, seq):
    """One full-length device row through the same kernels (no chunking)."""
    import jax.numpy as jnp

    from metabuli_work_tpu.models.flagship import fused_step
    from metabuli_work_tpu.ops import compact_jax

    L = len(seq)
    lmax = _bucket_len(L)
    arr = np.full((1, lmax), ord("N"), np.uint8)
    arr[0, :L] = np.frombuffer(seq.encode(), np.uint8)
    r1, j1 = jnp.asarray(arr), jnp.asarray(np.array([L], np.int32))
    r2 = jnp.zeros((1, 96), jnp.uint8)
    j2 = jnp.zeros(1, jnp.int32)
    cap = clf.index.max_aa_run()
    packed, count, overflow = fused_step(
        r1, j1, r2, j2, clf.db_values, clf.db_taxids, clf.db_species,
        cap=cap, kmer_format=clf.kmer_format, syncmer=clf.syncmer,
        smer_len=clf.smer_len, paired=False, bucket_lo=clf.bucket_lo,
        db_aa_lo=clf.db_aa_lo, bucket_shift=clf.bucket_shift,
        bucket_steps=clf.bucket_steps)
    assert int(overflow) == 0
    m = compact_jax.decode_matches(
        compact_jax.fetch_compacted((packed, count)), MATCH_DTYPE)
    m = sort_matches(m)
    from metabuli_work_tpu.classify.pipeline import _max_covered

    qlens = np.array([0, int(_max_covered(np.array([L]))[0])], np.int64)
    return clf.taxonomer.classify_batch(m, qlens, 1)[0], len(m)


def test_chunked_long_read_equals_whole_row(long_setup):
    index, contig = long_setup
    params = ClassifyParams(seq_mode=3, min_score=0.005, min_sp_score=0.005,
                            batch_size=4)
    clf = Classifier.from_memory(index, params)

    want, n_matches = _direct_whole_row(clf, contig)
    assert n_matches > 1000, "contig must hit the index heavily"
    assert want.is_classified

    got = clf._classify_long_read("contig", contig)
    assert got.length1 == len(contig)
    r = got.result
    assert r.is_classified == want.is_classified
    assert r.classification == want.classification
    assert np.float32(r.score) == np.float32(want.score)
    assert getattr(r, "tax_cnt", None) == getattr(want, "tax_cnt", None)


def test_classify_file_no_silent_truncation(long_setup, tmp_path):
    """classify_file routes >64k reads through the chunk path; the
    reported query length is the TRUE length."""
    index, contig = long_setup
    reads = tmp_path / "long.fna"
    with open(reads, "w") as f:
        f.write(f">short\n{contig[:1500]}\n")
        f.write(f">giant\n{contig}\n")
    params = ClassifyParams(seq_mode=3, min_score=0.005, min_sp_score=0.005,
                            batch_size=4)
    clf = Classifier.from_memory(index, params)
    results = clf.classify_file(str(reads))
    assert len(results) == 2
    by_name = {q.name: q for q in results}
    assert by_name["giant"].length1 == len(contig)
    assert by_name["giant"].result.is_classified
    want, _ = _direct_whole_row(clf, contig)
    assert by_name["giant"].result.classification == want.classification
    assert by_name["short"].result.is_classified
