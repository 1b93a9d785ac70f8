"""--mask 1 classify keeps the native reader (VERDICT r1 weak 7): the
array-row masking path must classify identically to the per-read string
masking path."""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import IndexBuilder
from tests.tests_helpers_tax import make_flat_tax

rng = np.random.default_rng(83)


def test_mask_batch_rows_matches_string_masker():
    from metabuli_work_tpu.ops import mask as mask_ops

    seqs = []
    for _ in range(6):
        s = "".join(rng.choice(list("ACGT"), 300))
        # plant a low-complexity repeat
        s = s[:100] + "ATATATATATATATATATATATATATATAT" + s[130:]
        seqs.append(s)
    lens = np.array([len(s) for s in seqs], np.int32)
    arr = np.full((len(seqs), 300), ord("N"), np.uint8)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s.encode(), np.uint8)
    got = mask_ops.mask_batch_rows(arr.copy(), lens, 0.9)
    for i, s in enumerate(seqs):
        want = mask_ops.mask_low_complexity(s, 0.9)
        assert got[i, :len(s)].tobytes().decode() == want
    # something actually masked
    assert (got == ord("N")).sum() > (arr == ord("N")).sum() or \
        not mask_ops._load_tantan()


def test_masked_classify_uses_native_and_matches(tmp_path, monkeypatch):
    from metabuli_work_tpu.io import native_reader

    if not native_reader.available():
        pytest.skip("native reader not built")

    tax = make_flat_tax()
    genome = "".join(rng.choice(list("ACGT"), 8000))
    # embed repeats so masking has an effect
    genome = genome[:2000] + "ACACACACACACACACACACACAC" * 4 + genome[2100:]
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    builder.add_sequence(genome, 3)
    index = builder.finalize()

    reads = tmp_path / "r.fna"
    with open(reads, "w") as f:
        for i in range(12):
            st = int(rng.integers(0, len(genome) - 150))
            f.write(f">r{i}\n{genome[st:st + 150]}\n")

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8, mask_mode=1)
    native = Classifier.from_memory(index, params).classify_file(str(reads))

    monkeypatch.setattr(native_reader, "available", lambda: False)
    python = Classifier.from_memory(index, params).classify_file(str(reads))

    assert len(native) == len(python) == 12
    for qn, qp in zip(native, python):
        rn, rp = qn.result, qp.result
        assert (qn.name, rn.is_classified) == (qp.name, rp.is_classified)
        if rn.is_classified:
            assert rn.classification == rp.classification
            assert np.float32(rn.score) == np.float32(rp.score)
