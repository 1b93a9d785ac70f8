"""Native tantan-HMM masker (native/tantan_mask.cpp).

Behavioral pins for the build-time repeat masking stage (reference
SeqIterator::maskLowComplexityRegions, src/commons/SeqIterator.cpp:
154-175): tandem repeats of short period get masked to 'N', random
sequence stays untouched.
"""

import numpy as np
import pytest

from metabuli_work_tpu.ops.mask import (
    mask_low_complexity,
    mask_low_complexity_tantan,
)


def _frac_masked(s, lo=None, hi=None):
    a = np.frombuffer(s.encode(), np.uint8)
    return float((a[lo:hi] == ord("N")).mean())


@pytest.fixture(scope="module")
def rand():
    rng = np.random.default_rng(3)
    return "".join(rng.choice(list("ACGT"), 4000))


def test_native_lib_builds(rand):
    assert mask_low_complexity_tantan(rand, 0.9) is not None


@pytest.mark.parametrize("unit,reps", [("AT", 150), ("A", 200),
                                       ("TTAGGG", 50), ("ACGTTGCA", 40)])
def test_tandem_repeats_masked(rand, unit, reps):
    rep = unit * reps
    seq = rand[:700] + rep + rand[700:1400]
    out = mask_low_complexity_tantan(seq, 0.9)
    assert _frac_masked(out, 700, 700 + len(rep)) > 0.9
    # flanks stay (allow small bleed at the junctions)
    assert _frac_masked(out, 0, 650) < 0.02
    assert _frac_masked(out, 750 + len(rep), None) < 0.02


def test_random_sequence_untouched(rand):
    out = mask_low_complexity_tantan(rand, 0.9)
    assert out == rand


def test_n_and_case_passthrough(rand):
    seq = rand[:100] + "NNNN" + rand[100:200].lower() + "at" * 120
    out = mask_low_complexity_tantan(seq, 0.9)
    assert out[100:104] == "NNNN"
    # lowercase random part survives as-is
    assert out[104:204] == rand[100:200].lower()
    # lowercase repeat still masked
    assert _frac_masked(out, 204, 204 + 240) > 0.9


def test_mask_prob_monotone(rand):
    seq = rand[:500] + "CAG" * 60 + rand[500:1000]
    hi = _frac_masked(mask_low_complexity_tantan(seq, 0.95))
    lo = _frac_masked(mask_low_complexity_tantan(seq, 0.5))
    assert lo >= hi


def test_default_masker_prefers_tantan(rand):
    seq = rand[:300] + "GT" * 100 + rand[300:600]
    assert mask_low_complexity(seq, 0.9) == \
        mask_low_complexity_tantan(seq, 0.9)
