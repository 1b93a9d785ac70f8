// Tantan-style tandem-repeat masking (the reference's build-time masker).
//
// The reference masks low-complexity/repeat regions with tantan before
// k-mer extraction (SeqIterator::maskLowComplexityRegions,
// src/commons/SeqIterator.cpp:154-175), with fixed options
//   maxCycleLength=50, repeatProb=0.005, repeatEndProb=0.05,
//   repeatOffsetProbDecay=0.9, endGapProb=0, minMaskProb=<mask_prob>.
// This is an independent implementation of the tantan algorithm
// (Frith 2011, "A new repeat-masking method enables specific detection
// of homologous sequences"): a forward-backward pass over an HMM with a
// background state and one repeat state per cycle offset d=1..C, where
// the repeat state at position i emits with likelihood ratio
// r(x_i, x_{i-d}); positions whose posterior repeat probability exceeds
// minMaskProb are masked.  The vendored tantan source is not present in
// the reference snapshot (empty mmseqs submodule), so the DNA
// likelihood-ratio matrix is derived from the standard +1/-1 nucleotide
// model at its ungapped lambda: with uniform base frequencies,
// sum_ab p_a p_b e^{lambda*s_ab} = 1 gives e^lambda = 3, i.e. ratio 3
// for a match and 1/3 for a mismatch ('N' scores ratio 0 -> never part
// of a repeat).
//
// Long sequences are processed in overlapping chunks (the HMM's memory
// is a few hundred bases at these transition probabilities), keeping
// the O(C * chunk) state affordable for whole genomes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int C = 50;                  // maxCycleLength
constexpr double B2R = 0.005;          // repeatProb
constexpr double R2B = 0.05;           // repeatEndProb
constexpr double DECAY = 0.9;          // repeatOffsetProbDecay
constexpr double MATCH_RATIO = 3.0;    // e^lambda, +1/-1 uniform model
constexpr double MISMATCH_RATIO = 1.0 / 3.0;

constexpr int64_t CHUNK = 1 << 20;     // bases per chunk
constexpr int64_t OVERLAP = 2048;      // chunk overlap (posterior guard)

// likelihood ratio between two 2-bit codes (4 = N/invalid)
inline double ratio(uint8_t a, uint8_t b) {
    if (a > 3 || b > 3) return 0.0;
    return a == b ? MATCH_RATIO : MISMATCH_RATIO;
}

void mask_chunk(const uint8_t *code, int64_t n, double min_mask_prob,
                uint8_t *repeat_mask) {
    // offset priors: p_d proportional to DECAY^(d-1).  Built via a
    // C++11 thread-safe static initializer — the previous lazy
    // `if (!init)` fill raced between chunk workers (caught by the
    // tests/test_native_sanitizers.py TSan gate).
    struct OffsetPrior { double v[C + 1]; };
    static const OffsetPrior b2r_prior = [] {
        OffsetPrior p{};
        double norm = 0.0, w = 1.0;
        for (int d = 1; d <= C; ++d) { norm += w; w *= DECAY; }
        w = 1.0;
        for (int d = 1; d <= C; ++d) { p.v[d] = B2R * (w / norm); w *= DECAY; }
        return p;
    }();
    const double *b2r_d = b2r_prior.v;

    // forward pass, scaled per position; the repeat states are stored
    // fully (C doubles per position — affordable because of chunking)
    // so the backward pass can form posteriors
    std::vector<double> fB(n + 1), scale(n + 1);
    std::vector<double> fr(static_cast<size_t>(n + 1) * (C + 1), 0.0);

    fB[0] = 1.0;
    scale[0] = 1.0;
    for (int64_t i = 1; i <= n; ++i) {
        double *prev = &fr[static_cast<size_t>(i - 1) * (C + 1)];
        double *cur = &fr[static_cast<size_t>(i) * (C + 1)];
        double sum_prev_r = 0.0;
        for (int d = 1; d <= C; ++d) sum_prev_r += prev[d];
        double b = fB[i - 1] * (1.0 - B2R) + sum_prev_r * R2B;
        double tot = b;
        uint8_t xi = code[i - 1];
        for (int d = 1; d <= C; ++d) {
            double e = (i - 1 - d >= 0) ? ratio(xi, code[i - 1 - d]) : 0.0;
            double v = (fB[i - 1] * b2r_d[d] + prev[d] * (1.0 - R2B)) * e;
            cur[d] = v;
            tot += v;
        }
        if (tot <= 0.0) tot = 1e-300;
        fB[i] = b / tot;
        for (int d = 1; d <= C; ++d) cur[d] /= tot;
        scale[i] = tot;
    }

    // backward pass (same scaling); posterior repeat prob at position i
    // (1-based state index) = sum_d fR_d(i) bR_d(i) / sum_all f*b
    std::vector<double> bB(n + 1);
    std::vector<double> br(static_cast<size_t>(C + 1), 0.0);
    std::vector<double> br_next(static_cast<size_t>(C + 1), 0.0);
    bB[n] = 1.0;
    for (int d = 1; d <= C; ++d) br[d] = 1.0;
    for (int64_t i = n; i >= 1; --i) {
        // posterior at i using f(i) and current b(i)
        double *fi = &fr[static_cast<size_t>(i) * (C + 1)];
        double num = 0.0;
        for (int d = 1; d <= C; ++d) num += fi[d] * br[d];
        double den = fB[i] * bB[i] + num;
        if (den > 0.0 && num / den > min_mask_prob) repeat_mask[i - 1] = 1;
        if (i == 1) break;
        // step backward to i-1
        uint8_t xi = code[i - 1];
        double rsum = 0.0;
        for (int d = 1; d <= C; ++d) {
            double e = (i - 1 - d >= 0) ? ratio(xi, code[i - 1 - d]) : 0.0;
            br_next[d] = (R2B * bB[i] + (1.0 - R2B) * br[d] * e);
            rsum += b2r_d[d] * e * br[d];
        }
        // b_B(i-1) = (1-B2R)*b_B(i) + sum_d B2R*p_d*e_d(i)*b_Rd(i)
        double bprev = (1.0 - B2R) * bB[i] + rsum;
        bB[i - 1] = bprev / scale[i];
        for (int d = 1; d <= C; ++d) br[d] = br_next[d] / scale[i];
    }
}

}  // namespace

extern "C" {

// seq: ASCII bases, modified IN PLACE (masked positions -> 'N').
void tantan_mask(uint8_t *seq, int64_t n, double min_mask_prob) {
    if (n <= 0) return;
    std::vector<uint8_t> code(n);
    for (int64_t i = 0; i < n; ++i) {
        uint8_t v = seq[i] | 0x20;
        switch (v) {
            case 'a': code[i] = 0; break;
            case 'c': code[i] = 1; break;
            case 'g': code[i] = 2; break;
            case 't': case 'u': code[i] = 3; break;  // U==T (shim aa2num)
            default: code[i] = 4; break;
        }
    }
    std::vector<uint8_t> mask(n, 0);
    int64_t n_chunks = (n + CHUNK - 1) / CHUNK;
    auto work = [&](int64_t ci) {
        int64_t start = ci * CHUNK;
        int64_t lo = start == 0 ? 0 : start - OVERLAP;
        int64_t hi = std::min(n, start + CHUNK + OVERLAP);
        std::vector<uint8_t> m(hi - lo, 0);
        mask_chunk(code.data() + lo, hi - lo, min_mask_prob, m.data());
        int64_t use_lo = start, use_hi = std::min(n, start + CHUNK);
        for (int64_t i = use_lo; i < use_hi; ++i)
            mask[i] |= m[i - lo];
    };
    if (n_chunks > 1) {
        // chunks are independent (overlap regions are recomputed, and
        // each chunk writes only its own [start, start+CHUNK) span)
        unsigned hw = std::thread::hardware_concurrency();
        int64_t n_workers = std::min<int64_t>(n_chunks, hw ? hw : 4);
        std::atomic<int64_t> next(0);
        std::vector<std::thread> ts;
        for (int64_t w = 0; w < n_workers; ++w)
            ts.emplace_back([&] {
                for (int64_t ci; (ci = next.fetch_add(1)) < n_chunks;)
                    work(ci);
            });
        for (auto &t : ts) t.join();
    } else {
        work(0);
    }
    for (int64_t i = 0; i < n; ++i)
        if (mask[i]) seq[i] = 'N';
}

}
