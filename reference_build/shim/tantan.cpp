// Shim tantan implementation: forward-backward repeat HMM (Frith 2011)
// over the caller-provided likelihood-ratio matrix.  Masked positions
// are replaced through maskTable, matching the tantan contract that
// SeqIterator::maskLowComplexityRegions consumes.
#include "tantan.h"

#include <algorithm>
#include <cstdint>
#include <vector>

namespace tantan {

void maskSequences(uchar *seqBeg, uchar *seqEnd, int maxRepeatOffset,
                   const double **likelihoodRatioMatrix, double repeatProb,
                   double repeatEndProb, double repeatOffsetProbDecay,
                   double firstGapProb, double otherGapProb,
                   double minMaskProb, const uchar *maskTable) {
    (void)firstGapProb;
    (void)otherGapProb;
    const int64_t n = seqEnd - seqBeg;
    if (n <= 0) {
        return;
    }
    const int C = maxRepeatOffset;
    const double B2R = repeatProb;
    const double R2B = repeatEndProb;

    std::vector<double> b2r_d(C + 1, 0.0);
    {
        double norm = 0.0, w = 1.0;
        for (int d = 1; d <= C; ++d) {
            norm += w;
            w *= repeatOffsetProbDecay;
        }
        w = 1.0;
        for (int d = 1; d <= C; ++d) {
            b2r_d[d] = B2R * (w / norm);
            w *= repeatOffsetProbDecay;
        }
    }

    auto ratio = [&](int64_t i, int64_t j) -> double {
        // emission ratio of aligning seq[i] to seq[j] (both 0-based codes)
        return likelihoodRatioMatrix[seqBeg[i]][seqBeg[j]];
    };

    std::vector<double> fB(n + 1), scale(n + 1);
    std::vector<double> fr((size_t)(n + 1) * (C + 1), 0.0);
    fB[0] = 1.0;
    scale[0] = 1.0;
    for (int64_t i = 1; i <= n; ++i) {
        double *prev = &fr[(size_t)(i - 1) * (C + 1)];
        double *cur = &fr[(size_t)i * (C + 1)];
        double sum_prev_r = 0.0;
        for (int d = 1; d <= C; ++d) sum_prev_r += prev[d];
        double b = fB[i - 1] * (1.0 - B2R) + sum_prev_r * R2B;
        double tot = b;
        for (int d = 1; d <= C; ++d) {
            double e = (i - 1 - d >= 0) ? ratio(i - 1, i - 1 - d) : 0.0;
            double v = (fB[i - 1] * b2r_d[d] + prev[d] * (1.0 - R2B)) * e;
            cur[d] = v;
            tot += v;
        }
        if (tot <= 0.0) tot = 1e-300;
        fB[i] = b / tot;
        for (int d = 1; d <= C; ++d) cur[d] /= tot;
        scale[i] = tot;
    }

    std::vector<uchar> mask(n, 0);
    std::vector<double> bB(n + 1);
    std::vector<double> br(C + 1, 0.0), br_next(C + 1, 0.0);
    bB[n] = 1.0;
    for (int d = 1; d <= C; ++d) br[d] = 1.0;
    for (int64_t i = n; i >= 1; --i) {
        double *fi = &fr[(size_t)i * (C + 1)];
        double num = 0.0;
        for (int d = 1; d <= C; ++d) num += fi[d] * br[d];
        double den = fB[i] * bB[i] + num;
        if (den > 0.0 && num / den > minMaskProb) {
            mask[i - 1] = 1;
        }
        if (i == 1) break;
        double rsum = 0.0;
        for (int d = 1; d <= C; ++d) {
            double e = (i - 1 - d >= 0) ? ratio(i - 1, i - 1 - d) : 0.0;
            br_next[d] = R2B * bB[i] + (1.0 - R2B) * br[d] * e;
            rsum += b2r_d[d] * e * br[d];
        }
        double bprev = (1.0 - B2R) * bB[i] + rsum;
        bB[i - 1] = bprev / scale[i];
        for (int d = 1; d <= C; ++d) br[d] = br_next[d] / scale[i];
    }

    for (int64_t i = 0; i < n; ++i) {
        if (mask[i]) {
            seqBeg[i] = maskTable[seqBeg[i]];
        }
    }
}

}  // namespace tantan
