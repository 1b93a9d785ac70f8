// Shim: tantan masking interface (Frith 2011).  Independent forward-HMM
// implementation (same algorithm family as native/tantan_mask.cpp in the
// TPU framework) behind the tantan::maskSequences signature.
#ifndef SHIM_TANTAN_H
#define SHIM_TANTAN_H

namespace tantan {

typedef unsigned char uchar;

void maskSequences(uchar *seqBeg, uchar *seqEnd, int maxRepeatOffset,
                   const double **likelihoodRatioMatrix, double repeatProb,
                   double repeatEndProb, double repeatOffsetProbDecay,
                   double firstGapProb, double otherGapProb,
                   double minMaskProb, const uchar *maskTable);

}  // namespace tantan

#endif
