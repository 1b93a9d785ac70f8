// Native host-side scoring hot loops.
//
// combine_paths_batch: the greedy best-score-first path combination of
// the reference (combineMatchPaths, src/commons/Taxonomer.cpp:410-468,
// trimMatchPath :475-485), run over many (read, species) path runs at
// once.  The numpy-vectorized version pays ~10 us of dispatch overhead
// per masked round and needs K^2 rounds (K = max paths per run); this
// scalar loop does the same work in tens of nanoseconds per path.
//
// Float arithmetic is float (f32) with the exact accumulation order of
// the reference so scores stay bit-identical.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

const float INC[4] = {3.0f, 1.5f, 1.0f, 0.5f};  // 3.0 or 2.0 - 0.5*h

// Match::getScore partial sums used by trimMatchPath.
float right_part_score(int32_t rh, int32_t rng) {
    float s = 0.0f;
    for (int32_t i = 0; i < rng; ++i) s = s + INC[(rh >> (2 * i)) & 3];
    return s;
}

float left_part_score(int32_t rh, int32_t rng) {
    float s = 0.0f;
    for (int32_t i = 0; i < rng; ++i) s = s + INC[(rh >> (14 - 2 * i)) & 3];
    return s;
}

struct Path {
    int32_t start, end;
    float score;
    int32_t hamming;
    int32_t rh_start, rh_end;
};

}  // namespace

extern "C" {

// starts/cnts: per-run first index and count into the flat path arrays.
// out_total[r] = greedy combined score sum (NOT divided by read length).
void combine_paths_batch(
    int64_t n_runs, const int64_t* starts, const int64_t* cnts,
    const int32_t* pstart, const int32_t* pend, const float* pscore,
    const int32_t* pham, const int32_t* prhs, const int32_t* prhe,
    float* out_total) {
    std::vector<Path> run;
    std::vector<Path> combined;
    for (int64_t r = 0; r < n_runs; ++r) {
        const int64_t a = starts[r];
        const int64_t k = cnts[r];
        run.clear();
        run.reserve(k);
        for (int64_t j = a; j < a + k; ++j)
            run.push_back({pstart[j], pend[j], pscore[j], pham[j],
                           prhs[j], prhe[j]});
        // reference sort: (-score, hamming, -start); stable like py list.sort
        std::stable_sort(run.begin(), run.end(),
                         [](const Path& x, const Path& y) {
                             if (x.score != y.score) return x.score > y.score;
                             if (x.hamming != y.hamming)
                                 return x.hamming < y.hamming;
                             return x.start > y.start;
                         });
        combined.clear();
        float score = 0.0f;
        for (Path& p : run) {
            if (combined.empty()) {
                combined.push_back(p);
                score = score + p.score;
                continue;
            }
            bool overlapped = false;
            for (const Path& c : combined) {
                if (p.end < c.start || c.end < p.start) continue;
                const int32_t ov =
                    std::min(p.end, c.end) - std::max(p.start, c.start) + 1;
                if (ov == p.end - p.start + 1) {
                    overlapped = true;
                    break;
                }
                if (ov < 24) {  // trimMatchPath
                    if (p.start < c.start) {
                        p.end = c.start - 1;
                        p.score = p.score - right_part_score(p.rh_end, ov / 3)
                                  - (float)(ov % 3);
                    } else {
                        p.start = c.end + 1;
                        p.score = p.score - left_part_score(p.rh_start, ov / 3)
                                  - (float)(ov % 3);
                    }
                    continue;
                }
                overlapped = true;
                break;
            }
            if (!overlapped) {
                combined.push_back(p);
                score = score + p.score;
            }
        }
        out_total[r] = score;
    }
}

// Aggregate sorted-free (rid, taxid) pair counts: for n pairs, write the
// unique (rid, taxid) combinations and their multiplicities.  Used by the
// per-read tax_cnt build after the device redundancy kernel (one row per
// surviving position-quotient group).  Pairs need not be sorted; returns
// the number of unique combinations (<= n).
int64_t count_pairs(int64_t n, const int32_t* rid, const int32_t* tax,
                    int32_t* out_rid, int32_t* out_tax, int32_t* out_cnt) {
    std::vector<uint64_t> keys(n);
    for (int64_t i = 0; i < n; ++i)
        keys[i] = ((uint64_t)(uint32_t)rid[i] << 32) | (uint32_t)tax[i];
    std::sort(keys.begin(), keys.end());
    int64_t m = 0;
    for (int64_t i = 0; i < n;) {
        int64_t j = i;
        while (j < n && keys[j] == keys[i]) ++j;
        out_rid[m] = (int32_t)(keys[i] >> 32);
        out_tax[m] = (int32_t)(keys[i] & 0xFFFFFFFFu);
        out_cnt[m] = (int32_t)(j - i);
        ++m;
        i = j;
    }
    return m;
}

}  // extern "C"
