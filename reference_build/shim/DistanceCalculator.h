// Shim: Levenshtein distance (used for "did you mean" flag suggestions).
#ifndef SHIM_DISTANCECALCULATOR_H
#define SHIM_DISTANCECALCULATOR_H

#include <algorithm>
#include <string>
#include <vector>

class DistanceCalculator {
public:
    static int localLevenshteinDistance(const std::string &a,
                                        const std::string &b) {
        size_t n = a.size(), m = b.size();
        std::vector<int> prev(m + 1), cur(m + 1);
        for (size_t j = 0; j <= m; ++j) prev[j] = (int)j;
        for (size_t i = 1; i <= n; ++i) {
            cur[0] = (int)i;
            for (size_t j = 1; j <= m; ++j) {
                int cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
                cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + cost});
            }
            std::swap(prev, cur);
        }
        return prev[m];
    }
};

#endif
