// Shim: math helpers matching the mmseqs MathUtil interface.
#ifndef SHIM_MATHUTIL_H
#define SHIM_MATHUTIL_H

#include <cmath>
#include <cstddef>

class MathUtil {
public:
    static inline unsigned int flog2(unsigned int v) {
        unsigned int r = 0;
        while (v >>= 1) {
            ++r;
        }
        return r;
    }

    static inline unsigned int flog2(size_t v) {
        unsigned int r = 0;
        while (v >>= 1) {
            ++r;
        }
        return r;
    }
    static inline double flog2(double x) { return log2(x); }
    static inline float flog2(float x) { return log2f(x); }

    static inline size_t ceilIntDivision(size_t a, size_t b) {
        return (a + b - 1) / b;
    }
};

#endif
