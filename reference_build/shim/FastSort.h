// Shim: parallel-sort macros (mmseqs uses ips4o; std sort + GNU parallel
// mode where available is behavior-identical for the strict weak orders
// Metabuli passes — only wall-clock differs).
#ifndef SHIM_FASTSORT_H
#define SHIM_FASTSORT_H

#include <algorithm>

#if defined(_OPENMP) && defined(__GNUC__)
#include <parallel/algorithm>
#define SORT_PARALLEL(...) __gnu_parallel::sort(__VA_ARGS__)
#else
#define SORT_PARALLEL(...) std::sort(__VA_ARGS__)
#endif
#define SORT_SERIAL(...) std::sort(__VA_ARGS__)

#endif
