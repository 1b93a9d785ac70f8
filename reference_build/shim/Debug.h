// Minimal mmseqs2-compatible shim layer, written from scratch against the
// interfaces the Metabuli reference sources consume (the mmseqs submodule
// is absent from the reference snapshot).  Only what Metabuli uses is
// implemented; behavior-neutral plumbing (logging, arg parsing, IO).
#ifndef SHIM_DEBUG_H
#define SHIM_DEBUG_H

#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>

#ifndef EXIT
#define EXIT(x) exit(x)
#endif

class Debug {
public:
    static const int NOTHING = 0;
    static const int ERROR = 1;
    static const int WARNING = 2;
    static const int INFO = 3;

    static int debugLevel;

    explicit Debug(int level) : level(level) {}

    template <typename T>
    Debug &operator<<(const T &t) {
        if (level <= debugLevel) {
            if (level == ERROR || level == WARNING) {
                std::cerr << t;
            } else {
                std::cout << t;
            }
        }
        return *this;
    }

    static void setDebugLevel(int level) { debugLevel = level; }

    class Progress {
    public:
        explicit Progress(size_t total = 0) : total(total), current(0) {}
        void updateProgress() { ++current; }
        void reset(size_t t) { total = t; current = 0; }
    private:
        size_t total, current;
    };

private:
    int level;
};

#endif
