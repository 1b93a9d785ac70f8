// Shim: string/file helpers matching the mmseqs Util interface Metabuli uses.
#ifndef SHIM_UTIL_H
#define SHIM_UTIL_H

#include <algorithm>
#include <cctype>
#include <cstdlib>
#include <string>
#include <vector>

#include "FastSort.h"

#ifndef EXIT
#define EXIT(x) exit(x)
#endif

#ifndef SSTR
#define SSTR(x) std::to_string(x)
#endif

class Util {
public:
    static std::vector<std::string> split(const std::string &str,
                                          const std::string &sep) {
        std::vector<std::string> out;
        size_t start = 0;
        while (start < str.size()) {
            size_t pos = str.find(sep, start);
            if (pos == std::string::npos) {
                out.push_back(str.substr(start));
                return out;
            }
            if (pos > start) {
                out.push_back(str.substr(start, pos - start));
            }
            start = pos + sep.size();
        }
        return out;
    }

    static bool startWith(const std::string &prefix, const std::string &str,
                          size_t offset = 0) {
        if (str.size() < prefix.size() + offset) {
            return false;
        }
        return str.compare(offset, prefix.size(), prefix) == 0;
    }

    static bool endsWith(const std::string &suffix, const std::string &str) {
        if (str.size() < suffix.size()) {
            return false;
        }
        return str.compare(str.size() - suffix.size(), suffix.size(),
                           suffix) == 0;
    }

    static bool isNumber(const std::string &s) {
        if (s.empty()) {
            return false;
        }
        for (char c : s) {
            if (!isdigit((unsigned char)c)) {
                return false;
            }
        }
        return true;
    }

    static void checkAllocation(void *pointer, std::string message) {
        if (pointer == NULL) {
            fprintf(stderr, "%s\n", message.c_str());
            exit(EXIT_FAILURE);
        }
    }
};

std::string base64_decode(const char *data, size_t len);
std::string base64_encode(const char *data, size_t len);

#endif
