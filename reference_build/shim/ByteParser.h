// Shim: human-readable byte-size parse/format (mmseqs ByteParser iface).
#ifndef SHIM_BYTEPARSER_H
#define SHIM_BYTEPARSER_H

#include <cctype>
#include <cstdlib>
#include <cstring>
#include <string>

class ByteParser {
public:
    static const size_t INVALID_SIZE = (size_t)-1;
    static const size_t TERABYTE = 1ULL << 40;
    static const size_t GIGABYTE = 1ULL << 30;
    static const size_t MEGABYTE = 1ULL << 20;
    static const size_t KILOBYTE = 1ULL << 10;

    static size_t parse(const std::string &s) {
        char *end = NULL;
        double v = strtod(s.c_str(), &end);
        if (end == s.c_str() || v < 0) {
            return INVALID_SIZE;
        }
        while (*end && isspace((unsigned char)*end)) ++end;
        size_t mult = 1;
        switch (toupper((unsigned char)*end)) {
            case 'T': mult = TERABYTE; break;
            case 'G': mult = GIGABYTE; break;
            case 'M': mult = MEGABYTE; break;
            case 'K': mult = KILOBYTE; break;
            case 'B': case '\0': mult = 1; break;
            default: return INVALID_SIZE;
        }
        return (size_t)(v * (double)mult);
    }

    static std::string format(size_t bytes, char unit = 'a',
                              char accuracy = 'l') {
        (void)accuracy;
        char buf[64];
        if (unit == 'a' || unit == 'h') {
            const char *suffix[] = {"B", "K", "M", "G", "T"};
            double v = (double)bytes;
            int i = 0;
            while (v >= 1024.0 && i < 4) {
                v /= 1024.0;
                ++i;
            }
            snprintf(buf, sizeof(buf), "%.3g%s", v, suffix[i]);
        } else {
            snprintf(buf, sizeof(buf), "%zu", bytes);
        }
        return std::string(buf);
    }
};

#endif
