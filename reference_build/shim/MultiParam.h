// Shim: MultiParam/NuclAA/SeqProf/PseudoCounts value types (mmseqs iface).
#ifndef SHIM_MULTIPARAM_H
#define SHIM_MULTIPARAM_H

#include <cfloat>
#include <climits>
#include <cstdlib>
#include <cstring>
#include <string>

template <typename T>
struct NuclAA {
    T first;    // amino acid
    T second;   // nucleotide

    NuclAA() : first(T()), second(T()) {}
    explicit NuclAA(const T &val) : first(val), second(val) {}
    NuclAA(const T &aa, const T &nucl) : first(aa), second(nucl) {}

    const T &aminoacid() const { return first; }
    const T &nucleotide() const { return second; }
    void aminoacid(const T &v) { first = v; }
    void nucleotide(const T &v) { second = v; }

    bool operator==(const NuclAA<T> &o) const {
        return first == o.first && second == o.second;
    }
};

template <typename T>
struct SeqProf {
    T first;    // sequence
    T second;   // profile
    SeqProf() : first(T()), second(T()) {}
    explicit SeqProf(const T &val) : first(val), second(val) {}
    SeqProf(const T &seq, const T &prof) : first(seq), second(prof) {}
};

struct PseudoCounts {
    float first;
    float second;
    PseudoCounts() : first(0), second(0) {}
    PseudoCounts(float a, float b) : first(a), second(b) {}
};

namespace shim_multiparam {
inline std::string invalidOf(const std::string *) { return "INVALID"; }
inline int invalidOf(const int *) { return INT_MAX; }
inline float invalidOf(const float *) { return FLT_MAX; }

template <typename T>
T parseScalar(const std::string &s, bool *ok);

template <>
inline std::string parseScalar<std::string>(const std::string &s, bool *ok) {
    *ok = !s.empty();
    return s;
}
template <>
inline int parseScalar<int>(const std::string &s, bool *ok) {
    char *end = NULL;
    long v = strtol(s.c_str(), &end, 10);
    *ok = end != s.c_str() && *end == '\0';
    return (int)v;
}
template <>
inline float parseScalar<float>(const std::string &s, bool *ok) {
    char *end = NULL;
    float v = strtof(s.c_str(), &end);
    *ok = end != s.c_str() && *end == '\0';
    return v;
}
}  // namespace shim_multiparam

template <typename T>
struct MultiParam {
    T values;

    MultiParam() {}
    explicit MultiParam(const T &v) : values(v) {}
    MultiParam &operator=(const T &v) {
        values = v;
        return *this;
    }

    // parse "aa:X,nucl:Y" (either order) or a single shared value
    explicit MultiParam(const char *parametercstring);

    static std::string format(const MultiParam<T> &p) {
        return format_nuclaa_like(p.values);
    }
};

template <typename V>
inline std::string format_scalar(const V &v) { return std::to_string(v); }
inline std::string format_scalar(const std::string &v) { return v; }

template <typename V>
inline std::string format_nuclaa_like(const NuclAA<V> &v) {
    if (format_scalar(v.first) == format_scalar(v.second)) {
        return format_scalar(v.first);
    }
    return "aa:" + format_scalar(v.first) + ",nucl:" + format_scalar(v.second);
}
template <typename V>
inline std::string format_nuclaa_like(const SeqProf<V> &v) {
    return format_scalar(v.first);
}
inline std::string format_nuclaa_like(const PseudoCounts &v) {
    return format_scalar(v.first);
}

template <typename T>
inline MultiParam<T>::MultiParam(const char *parametercstring) {
    values = T(parse_nuclaa_like(parametercstring, (T *)NULL));
}

template <typename V>
inline NuclAA<V> parse_nuclaa_like(const char *str, NuclAA<V> *) {
    using shim_multiparam::invalidOf;
    using shim_multiparam::parseScalar;
    std::string s(str);
    V invalid = invalidOf((V *)NULL);
    NuclAA<V> out(invalid, invalid);
    size_t aaPos = s.find("aa:");
    size_t nuclPos = s.find("nucl:");
    bool ok = false;
    if (aaPos != std::string::npos && nuclPos != std::string::npos) {
        size_t aaEnd = s.find(',', aaPos);
        std::string aaVal = s.substr(aaPos + 3,
                                     (aaEnd == std::string::npos
                                          ? s.size()
                                          : aaEnd) - (aaPos + 3));
        size_t nuclEnd = s.find(',', nuclPos);
        std::string nuclVal = s.substr(nuclPos + 5,
                                       (nuclEnd == std::string::npos
                                            ? s.size()
                                            : nuclEnd) - (nuclPos + 5));
        bool ok1, ok2;
        V a = parseScalar<V>(aaVal, &ok1);
        V n = parseScalar<V>(nuclVal, &ok2);
        if (ok1 && ok2) {
            out.first = a;
            out.second = n;
        }
        (void)ok;
    } else {
        V v = parseScalar<V>(s, &ok);
        if (ok) {
            out.first = v;
            out.second = v;
        }
    }
    return out;
}

template <typename V>
inline SeqProf<V> parse_nuclaa_like(const char *str, SeqProf<V> *) {
    using shim_multiparam::parseScalar;
    bool ok = false;
    V v = parseScalar<V>(std::string(str), &ok);
    return SeqProf<V>(v);
}

inline PseudoCounts parse_nuclaa_like(const char *str, PseudoCounts *) {
    using shim_multiparam::parseScalar;
    bool ok = false;
    float v = parseScalar<float>(std::string(str), &ok);
    if (!ok) {
        return PseudoCounts(FLT_MAX, FLT_MAX);
    }
    return PseudoCounts(v, v);
}

#endif
