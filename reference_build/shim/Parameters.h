// Shim: base Parameters class matching the mmseqs interface that
// Metabuli's LocalParameters extends (LocalParameters.cpp implements the
// actual arg parsing as an override; the base supplies the common
// parameter objects, the singleton, and small helpers).
#ifndef SHIM_PARAMETERS_H
#define SHIM_PARAMETERS_H

#include <regex.h>

#include <cstring>
#include <string>
#include <typeinfo>
#include <vector>

#include "Command.h"
#include "MultiParam.h"
#include "SubstitutionMatrix.h"
#include "Util.h"

#define PARAMETER(x) \
    static const int x##_ID = __COUNTER__; \
    MMseqsParameter x;

struct MMseqsParameter {
    const int uniqid;
    const char *name;
    const char *display;
    const char *description;
    const std::type_info &type;
    void *value;
    const char *regex;
    bool wasSet;
    int category;

    static const int COMMAND_PREFILTER = 1;
    static const int COMMAND_ALIGN = 2;
    static const int COMMAND_CLUST = 4;
    static const int COMMAND_COMMON = 8;
    static const int COMMAND_PROFILE = 16;
    static const int COMMAND_MISC = 32;
    static const int COMMAND_CLUSTLINEAR = 64;
    static const int COMMAND_EXPERT = 128;
    static const int COMMAND_HIDDEN = 256;

    MMseqsParameter(int uid, const char *n, const char *display,
                    const char *description, const std::type_info &type,
                    void *value, const char *regex,
                    int category = COMMAND_MISC)
        : uniqid(uid), name(n), display(display), description(description),
          type(type), value(value), regex(regex), wasSet(false),
          category(category) {}
};

struct MMseqsMPI {
    static bool isMaster() { return true; }
};

class Parameters {
public:
    static const int PARSE_VARIADIC = 1;
    static const int PARSE_REST = 2;
    static const int PARSE_ALLOW_EMPTY = 4;

    static const int DBTYPE_INDEX_DB = 7;

    Parameters();
    virtual ~Parameters() {}

    static Parameters &getInstance() { return *instance; }

    // ---- members Metabuli reads/writes ------------------------------ //
    int threads;
    int verbosity;
    bool compressed;
    bool help;

    std::vector<std::string> filenames;
    const char **restArgv;
    int restArgc;

    std::string db1, db1Index, db1dbtype, hdr1, hdr1Index, hdr1dbtype;
    std::string db2, db2Index, db2dbtype, hdr2, hdr2Index, hdr2dbtype;
    std::string db3, db3Index, db3dbtype, hdr3, hdr3Index, hdr3dbtype;
    std::string db4, db4Index, db4dbtype, hdr4, hdr4Index, hdr4dbtype;
    std::string db5, db5Index, db5dbtype, hdr5, hdr5Index, hdr5dbtype;
    std::string db6, db6Index, db6dbtype, hdr6, hdr6Index, hdr6dbtype;

    MultiParam<NuclAA<std::string>> scoringMatrixFile;
    MultiParam<NuclAA<std::string>> seedScoringMatrixFile;
    int maskMode;
    float maskProb;

    PARAMETER(PARAM_THREADS)
    PARAMETER(PARAM_V)
    PARAMETER(PARAM_HELP)
    PARAMETER(PARAM_HELP_LONG)
    PARAMETER(PARAM_SUB_MAT)
    PARAMETER(PARAM_SEED_SUB_MAT)
    PARAMETER(PARAM_MASK_RESIDUES)
    PARAMETER(PARAM_MASK_PROBABILTY)

    std::vector<MMseqsParameter *> databases;

    // ---- methods ----------------------------------------------------- //
    virtual void parseParameters(int argc, const char *pargv[],
                                 const Command &command, bool printPar,
                                 int parseFlags, int outputFlags);
    virtual void printParameters(const std::string &module, int argc,
                                 const char *pargv[],
                                 const std::vector<MMseqsParameter *> &par);
    void printUsageMessage(const Command &command,
                           unsigned int outputFlags,
                           const char *extraText = NULL);
    void checkIfDatabaseIsValid(const Command &command, int argc,
                                const char *pargv[], bool isStartVar,
                                bool isMiddleVar, bool isEndVar);
    void initMatrices();
    static void compileRegex(regex_t *regex, const char *regexText);
    static bool parseBool(const std::string &p);

protected:
    static Parameters *instance;
};

void initParameterSingleton();

struct KmerThreshold {
    int sequenceType;
    int kmerSize;
    float base;
    float perEntry;
};

struct DatabaseDownload {
    const char *name;
    const char *description;
    const char *citation;
    const char *url;
    bool hasTaxonomy;
    int dbType;
    const unsigned char *script;
    size_t scriptLength;
    std::vector<struct DbType> databases;
};

#endif
