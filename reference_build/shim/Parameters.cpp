// Shim Parameters base implementation.  NOTE: this file is textually
// #include'd by the reference's LocalParameters.cpp (mmseqs convention),
// so it must not be compiled as a separate translation unit.
#include "Parameters.h"

#include <unistd.h>

#include <cstdio>
#include <cstdlib>

#include "Debug.h"

Parameters *Parameters::instance = NULL;

Parameters::Parameters()
    : restArgv(NULL),
      restArgc(0),
      PARAM_THREADS(PARAM_THREADS_ID, "--threads",
                    "Threads", "Number of CPU-cores used (all by default)",
                    typeid(int), (void *)&threads, "^[1-9]{1}[0-9]*$"),
      PARAM_V(PARAM_V_ID, "-v", "Verbosity",
              "Verbosity level: 0: quiet, 1: +errors, 2: +warnings, 3: +info",
              typeid(int), (void *)&verbosity, "^[0-3]{1}$"),
      PARAM_HELP(PARAM_HELP_ID, "-h", "Help", "Show help",
                 typeid(bool), (void *)&help, ""),
      PARAM_HELP_LONG(PARAM_HELP_LONG_ID, "--help", "Help", "Show help",
                      typeid(bool), (void *)&help, ""),
      PARAM_SUB_MAT(PARAM_SUB_MAT_ID, "--sub-mat", "Substitution matrix",
                    "Substitution matrix file",
                    typeid(MultiParam<NuclAA<std::string>>),
                    (void *)&scoringMatrixFile, "^.*$"),
      PARAM_SEED_SUB_MAT(PARAM_SEED_SUB_MAT_ID, "--seed-sub-mat",
                         "Seed substitution matrix",
                         "Substitution matrix file for k-mer generation",
                         typeid(MultiParam<NuclAA<std::string>>),
                         (void *)&seedScoringMatrixFile, "^.*$"),
      PARAM_MASK_RESIDUES(PARAM_MASK_RESIDUES_ID, "--mask", "Mask residues",
                          "Mask sequences in k-mer stage: 0: w/o low "
                          "complexity masking, 1: with low complexity masking",
                          typeid(int), (void *)&maskMode, "^[0-1]{1}$"),
      PARAM_MASK_PROBABILTY(PARAM_MASK_PROBABILTY_ID, "--mask-prob",
                            "Mask residues probability",
                            "Mask sequences if probability is above threshold",
                            typeid(float), (void *)&maskProb,
                            "^0(\\.[0-9]+)?|1(\\.0+)?$") {
    long cores = sysconf(_SC_NPROCESSORS_ONLN);
    threads = cores > 0 ? (int)cores : 1;
    verbosity = Debug::INFO;
    compressed = false;
    maskMode = 0;
    maskProb = 0.9f;
    scoringMatrixFile = NuclAA<std::string>("blosum62.out", "nucleotide.out");
    seedScoringMatrixFile = NuclAA<std::string>("blosum62.out",
                                                "nucleotide.out");
    help = false;
    instance = this;
}

void Parameters::compileRegex(regex_t *regex, const char *regexText) {
    int status = regcomp(regex, regexText, REG_EXTENDED | REG_NEWLINE);
    if (status != 0) {
        Debug(Debug::ERROR) << "Error in regex " << regexText << "\n";
        EXIT(EXIT_FAILURE);
    }
}

bool Parameters::parseBool(const std::string &p) {
    if (p == "true" || p == "TRUE" || p == "1") {
        return true;
    } else if (p == "false" || p == "FALSE" || p == "0") {
        return false;
    }
    Debug(Debug::ERROR) << "Invalid boolean string " << p << "\n";
    EXIT(EXIT_FAILURE);
    return false;
}

void Parameters::printUsageMessage(const Command &command,
                                   unsigned int outputFlags,
                                   const char *extraText) {
    (void)outputFlags;
    (void)extraText;
    Debug(Debug::INFO) << "Usage: metabuli " << command.cmd << " "
                       << (command.usage ? command.usage : "") << "\n\n"
                       << (command.description ? command.description : "")
                       << "\n\nOptions:\n";
    if (command.params != NULL) {
        for (size_t i = 0; i < command.params->size(); ++i) {
            const MMseqsParameter *p = (*command.params)[i];
            if (p->category & MMseqsParameter::COMMAND_HIDDEN) {
                continue;
            }
            char line[1024];
            snprintf(line, sizeof(line), "  %-25s %s\n", p->name, p->display);
            Debug(Debug::INFO) << line;
        }
    }
}

void Parameters::checkIfDatabaseIsValid(const Command &command, int argc,
                                        const char *pargv[], bool isStartVar,
                                        bool isMiddleVar, bool isEndVar) {
    // Metabuli's workflows validate their own inputs; the mmseqs
    // db-registry checks do not apply to flat files/directories here.
    (void)command; (void)argc; (void)pargv;
    (void)isStartVar; (void)isMiddleVar; (void)isEndVar;
}

void Parameters::initMatrices() {}

void Parameters::printParameters(const std::string &module, int argc,
                                 const char *pargv[],
                                 const std::vector<MMseqsParameter *> &par) {
    (void)module; (void)argc; (void)pargv; (void)par;
}

void Parameters::parseParameters(int argc, const char *pargv[],
                                 const Command &command, bool printPar,
                                 int parseFlags, int outputFlags) {
    // the derived LocalParameters::parseParameters is the real parser
    (void)argc; (void)pargv; (void)command; (void)printPar;
    (void)parseFlags; (void)outputFlags;
    Debug(Debug::ERROR) << "Base parseParameters should not be called\n";
    EXIT(EXIT_FAILURE);
}
