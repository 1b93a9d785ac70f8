// Shim: command-table types matching the mmseqs Command interface.
#ifndef SHIM_COMMAND_H
#define SHIM_COMMAND_H

#include <vector>

struct MMseqsParameter;

// CITATION_SPACEPHARER is defined by LocalParameters.h as CITATION_END
const unsigned int CITATION_END = 1U << 0;

enum CommandMode {
    COMMAND_MAIN = 1,
    COMMAND_DATABASE_CREATION = 2,
    COMMAND_FORMAT_CONVERSION = 4,
    COMMAND_TAXONOMY = 8,
    COMMAND_EXPERT = 16,
    COMMAND_HIDDEN = 32,
};

struct DbValidator {
    static std::vector<int> empty;
    static std::vector<int> sequenceDb;
    static std::vector<int> directory;
    static std::vector<int> flatfile;
};

struct DbType {
    enum AccessMode {
        ACCESS_MODE_INPUT = 1,
        ACCESS_MODE_OUTPUT = 2,
    };
    enum SpecialType {
        NEED_DATA = 1,
        VARIADIC = 2,
        ZERO_OR_ALL = 4,
    };
    const char *usageText;
    int accessMode;
    int specialType;
    std::vector<int> *validator;
};

struct Command {
    const char *cmd;
    int (*commandFunction)(int, const char **, const Command &);
    std::vector<MMseqsParameter *> *params;
    int mode;
    const char *description;
    const char *longDescription;
    const char *author;
    const char *usage;
    unsigned int citations;
    std::vector<DbType> databases;
};

struct Categories {
    const char *title;
    int mode;
};

void registerCommands(std::vector<Command> *commands);

#endif
