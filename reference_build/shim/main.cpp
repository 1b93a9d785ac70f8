// Shim entry point: command dispatch (mmseqs shell.cpp role).
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "Command.h"
#include "Debug.h"

extern const char *binary_name;
extern const char *tool_name;
extern const char *tool_introduction;
extern const char *version;
extern void (*initCommands)(void);
void initParameterSingleton();
std::vector<Command> *getRegisteredCommands();

static void printMainUsage() {
    std::cout << tool_name << " - " << tool_introduction << "\n"
              << "Version: " << version << "\n\nCommands:\n";
    std::vector<Command> *cmds = getRegisteredCommands();
    if (cmds != NULL) {
        for (size_t i = 0; i < cmds->size(); ++i) {
            if ((*cmds)[i].mode & COMMAND_HIDDEN) {
                continue;
            }
            printf("  %-28s %s\n", (*cmds)[i].cmd, (*cmds)[i].description);
        }
    }
}

int main(int argc, const char **argv) {
    // the parameter singleton is created during static init (MetabuliBase's
    // global localPar); creating another here would split the instance the
    // command tables point at from the one workflows read
    if (initCommands != NULL) {
        initCommands();
    }
    if (argc < 2) {
        printMainUsage();
        return EXIT_FAILURE;
    }
    std::string name(argv[1]);
    if (name == "-h" || name == "--help" || name == "version") {
        if (name == "version") {
            std::cout << version << "\n";
            return EXIT_SUCCESS;
        }
        printMainUsage();
        return EXIT_SUCCESS;
    }
    std::vector<Command> *cmds = getRegisteredCommands();
    if (cmds != NULL) {
        for (size_t i = 0; i < cmds->size(); ++i) {
            Command &c = (*cmds)[i];
            if (name == c.cmd) {
                return c.commandFunction(argc - 2, argv + 2, c);
            }
        }
    }
    Debug(Debug::ERROR) << "Unknown command " << name << "\n";
    printMainUsage();
    return EXIT_FAILURE;
}
