// Shim: base command declarations (only `databases` is referenced).
#ifndef SHIM_COMMANDDECLARATIONS_H
#define SHIM_COMMANDDECLARATIONS_H

#include "Command.h"

extern int databases(int argc, const char **argv, const Command &command);

#endif
