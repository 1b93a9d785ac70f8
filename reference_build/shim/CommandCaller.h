// Shim: sub-command invocation helper (call depth only; Metabuli does
// not spawn nested commands through it).
#ifndef SHIM_COMMANDCALLER_H
#define SHIM_COMMANDCALLER_H

class CommandCaller {
public:
    static int getCallDepth() { return 0; }
};

#endif
