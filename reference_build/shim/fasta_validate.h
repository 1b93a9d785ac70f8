// Shim: simple FASTA validator (lib/fasta_validator submodule is empty
// in the reference snapshot).  0 = valid, non-zero = invalid.
#ifndef SHIM_FASTA_VALIDATE_H
#define SHIM_FASTA_VALIDATE_H

#include <cstdio>
#include <cstring>

static inline int validate_fasta_file(const char *path, int verbose) {
    (void)verbose;
    FILE *f = fopen(path, "r");
    if (!f) {
        return 1;
    }
    int c = fgetc(f);
    // allow gzip (handled downstream by the reader)
    int ok = (c == '>' || c == 0x1f) ? 0 : 1;
    fclose(f);
    return ok;
}

#endif
