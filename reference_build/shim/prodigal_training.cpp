// Shim: Prodigal training.cpp replacement.  The reference snapshot lacks
// lib/prodigal/training.cpp (the ~5 MB metagenome training-data file),
// so meta-mode initializers are zero-filled stubs: single-genome
// training (trainASpecies) works fully; meta-mode predictions
// (sequences < 20/100 kb) would be meaningless and golden tests use
// --cds-info builds (IndexCreator.cpp:1088-1121) that never call these.
#include "training.h"

int write_training_file(char *fn, struct _training *tinf) {
    FILE *fh = fopen(fn, "wb");
    if (fh == NULL) return -1;
    size_t rv = fwrite(tinf, sizeof(struct _training), 1, fh);
    fclose(fh);
    return rv == 1 ? 0 : -1;
}

int read_training_file(char *fn, struct _training *tinf) {
    FILE *fh = fopen(fn, "rb");
    if (fh == NULL) return -1;
    size_t rv = fread(tinf, sizeof(struct _training), 1, fh);
    fclose(fh);
    return rv == 1 ? 0 : -1;
}

static void zero_training(struct _training *tinf) {
    memset(tinf, 0, sizeof(struct _training));
    tinf->trans_table = 11;
    tinf->gc = 0.5;
    tinf->st_wt = 4.35;
    tinf->uses_sd = 1;
}

#define META_STUB(n) \
    void initialize_metagenome_##n(struct _training *tinf) { \
        zero_training(tinf); \
    }

META_STUB(0) META_STUB(1) META_STUB(2) META_STUB(3) META_STUB(4)
META_STUB(5) META_STUB(6) META_STUB(7) META_STUB(8) META_STUB(9)
META_STUB(10) META_STUB(11) META_STUB(12) META_STUB(13) META_STUB(14)
META_STUB(15) META_STUB(16) META_STUB(17) META_STUB(18) META_STUB(19)
META_STUB(20) META_STUB(21) META_STUB(22) META_STUB(23) META_STUB(24)
META_STUB(25) META_STUB(26) META_STUB(27) META_STUB(28) META_STUB(29)
META_STUB(30) META_STUB(31) META_STUB(32) META_STUB(33) META_STUB(34)
META_STUB(35) META_STUB(36) META_STUB(37) META_STUB(38) META_STUB(39)
META_STUB(40) META_STUB(41) META_STUB(42) META_STUB(43) META_STUB(44)
META_STUB(45) META_STUB(46) META_STUB(47) META_STUB(48) META_STUB(49)
