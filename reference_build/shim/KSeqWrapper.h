// Shim: FASTA/FASTQ reader matching the mmseqs KSeqWrapper interface
// (kstring-style entry fields, KSeqFactory dispatch, gzip via zlib).
#ifndef SHIM_KSEQWRAPPER_H
#define SHIM_KSEQWRAPPER_H

#include <string>

class KSeqWrapper {
public:
    struct kstring_t {
        size_t l;
        char *s;
    };
    struct KSeqEntry {
        kstring_t name;
        kstring_t sequence;
        kstring_t comment;
        kstring_t qual;
        kstring_t headerOffset;   // unused here; present for iface parity
        bool multiline;
        size_t offset;
    } entry;

    enum kseq_type { KSEQ_FILE, KSEQ_STREAM, KSEQ_GZIP, KSEQ_BUFFER };
    kseq_type type;

    virtual ~KSeqWrapper() {}
    virtual bool ReadEntry() = 0;
};

KSeqWrapper *KSeqFactory(const char *file);

#endif
