// Shim: kseq macro carrier.  The reference's only use is a vestigial
// KSEQ_INIT(kseq_buffer_t*, kseq_buffer_reader) expansion in
// SeqIterator.h with no kseq_* call sites — expand to nothing.
#ifndef SHIM_KSEQ_H
#define SHIM_KSEQ_H

#define KSEQ_INIT(type_t, readfn)

#endif
