// Shim: buffer-reader types named by SeqIterator.h's vestigial
// KSEQ_INIT expansion (no call sites exist).
#ifndef SHIM_KSEQBUFFERREADER_H
#define SHIM_KSEQBUFFERREADER_H

#include <cstddef>

typedef struct kseq_buffer {
    char *buffer;
    size_t length;
    size_t position;
} kseq_buffer_t;

static inline int kseq_buffer_reader(kseq_buffer_t *inBuffer, char *outBuffer,
                                     unsigned int nbyte) {
    size_t remaining = inBuffer->length - inBuffer->position;
    size_t n = nbyte < remaining ? nbyte : remaining;
    for (size_t i = 0; i < n; ++i) {
        outBuffer[i] = inBuffer->buffer[inBuffer->position + i];
    }
    inBuffer->position += n;
    return (int)n;
}

#endif
