// C ABI around the vendored Prodigal 2.6.3 library (compiled IN PLACE
// from /root/reference/lib/prodigal — nothing copied into this repo),
// used by the DB build for gene prediction exactly like the reference
// does (reference src/commons/ProdigalWrapper.{h,cpp}, driven from
// IndexCreator::fillTargetKmerBuffer, IndexCreator.cpp:1124-1212).
//
// The call sequences below (train: add_nodes -> gc bias -> dprog(0) ->
// dicodon/coding/rbs/start training; predict: add_nodes -> score_nodes
// -> dprog(1) -> eliminate_bad_genes -> add_genes -> tweak_final_starts)
// are the canonical Prodigal single-genome pipeline from the library's
// own API; meta mode mirrors the wrapper's bin sweep
// (ProdigalWrapper.cpp:129-186).  Note: the reference snapshot ships no
// lib/prodigal/training.cpp (the ~5 MB metagenome models), so meta-mode
// bins are zero-initialized stubs (reference_build/shim/
// prodigal_training.cpp) — identical behavior to the reference binary
// built in this environment; single-genome training is complete.
//
// Exposed functions (ctypes, see metabuli_work_tpu/index/prodigal.py):
//   mwp_new / mwp_free          create/destroy a predictor
//   mwp_train(h, seq, len, meta)  train on one genome (1 = meta sweep)
//   mwp_predict(h, seq, len, out_begin, out_end, out_strand, max)
//       -> number of genes after dropping completely-overlapped ones
//          (begin/end are Prodigal 1-based inclusive coordinates)
//   mwp_xxh64(p, len)           XXH64 seed 0 (intergenic 23-mer hashes)

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "bitmap.h"
#include "dprog.h"
#include "gene.h"
#include "metagenomic.h"
#include "node.h"
#include "prodigalsequence.h"
#include "training.h"
#include "xxhash.h"

namespace {

struct Predictor {
    unsigned char *seq;    // 2-bit packed forward strand
    unsigned char *rseq;   // 2-bit packed reverse complement
    unsigned char *useq;   // ambiguity bitmap
    struct _node *nodes;
    struct _gene *genes;
    struct _training tinf;
    struct _metagenomic_bin *meta;
    mask mlist[MAX_MASKS];
    int nn, ng, slen, max_slen;
    int is_meta, meta_ready, best_bin;

    Predictor() {
        seq = (unsigned char *)calloc(MAX_SEQ / 4 + 1, 1);
        rseq = (unsigned char *)calloc(MAX_SEQ / 4 + 1, 1);
        useq = (unsigned char *)calloc(MAX_SEQ / 8 + 1, 1);
        nodes = (struct _node *)calloc(STT_NOD, sizeof(struct _node));
        genes = (struct _gene *)calloc(MAX_GENES, sizeof(struct _gene));
        meta = nullptr;
        nn = ng = slen = max_slen = 0;
        is_meta = meta_ready = best_bin = 0;
        memset(mlist, 0, sizeof(mlist));
        memset(&tinf, 0, sizeof(tinf));
        tinf.st_wt = 4.35;
        tinf.trans_table = 11;
    }
    ~Predictor() {
        if (meta) {
            for (int i = 0; i < NUM_META; i++) delete meta[i].tinf;
            free(meta);
        }
        free(seq); free(rseq); free(useq); free(nodes); free(genes);
    }

    // Pack bases into Prodigal's 2-bit bitmaps; returns base count.
    // Equivalent of the sequence ingest in prodigalsequence.cpp's
    // readers (A=00, C=01, G=10, T=11; ambiguous bases count in useq
    // and read as T-with-ambiguity like the upstream readers).
    int load(const unsigned char *line, long length, int training) {
        memset(seq, 0, (size_t)(slen / 4 + 1));
        memset(rseq, 0, (size_t)(slen / 4 + 1));
        memset(useq, 0, (size_t)(slen / 8 + 1));
        memset(nodes, 0, (size_t)nn * sizeof(struct _node));
        nn = 0;
        int bctr = 0, len = 0, gc_cont = 0;
        for (long i = 0; i < length; i++) {
            unsigned char c = line[i];
            if (c < 'A' || c > 'z') continue;
            switch (c) {
            case 'g': case 'G': set(seq, bctr); gc_cont++; break;
            case 't': case 'T':
                set(seq, bctr); set(seq, bctr + 1); break;
            case 'c': case 'C': set(seq, bctr + 1); gc_cont++; break;
            case 'a': case 'A': break;
            default:
                set(seq, bctr + 1);
                set(useq, len);
            }
            bctr += 2; len++;
            if (len >= MAX_SEQ) break;
        }
        double gc = len ? (double)gc_cont / (double)len : 0.0;
        if (training) tinf.gc = gc;
        slen = len;
        rcom_seq(seq, rseq, useq, slen);
        if (slen > max_slen && slen > STT_NOD * 8) {
            nodes = (struct _node *)realloc(
                nodes, (size_t)(slen / 8) * sizeof(struct _node));
            if (!nodes) { fprintf(stderr, "prodigal_api: node realloc failed\n"); exit(11); }
            memset(nodes, 0, (size_t)(slen / 8) * sizeof(struct _node));
            max_slen = slen;
        }
        return len;
    }

    int train_single(const unsigned char *genome, long length) {
        memset(mlist, 0, sizeof(mlist));
        memset(&tinf, 0, sizeof(tinf));
        tinf.st_wt = 4.35;
        tinf.trans_table = 11;
        if (load(genome, length, 1) == 0) return -1;
        nn = add_nodes(seq, rseq, slen, nodes, 1, mlist, 0, &tinf);
        qsort(nodes, nn, sizeof(struct _node), &compare_nodes);
        int *gc_frame = calc_most_gc_frame(seq, slen);
        record_gc_bias(gc_frame, nodes, nn, &tinf);
        free(gc_frame);
        record_overlapping_starts(nodes, nn, &tinf, 0);
        int ipath = dprog(nodes, nn, &tinf, 0);
        calc_dicodon_gene(&tinf, seq, rseq, slen, nodes, ipath);
        raw_coding_score(seq, rseq, slen, nodes, nn, &tinf);
        rbs_score(seq, rseq, slen, nodes, nn, &tinf);
        train_starts_sd(seq, rseq, slen, nodes, nn, &tinf);
        determine_sd_usage(&tinf);
        if (tinf.uses_sd == 0)
            train_starts_nonsd(seq, rseq, slen, nodes, nn, &tinf);
        is_meta = 0;
        return 0;
    }

    int train_meta(const unsigned char *genome, long length) {
        memset(&tinf, 0, sizeof(tinf));
        tinf.st_wt = 4.35;
        tinf.trans_table = 11;
        if (!meta_ready) {
            meta = (struct _metagenomic_bin *)malloc(
                NUM_META * sizeof(struct _metagenomic_bin));
            for (int i = 0; i < NUM_META; i++) meta[i].tinf = new _training();
            initialize_metagenomic_bins(meta);
            meta_ready = 1;
        }
        if (load(genome, length, 1) == 0) return -1;
        double low = 0.88495 * tinf.gc - 0.0102337;
        if (low > 0.65) low = 0.65;
        double high = 0.86596 * tinf.gc + 0.1131991;
        if (high < 0.35) high = 0.35;
        double max_score = -100.0;
        best_bin = 0;
        for (int i = 0; i < NUM_META; i++) {
            if (i == 0 ||
                meta[i].tinf->trans_table != meta[i - 1].tinf->trans_table) {
                memset(nodes, 0, (size_t)nn * sizeof(struct _node));
                nn = add_nodes(seq, rseq, slen, nodes, 1, mlist, 0,
                               meta[i].tinf);
                qsort(nodes, nn, sizeof(struct _node), &compare_nodes);
            }
            if (meta[i].tinf->gc < low || meta[i].tinf->gc > high) continue;
            reset_node_scores(nodes, nn);
            score_nodes(seq, rseq, slen, nodes, nn, meta[i].tinf, 1, 1);
            record_overlapping_starts(nodes, nn, meta[i].tinf, 1);
            int ipath = dprog(nodes, nn, meta[i].tinf, 1);
            if (ipath == -1) continue;
            if (nodes[ipath].score > max_score) {
                best_bin = i;
                max_score = nodes[ipath].score;
            }
        }
        is_meta = 1;
        return 0;
    }

    int predict(const unsigned char *genome, long length) {
        if (load(genome, length, 0) == 0) return -1;
        struct _training *t = is_meta ? meta[best_bin].tinf : &tinf;
        nn = add_nodes(seq, rseq, slen, nodes, 1, mlist, 0, t);
        qsort(nodes, nn, sizeof(struct _node), &compare_nodes);
        score_nodes(seq, rseq, slen, nodes, nn, t, 1, is_meta);
        record_overlapping_starts(nodes, nn, t, 1);
        int ipath = dprog(nodes, nn, t, 1);
        eliminate_bad_genes(nodes, ipath, t);
        ng = add_genes(genes, nodes, ipath);
        tweak_final_starts(genes, ng, nodes, nn, t);
        record_gene_data(genes, ng, nodes, t, 0);
        return ng;
    }
};

}  // namespace

extern "C" {

void *mwp_new() { return new Predictor(); }

void mwp_free(void *h) { delete static_cast<Predictor *>(h); }

int mwp_train(void *h, const char *seq, long len, int meta) {
    Predictor *p = static_cast<Predictor *>(h);
    return meta ? p->train_meta((const unsigned char *)seq, len)
                : p->train_single((const unsigned char *)seq, len);
}

// Predict genes; drop genes fully covered by their successor (the
// reference's removeCompletelyOverlappingGenes keeps gene i only when
// begin[i] < begin[i+1], ProdigalWrapper.cpp:320-330).  Returns the
// kept count, or -1 on failure.
int mwp_predict(void *h, const char *seq, long len,
                int *out_begin, int *out_end, int *out_strand, int max_out) {
    Predictor *p = static_cast<Predictor *>(h);
    int ng = p->predict((const unsigned char *)seq, len);
    if (ng < 0) return -1;
    int n = 0;
    for (int i = 0; i < ng && n < max_out; i++) {
        if (i < ng - 1 && p->genes[i].begin >= p->genes[i + 1].begin) continue;
        out_begin[n] = p->genes[i].begin;
        out_end[n] = p->genes[i].end;
        out_strand[n] = p->nodes[p->genes[i].start_ndx].strand;
        n++;
    }
    return n;
}

unsigned long long mwp_xxh64(const void *data, long len) {
    return XXH64(data, (size_t)len, 0);
}

}  // extern "C"
