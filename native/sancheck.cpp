// Sanitizer exercise driver for the native host libraries (SURVEY 5.2:
// the reference CI runs its regression suite under ASan,
// azure-pipelines.yml:34-38; this is the equivalent gate for the
// framework's own native code).  Compiled by tests/test_native_sanitizers
// with -fsanitize=address,undefined (all modes) and -fsanitize=thread
// (mode "tantan", the one multi-threaded library), linked against the
// objects of the libraries themselves.
//
// Usage: sancheck <tantan|seqreader|unionfind|hostscore|prodigal> [file]
// Exits non-zero (or the sanitizer aborts) on any failure.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void tantan_mask(uint8_t *seq, int64_t n, double min_mask_prob);
void *sr_open(const char *path);
void sr_close(void *h);
int sr_next_batch(void *h, int max_reads, int max_len, uint8_t *seqs,
                  int32_t *lens, char *names, int name_stride,
                  uint8_t *quals);
void uf_run(int64_t n, const int64_t *id1, const int64_t *id2, int64_t m,
            int64_t *parent, int32_t *rank_, uint8_t *grouped);
void combine_paths_batch(int64_t n_runs, const int64_t *starts,
                         const int64_t *cnts, const int32_t *pstart,
                         const int32_t *pend, const float *pscore,
                         const int32_t *pham, const int32_t *prhs,
                         const int32_t *prhe, float *out_total);
#ifndef NO_PRODIGAL
void *mwp_new();
void mwp_free(void *h);
int mwp_train(void *h, const char *seq, long len, int meta);
int mwp_predict(void *h, const char *seq, long len, int *out_begin,
                int *out_end, int *out_strand, int max_out);
#endif
}

static uint32_t rng_state = 12345;
static uint32_t rnd() {
    rng_state = rng_state * 1664525u + 1013904223u;
    return rng_state >> 8;
}
static char base() { return "ACGT"[rnd() & 3]; }

static int check_tantan() {
    // long sequence with embedded tandem repeats: exercises the chunked
    // multi-thread path (CHUNK-sized work items over a shared mask)
    const int64_t n = 3 << 20;
    std::vector<uint8_t> seq(n);
    for (int64_t i = 0; i < n; ++i) seq[i] = base();
    for (int64_t r = 0; r < 64; ++r) {
        int64_t at = rnd() % (n - 4096);
        for (int64_t i = 0; i < 4000; ++i)
            seq[at + i] = "ACACAC"[i % 6];
    }
    int64_t before_n = 0;
    for (int64_t i = 0; i < n; ++i) before_n += seq[i] == 'N';
    tantan_mask(seq.data(), n, 0.9);
    int64_t masked = 0;
    for (int64_t i = 0; i < n; ++i) masked += seq[i] == 'N';
    if (masked <= before_n) { fprintf(stderr, "tantan masked nothing\n"); return 1; }
    if (masked > n / 2) { fprintf(stderr, "tantan masked >half\n"); return 1; }
    return 0;
}

static int check_seqreader(const char *path) {
    // caller wrote a FASTQ at `path`
    void *h = sr_open(path);
    if (!h) { fprintf(stderr, "sr_open failed\n"); return 1; }
    const int R = 64, L = 128, NS = 64;
    std::vector<uint8_t> seqs(R * L), quals(R * L);
    std::vector<int32_t> lens(R);
    std::vector<char> names(R * NS);
    int total = 0, got;
    while ((got = sr_next_batch(h, R, L, seqs.data(), lens.data(),
                                names.data(), NS, quals.data())) > 0)
        total += got;
    sr_close(h);
    if (got < 0 || total == 0) { fprintf(stderr, "seqreader failed\n"); return 1; }
    return 0;
}

static int check_unionfind() {
    const int64_t n = 100000, m = 300000;
    std::vector<int64_t> id1(m), id2(m), parent(n + 1);
    std::vector<int32_t> rank_(n + 1, 0);
    std::vector<uint8_t> grouped(n + 1, 0);
    for (int64_t i = 0; i <= n; ++i) parent[i] = i;
    for (int64_t i = 0; i < m; ++i) {
        id1[i] = 1 + rnd() % n;
        id2[i] = 1 + rnd() % n;
    }
    uf_run(n, id1.data(), id2.data(), m, parent.data(), rank_.data(),
           grouped.data());
    for (int64_t i = 1; i <= n; ++i)
        if (parent[i] < 0 || parent[i] > n) { fprintf(stderr, "uf bad parent\n"); return 1; }
    return 0;
}

static int check_hostscore() {
    const int64_t n_runs = 512;
    std::vector<int64_t> starts(n_runs), cnts(n_runs);
    std::vector<int32_t> ps, pe, ph, prs, pre;
    std::vector<float> sc;
    int64_t off = 0;
    for (int64_t r = 0; r < n_runs; ++r) {
        starts[r] = off;
        cnts[r] = rnd() % 24;
        for (int64_t i = 0; i < cnts[r]; ++i) {
            int s = rnd() % 1000;
            ps.push_back(s);
            pe.push_back(s + 24 + rnd() % 120);
            sc.push_back((float)(rnd() % 100));
            ph.push_back(rnd() % 8);
            prs.push_back(rnd() % 4);
            pre.push_back(rnd() % 4);
        }
        off += cnts[r];
    }
    std::vector<float> out(n_runs, -1.f);
    combine_paths_batch(n_runs, starts.data(), cnts.data(), ps.data(),
                        pe.data(), sc.data(), ph.data(), prs.data(),
                        pre.data(), out.data());
    for (int64_t r = 0; r < n_runs; ++r)
        if (out[r] < 0) { fprintf(stderr, "hostscore missing out\n"); return 1; }
    return 0;
}

#ifndef NO_PRODIGAL
static int check_prodigal() {
    std::string g;
    g.reserve(120000);
    for (int i = 0; i < 120000; ++i) g.push_back(base());
    void *h = mwp_new();
    if (mwp_train(h, g.c_str(), (long)g.size(), 0) != 0) {
        fprintf(stderr, "prodigal train failed\n"); return 1;
    }
    std::vector<int> b(30000), e(30000), s(30000);
    int ng = mwp_predict(h, g.c_str(), (long)g.size(), b.data(), e.data(),
                         s.data(), 30000);
    mwp_free(h);
    if (ng <= 0) { fprintf(stderr, "prodigal predicted nothing\n"); return 1; }
    return 0;
}
#endif  // NO_PRODIGAL

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: sancheck <mode> [file]\n"); return 2; }
    std::string mode = argv[1];
    if (mode == "tantan") return check_tantan();
    if (mode == "seqreader") return check_seqreader(argc > 2 ? argv[2] : "");
    if (mode == "unionfind") return check_unionfind();
    if (mode == "hostscore") return check_hostscore();
#ifndef NO_PRODIGAL
    if (mode == "prodigal") return check_prodigal();
#endif
    fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
}
