// Native batch FASTA/FASTQ reader — the framework's host data loader.
//
// Counterpart of the reference's kseq-based KSeqWrapper (mmseqs
// submodule; used by src/commons/KmerExtractor.cpp): streams plain or
// gzip-compressed FASTA/FASTQ and fills caller-provided padded batch
// buffers (uint8 bases [max_reads x max_len], int32 lengths, flat name
// bytes) so Python receives device-ready arrays with zero per-read
// Python work.  Exposed as a C ABI for ctypes; releases the GIL for the
// whole batch by construction (pure C++ side).
//
// Build: g++ -O2 -shared -fPIC seqreader.cpp -lz -o libseqreader.so

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr size_t kBufSize = 1 << 20;

struct Reader {
  gzFile gz = nullptr;
  std::string carry;       // partial line carried between refills
  std::vector<char> buf;
  size_t pos = 0, len = 0;
  bool eof = false;
  bool is_fastq = false;
  bool format_known = false;
  std::string pending_header;  // header consumed while scanning records

  bool fill() {
    if (eof) return false;
    int n = gzread(gz, buf.data(), (unsigned)buf.size());
    if (n <= 0) {
      eof = true;
      return false;
    }
    pos = 0;
    len = (size_t)n;
    return true;
  }

  // Read one line (without trailing newline) into out; false at EOF.
  bool getline(std::string &out) {
    out.clear();
    if (!carry.empty()) {
      out.swap(carry);
    }
    while (true) {
      if (pos >= len && !fill()) {
        return !out.empty();
      }
      char *start = buf.data() + pos;
      char *nl = (char *)memchr(start, '\n', len - pos);
      if (nl) {
        out.append(start, nl - start);
        pos = (nl - buf.data()) + 1;
        if (!out.empty() && out.back() == '\r') out.pop_back();
        return true;
      }
      out.append(start, len - pos);
      pos = len;
    }
  }
};

}  // namespace

extern "C" {

void *sr_open(const char *path) {
  gzFile gz = gzopen(path, "rb");
  if (!gz) return nullptr;
  gzbuffer(gz, kBufSize);
  Reader *r = new Reader();
  r->gz = gz;
  r->buf.resize(kBufSize);
  return r;
}

void sr_close(void *h) {
  Reader *r = (Reader *)h;
  if (!r) return;
  if (r->gz) gzclose(r->gz);
  delete r;
}

// Fill a batch. Returns number of reads (0 at EOF, -1 on error).
//  seqs: [max_reads * max_len] uint8, pre-filled by callee with 'N'
//  lens: [max_reads] int32 (true read length, may exceed max_len; bases
//        beyond max_len are dropped)
//  names: [max_reads * name_stride] bytes, NUL-terminated, truncated
int sr_next_batch(void *h, int max_reads, int max_len, uint8_t *seqs,
                  int32_t *lens, char *names, int name_stride,
                  uint8_t *quals /* nullable, same layout as seqs */) {
  Reader *r = (Reader *)h;
  if (!r) return -1;
  std::string line;
  int count = 0;
  while (count < max_reads) {
    std::string header;
    if (!r->pending_header.empty()) {
      header.swap(r->pending_header);
    } else {
      if (!r->getline(header)) break;
      if (header.empty()) continue;
    }
    if (!r->format_known) {
      r->is_fastq = header[0] == '@';
      r->format_known = true;
    }
    if (header[0] != '>' && header[0] != '@') continue;

    // name = header up to first whitespace (sans marker)
    size_t ws = header.find_first_of(" \t");
    size_t name_len = (ws == std::string::npos ? header.size() : ws) - 1;
    char *nm = names + (size_t)count * name_stride;
    size_t cp = name_len < (size_t)(name_stride - 1) ? name_len : (size_t)(name_stride - 1);
    memcpy(nm, header.data() + 1, cp);
    nm[cp] = '\0';

    uint8_t *row = seqs + (size_t)count * max_len;
    memset(row, 'N', max_len);
    int32_t total = 0;

    if (r->is_fastq) {
      if (!r->getline(line)) break;
      total = (int32_t)line.size();
      int32_t keep = total < max_len ? total : max_len;
      memcpy(row, line.data(), keep);
      std::string plus, qual;
      r->getline(plus);
      r->getline(qual);
      if (quals) {
        uint8_t *q = quals + (size_t)count * max_len;
        memset(q, '!', max_len);
        int32_t qa = (int32_t)qual.size() < max_len ? (int32_t)qual.size() : max_len;
        memcpy(q, qual.data(), qa);
      }
    } else {
      // FASTA: accumulate until next header/EOF
      while (r->getline(line)) {
        if (!line.empty() && (line[0] == '>')) {
          r->pending_header.swap(line);
          break;
        }
        int32_t keep = 0;
        if (total < max_len) {
          keep = (int32_t)line.size();
          if (total + keep > max_len) keep = max_len - total;
          memcpy(row + total, line.data(), keep);
        }
        total += (int32_t)line.size();
      }
    }
    lens[count] = total;
    count++;
  }
  return count;
}

}  // extern "C"
