// Shim KSeqWrapper implementation: streaming FASTA/FASTQ (+gzip) reader.
#include "KSeqWrapper.h"

#include <zlib.h>

#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

class GzLineReader {
public:
    explicit GzLineReader(const char *path) {
        f = gzopen(path, "rb");
        bufCap = 1 << 20;
        buf = (char *)malloc(bufCap);
        bufLen = bufPos = 0;
        eof = (f == NULL);
    }
    ~GzLineReader() {
        if (f) gzclose(f);
        free(buf);
    }
    bool ok() const { return f != NULL; }

    // returns false on EOF with nothing read; strips trailing \n / \r\n
    bool getline(std::string &out) {
        out.clear();
        while (true) {
            if (bufPos >= bufLen) {
                if (eof) return !out.empty();
                bufLen = gzread(f, buf, (unsigned)bufCap);
                bufPos = 0;
                if (bufLen <= 0) {
                    eof = true;
                    return !out.empty();
                }
            }
            char *nl = (char *)memchr(buf + bufPos, '\n', bufLen - bufPos);
            if (nl) {
                out.append(buf + bufPos, nl - (buf + bufPos));
                bufPos = (nl - buf) + 1;
                if (!out.empty() && out.back() == '\r') out.pop_back();
                return true;
            }
            out.append(buf + bufPos, bufLen - bufPos);
            bufPos = bufLen;
        }
    }

private:
    gzFile f;
    char *buf;
    size_t bufCap;
    int bufLen;
    size_t bufPos;
    bool eof;
};

class KSeqShim : public KSeqWrapper {
public:
    explicit KSeqShim(const char *path) : reader(path), havePeek(false) {
        type = KSEQ_GZIP;
        memset(&entry, 0, sizeof(entry));
    }

    bool ReadEntry() override {
        std::string header;
        if (havePeek) {
            header = peek;
            havePeek = false;
        } else {
            do {
                if (!reader.getline(header)) return false;
            } while (header.empty());
        }
        if (header.empty() || (header[0] != '>' && header[0] != '@')) {
            return false;
        }
        bool fastq = header[0] == '@';
        size_t sp = header.find_first_of(" \t");
        nameBuf.assign(header, 1, (sp == std::string::npos ? header.size()
                                                           : sp) - 1);
        commentBuf.clear();
        if (sp != std::string::npos) {
            size_t c = header.find_first_not_of(" \t", sp);
            if (c != std::string::npos) commentBuf.assign(header, c,
                                                          std::string::npos);
        }
        seqBuf.clear();
        qualBuf.clear();
        std::string line;
        if (fastq) {
            while (reader.getline(line)) {
                if (!line.empty() && line[0] == '+') break;
                seqBuf += line;
            }
            while (qualBuf.size() < seqBuf.size() && reader.getline(line)) {
                qualBuf += line;
            }
        } else {
            while (reader.getline(line)) {
                if (!line.empty() && (line[0] == '>' || line[0] == '@')) {
                    peek = line;
                    havePeek = true;
                    break;
                }
                seqBuf += line;
            }
        }
        entry.name.s = (char *)nameBuf.c_str();
        entry.name.l = nameBuf.size();
        entry.comment.s = (char *)commentBuf.c_str();
        entry.comment.l = commentBuf.size();
        entry.sequence.s = (char *)seqBuf.c_str();
        entry.sequence.l = seqBuf.size();
        entry.qual.s = (char *)qualBuf.c_str();
        entry.qual.l = qualBuf.size();
        entry.multiline = false;
        return true;
    }

private:
    GzLineReader reader;
    std::string nameBuf, commentBuf, seqBuf, qualBuf, peek;
    bool havePeek;
};

}  // namespace

KSeqWrapper *KSeqFactory(const char *file) { return new KSeqShim(file); }
