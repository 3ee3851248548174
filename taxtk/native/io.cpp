// Native host runtime: batched FASTA region fetch + sequence encoding.
//
// The RPA executor needs thousands of reference segments per device round
// (region extraction with query-overhang extension and optional reverse
// complement, reference: sequencestorage.hh:341-369 +
// taxonpredictionmodelsequence.hh:856-880).  Doing that per pair in Python
// dominates the host path; this module does the whole batch in C++ over a
// pread-based .fai accessor, emitting encoded uint8 code arrays directly.
//
// Build: g++ -O3 -march=native -shared -fPIC io.cpp -o libtaxtk_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <unistd.h>
#include <vector>

namespace {

struct FaiEntry {
    int64_t length;
    int64_t offset;
    int64_t line_bases;
    int64_t line_width;
};

struct FaidxHandle {
    int fd = -1;
    std::vector<FaiEntry> entries;
};

// DNA5 encoding: A=0 C=1 G=2 T=3 other=4 (case-insensitive)
// AminoAcid(27): "ABCDEFGHIJKLMNOPQRSTUVWYZX*", unknown -> X(25)
struct Tables {
    uint8_t dna[256];
    uint8_t dna_comp[5];
    uint8_t aa[256];
    Tables() {
        memset(dna, 4, sizeof(dna));
        const char* d = "ACGT";
        for (int i = 0; i < 4; ++i) {
            dna[(uint8_t)d[i]] = i;
            dna[(uint8_t)(d[i] + 32)] = i;
        }
        dna_comp[0] = 3; dna_comp[1] = 2; dna_comp[2] = 1; dna_comp[3] = 0; dna_comp[4] = 4;
        const char* order = "ABCDEFGHIJKLMNOPQRSTUVWYZX*";
        memset(aa, 25, sizeof(aa));
        for (int i = 0; order[i]; ++i) {
            aa[(uint8_t)order[i]] = i;
            if (order[i] >= 'A' && order[i] <= 'Z') aa[(uint8_t)(order[i] + 32)] = i;
        }
    }
};
const Tables tables;

}  // namespace

extern "C" {

void* taxtk_faidx_open(const char* fasta_path, const int64_t* lengths,
                       const int64_t* offsets, const int64_t* line_bases,
                       const int64_t* line_widths, int64_t n) {
    int fd = ::open(fasta_path, O_RDONLY);
    if (fd < 0) return nullptr;
    auto* h = new FaidxHandle();
    h->fd = fd;
    h->entries.resize(n);
    for (int64_t i = 0; i < n; ++i) {
        h->entries[i] = {lengths[i], offsets[i], line_bases[i], line_widths[i]};
    }
    return h;
}

void taxtk_faidx_close(void* handle) {
    auto* h = static_cast<FaidxHandle*>(handle);
    if (h) {
        if (h->fd >= 0) ::close(h->fd);
        delete h;
    }
}

// Fetch and encode a batch of regions.
//  seq_idx[i], start[i], stop[i]: 1-based inclusive; stop clamped to length,
//    start floored at 1 (reference: sequencestorage.hh:353).
//  revcomp[i] != 0: reverse-complement the encoded codes (DNA only).
//  protein != 0: amino-acid encoding instead of DNA5.
//  out: [n, stride] uint8, zero-padded; out_len[i] = emitted length.
// Returns 0 on success, -1 on I/O error, -2 on bad index.
int taxtk_faidx_fetch_encode(void* handle, int64_t n, const int64_t* seq_idx,
                             const int64_t* start, const int64_t* stop,
                             const uint8_t* revcomp, int protein,
                             uint8_t* out, int64_t stride, int64_t* out_len) {
    auto* h = static_cast<FaidxHandle*>(handle);
    if (!h || h->fd < 0) return -2;
    std::vector<char> buf;
    for (int64_t i = 0; i < n; ++i) {
        if (seq_idx[i] < 0 || seq_idx[i] >= (int64_t)h->entries.size()) return -2;
        const FaiEntry& e = h->entries[seq_idx[i]];
        int64_t s = start[i] < 1 ? 1 : start[i];
        int64_t t = stop[i] > e.length ? e.length : stop[i];
        uint8_t* dst = out + i * stride;
        if (t < s) {
            out_len[i] = 0;
            continue;
        }
        int64_t first = s - 1;
        int64_t last = t;  // exclusive count
        int64_t byte_start = e.offset + (first / e.line_bases) * e.line_width +
                             (first % e.line_bases);
        int64_t byte_end = e.offset + ((last - 1) / e.line_bases) * e.line_width +
                           ((last - 1) % e.line_bases) + 1;
        int64_t span = byte_end - byte_start;
        buf.resize(span);
        ssize_t got = ::pread(h->fd, buf.data(), span, byte_start);
        if (got != span) return -1;
        int64_t m = 0;
        const uint8_t* table = protein ? tables.aa : tables.dna;
        for (int64_t k = 0; k < span && m < stride; ++k) {
            char c = buf[k];
            if (c == '\n' || c == '\r') continue;
            dst[m++] = table[(uint8_t)c];
        }
        if (!protein && revcomp && revcomp[i]) {
            for (int64_t a = 0, b = m - 1; a < b; ++a, --b) {
                uint8_t x = dst[a];
                dst[a] = tables.dna_comp[dst[b]];
                dst[b] = tables.dna_comp[x];
            }
            if (m & 1) dst[m / 2] = tables.dna_comp[dst[m / 2]];
        }
        out_len[i] = m;
    }
    return 0;
}

// Encode a raw byte buffer in place into codes (utility for host stores).
void taxtk_encode(const uint8_t* src, int64_t n, int protein, uint8_t* dst) {
    const uint8_t* table = protein ? tables.aa : tables.dna;
    for (int64_t i = 0; i < n; ++i) dst[i] = table[src[i]];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Columnar alignment-TSV parser (the 11+1-column format, doc/fileformats.md).
//
// Parses a whole buffer of '\n'-terminated lines into columnar arrays so the
// Python side only materializes record objects (the reference parses one
// line at a time through boost::lexical_cast, alignmentrecord.hh:95-158).
// Semantics mirror taxtk.formats.alignments.parse_alignment_line exactly:
// empty lines and '#' comments are skipped, lines of length <= 1 are errors,
// a '*' prefix masks, query positions must not be reversed, position/count
// fields are plain-digit only, score/evalue parse as float/double.

namespace {

inline bool all_digits(const char* s, int64_t n) {
    if (n <= 0) return false;
    for (int64_t i = 0; i < n; ++i)
        if (s[i] < '0' || s[i] > '9') return false;
    return true;
}

inline int64_t parse_digits(const char* s, int64_t n) {
    // caller validated digits; saturate far beyond uint32 range
    int64_t v = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (v > (int64_t)1 << 61) return (int64_t)1 << 61;
        v = v * 10 + (s[i] - '0');
    }
    return v;
}

}  // namespace

extern "C" {

// Error codes mirror ParsingError reasons in formats/alignments.py.
enum {
    TAXTK_PARSE_OK = 0,
    TAXTK_PARSE_TOO_SHORT = -1,
    TAXTK_PARSE_BAD_FIELDS = -2,
    TAXTK_PARSE_BAD_POSITION = -3,
    TAXTK_PARSE_REVERSED_QUERY = -4,
    TAXTK_PARSE_BAD_SCORE = -5,
    TAXTK_PARSE_BAD_EVALUE = -6,
    TAXTK_PARSE_BAD_IDENTITY = -7,
    TAXTK_PARSE_BAD_ALNLEN = -8,
};

// buf[0:len) = whole lines (caller carries any partial tail line).
// start_lineno = 1-based line number of buf's first line.
// Outputs are caller-allocated with capacity >= number of lines in buf.
// nums layout: [cap][7] = qstart qstop qlen rstart rstop identities alnlen.
// Returns record count (>= 0) or a negative error code with *err_line set.
int64_t taxtk_parse_alignments(
    const char* buf, int64_t len, int64_t start_lineno,
    int64_t* qid_off, int32_t* qid_len,
    int64_t* rid_off, int32_t* rid_len,
    int64_t* nums, float* score, double* evalue,
    int64_t* cig_off, int32_t* cig_len,
    uint8_t* masked, int64_t* lineno_out, int64_t* err_line) {
    int64_t nrec = 0;
    int64_t lineno = start_lineno - 1;
    int64_t pos = 0;
    while (pos < len) {
        ++lineno;
        const char* nl = (const char*)memchr(buf + pos, '\n', len - pos);
        int64_t end = nl ? (nl - buf) : len;  // line = buf[pos:end)
        int64_t lstart = pos;
        pos = end + 1;
        int64_t llen = end - lstart;
        if (llen == 0) continue;                 // empty_line
        if (buf[lstart] == '#') continue;        // ignore_line
        *err_line = lineno;
        if (llen <= 1) return TAXTK_PARSE_TOO_SHORT;
        bool is_masked = buf[lstart] == '*';
        int64_t b = lstart + (is_masked ? 1 : 0);

        // split into at most 13 fields on '\t' (str.split(sep, 12))
        int64_t foff[13];
        int64_t flen[13];
        int nf = 0;
        int64_t fs = b;
        for (int64_t i = b; i <= end && nf < 13; ++i) {
            if (i == end || (buf[i] == '\t' && nf < 12)) {
                foff[nf] = fs;
                flen[nf] = i - fs;
                ++nf;
                fs = i + 1;
                if (i == end) break;
            }
        }
        if (nf == 13 && foff[12] + flen[12] < end) flen[12] = end - foff[12];
        if (nf < 11) return TAXTK_PARSE_BAD_FIELDS;

        const char* f1 = buf + foff[1];
        const char* f2 = buf + foff[2];
        const char* f3 = buf + foff[3];
        const char* f5 = buf + foff[5];
        const char* f6 = buf + foff[6];
        if (!all_digits(f1, flen[1]) || !all_digits(f2, flen[2]) ||
            !all_digits(f3, flen[3]) || !all_digits(f5, flen[5]) ||
            !all_digits(f6, flen[6]))
            return TAXTK_PARSE_BAD_POSITION;
        int64_t qstart = parse_digits(f1, flen[1]);
        int64_t qstop = parse_digits(f2, flen[2]);
        if (qstart > qstop) return TAXTK_PARSE_REVERSED_QUERY;

        char tmp[64];
        char* endp = nullptr;
        float sc;
        if (flen[7] > 0 && flen[7] < 63) {
            memcpy(tmp, buf + foff[7], flen[7]);
            tmp[flen[7]] = 0;
            sc = strtof(tmp, &endp);
            if (endp != tmp + flen[7]) return TAXTK_PARSE_BAD_SCORE;
        } else {
            return TAXTK_PARSE_BAD_SCORE;
        }
        double ev;
        if (flen[8] > 0 && flen[8] < 63) {
            memcpy(tmp, buf + foff[8], flen[8]);
            tmp[flen[8]] = 0;
            ev = strtod(tmp, &endp);
            if (endp != tmp + flen[8]) return TAXTK_PARSE_BAD_EVALUE;
        } else {
            return TAXTK_PARSE_BAD_EVALUE;
        }
        if (!all_digits(buf + foff[9], flen[9])) return TAXTK_PARSE_BAD_IDENTITY;
        if (!all_digits(buf + foff[10], flen[10])) return TAXTK_PARSE_BAD_ALNLEN;

        qid_off[nrec] = foff[0];
        qid_len[nrec] = (int32_t)flen[0];
        rid_off[nrec] = foff[4];
        rid_len[nrec] = (int32_t)flen[4];
        int64_t* nn = nums + nrec * 7;
        nn[0] = qstart;
        nn[1] = qstop;
        nn[2] = parse_digits(f3, flen[3]);
        nn[3] = parse_digits(f5, flen[5]);
        nn[4] = parse_digits(f6, flen[6]);
        nn[5] = parse_digits(buf + foff[9], flen[9]);
        nn[6] = parse_digits(buf + foff[10], flen[10]);
        score[nrec] = sc;
        evalue[nrec] = ev;
        if (nf >= 12) {
            cig_off[nrec] = foff[11];
            cig_len[nrec] = (int32_t)flen[11];
        } else {
            cig_off[nrec] = 0;
            cig_len[nrec] = 0;
        }
        masked[nrec] = is_masked ? 1 : 0;
        lineno_out[nrec] = lineno;
        ++nrec;
    }
    return nrec;
}

}  // extern "C"
