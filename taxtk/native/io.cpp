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
