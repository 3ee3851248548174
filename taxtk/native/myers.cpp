// Myers bit-vector global edit distance (Myers, JACM 1999) — native host
// implementation used as (a) the single-core CPU baseline that bench.py
// compares the TPU kernels against (the reference's DNA kernel is the same
// published algorithm via SeqAn, taxonpredictionmodelsequence.hh:133-171)
// and (b) a host-side aligner fallback.
//
// This is an independent implementation of the published algorithm
// (banded block formulation, 64-bit words), not a translation of SeqAn.
//
// Build: g++ -O3 -march=native -shared -fPIC myers.cpp -o libtaxtk_native.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// Global (Needleman-Wunsch, unit cost) edit distance via Myers' algorithm:
// process the shorter sequence as the pattern in 64-bit blocks; the score
// tracks column m of the DP matrix while scanning the text.
int myers_edit_distance(const uint8_t* a, int la, const uint8_t* b, int lb) {
    if (la == 0) return lb;
    if (lb == 0) return la;
    const uint8_t* pat = a;
    int m = la;
    const uint8_t* txt = b;
    int n = lb;
    if (m > n) { std::swap(pat, txt); std::swap(m, n); }

    const int W = 64;
    const int blocks = (m + W - 1) / W;
    // pattern match masks for the 5-letter DNA / up-to-32-letter alphabets
    std::vector<uint64_t> peq(32 * blocks, 0);
    for (int i = 0; i < m; ++i) {
        const int c = pat[i] & 31;
        peq[c * blocks + i / W] |= 1ULL << (i % W);
    }

    std::vector<uint64_t> Pv(blocks, ~0ULL), Mv(blocks, 0);
    int score = m;
    const uint64_t high = 1ULL << ((m - 1) % W);

    for (int j = 0; j < n; ++j) {
        const int c = txt[j] & 31;
        uint64_t carry_ph = 1;  // horizontal delta carries between blocks
        uint64_t carry_mh = 0;
        for (int blk = 0; blk < blocks; ++blk) {
            const uint64_t eq0 = peq[c * blocks + blk];
            const uint64_t pv = Pv[blk];
            const uint64_t mv = Mv[blk];

            const uint64_t eq = eq0 | carry_mh;
            const uint64_t xv = eq | mv;
            const uint64_t xh = (((eq & pv) + pv) ^ pv) | eq;

            uint64_t ph = mv | ~(xh | pv);
            uint64_t mh = pv & xh;

            if (blk == blocks - 1) {
                if (ph & high) ++score;
                else if (mh & high) --score;
            }

            const uint64_t ph_shift = (ph << 1) | carry_ph;
            const uint64_t mh_shift = (mh << 1) | carry_mh;
            carry_ph = ph >> 63;
            carry_mh = mh >> 63;

            Pv[blk] = mh_shift | ~(xv | ph_shift);
            Mv[blk] = ph_shift & xv;
        }
    }
    return score;
}

}  // namespace

extern "C" {

int taxtk_myers_edit_distance(const uint8_t* a, int la, const uint8_t* b, int lb) {
    return myers_edit_distance(a, la, b, lb);
}

// Batched interface: flat code buffers + offsets; results int32.
void taxtk_myers_batch(const uint8_t* a_flat, const int64_t* a_off, const int32_t* a_len,
                       const uint8_t* b_flat, const int64_t* b_off, const int32_t* b_len,
                       int n_pairs, int32_t* out) {
    for (int k = 0; k < n_pairs; ++k) {
        out[k] = myers_edit_distance(a_flat + a_off[k], a_len[k],
                                     b_flat + b_off[k], b_len[k]);
    }
}

// peq bit-mask builder for the device kernels: peq[k, c, b] gets bit
// (i & 31) set iff pattern b's residue i == c (i in word k = i >> 5).
// O(B x M) single pass vs the numpy packbits path's O(B x K x 32 x 5).
void taxtk_build_peq(const uint8_t* pat_flat, int B, int Mpad,
                     const int32_t* m_len, int K, int alpha,
                     uint32_t* peq, int n_threads) {
    memset(peq, 0, (size_t)K * alpha * B * 4);
    auto work = [&](int b0, int b1) {
        for (int b = b0; b < b1; ++b) {
            const int m = m_len[b] < Mpad ? m_len[b] : Mpad;
            const uint8_t* p = pat_flat + (size_t)b * Mpad;
            for (int i = 0; i < m; ++i) {
                const int c = p[i] & 31;
                if (c >= alpha) continue;
                peq[((size_t)(i >> 5) * alpha + c) * B + b] |= 1u << (i & 31);
            }
        }
    };
    const int nt = std::min(n_threads > 0 ? n_threads : 1, B);
    if (nt <= 1) {
        work(0, B);
        return;
    }
    std::vector<std::thread> ts;
    const int step = (B + nt - 1) / nt;
    for (int t = 1; t < nt; ++t) {
        const int b0 = t * step;
        if (b0 < B) ts.emplace_back(work, b0, std::min(B, b0 + step));
    }
    work(0, std::min(B, step));
    for (auto& t : ts) t.join();
}

// multithreaded batch: dynamic work-stealing over pairs (pair costs are
// wildly uneven — long-segment routing sends 6kbp..100kbp pairs here)
void taxtk_myers_batch_mt(const uint8_t* a_flat, const int64_t* a_off, const int32_t* a_len,
                          const uint8_t* b_flat, const int64_t* b_off, const int32_t* b_len,
                          int n_pairs, int32_t* out, int n_threads) {
    if (n_threads <= 1 || n_pairs <= 1) {
        taxtk_myers_batch(a_flat, a_off, a_len, b_flat, b_off, b_len, n_pairs, out);
        return;
    }
    std::atomic<int> next(0);
    auto worker = [&]() {
        for (;;) {
            const int k = next.fetch_add(1);
            if (k >= n_pairs) return;
            out[k] = myers_edit_distance(a_flat + a_off[k], a_len[k],
                                         b_flat + b_off[k], b_len[k]);
        }
    };
    std::vector<std::thread> ts;
    const int nt = std::min(n_threads, n_pairs);
    ts.reserve(nt - 1);
    for (int t = 1; t < nt; ++t) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
}

}  // extern "C"
