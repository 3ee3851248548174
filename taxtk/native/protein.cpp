// Global Needleman-Wunsch protein alignment score (substitution matrix +
// linear gaps) — the native single-core CPU baseline bench.py compares
// the TPU protein kernel against.  The reference's protein kernel is the
// same formulation via SeqAn (Blosum62 + LinearGaps globalAlignment,
// taxonpredictionmodelsequence.hh:173-242); per realignment the
// reference binary additionally runs TWO self-alignment DPs and a
// traceback, which this baseline generously excludes — it measures only
// the one mutual-score DP, so vs_baseline ratios computed against it
// are conservative.
//
// Independent implementation (two-row rolling DP, int32), not a
// translation of SeqAn's alignment graph machinery.
//
// Built into libtaxtk_native.so alongside myers.cpp (see __init__.py).

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

// codes are indices into the caller's alphabet (SeqAn AminoAcid order);
// sub is an alpha x alpha int8 matrix, gap the per-position penalty
int nw_score(const uint8_t* a, int la, const uint8_t* b, int lb,
             const int8_t* sub, int alpha, int gap,
             std::vector<int32_t>& prev, std::vector<int32_t>& cur) {
    if (la == 0) return lb * gap;
    if (lb == 0) return la * gap;
    prev.resize(lb + 1);
    cur.resize(lb + 1);
    for (int j = 0; j <= lb; ++j) prev[j] = j * gap;
    for (int i = 1; i <= la; ++i) {
        const int8_t* row = sub + static_cast<int>(a[i - 1]) * alpha;
        cur[0] = i * gap;
        int32_t left = cur[0];
        for (int j = 1; j <= lb; ++j) {
            int32_t diag = prev[j - 1] + row[b[j - 1]];
            int32_t up = prev[j] + gap;
            int32_t best = diag > up ? diag : up;
            int32_t lft = left + gap;
            if (lft > best) best = lft;
            cur[j] = best;
            left = best;
        }
        std::swap(prev, cur);
    }
    return prev[lb];
}

}  // namespace

extern "C" {

int taxtk_protein_nw_score(const uint8_t* a, int la, const uint8_t* b,
                           int lb, const int8_t* sub, int alpha, int gap) {
    std::vector<int32_t> prev, cur;
    return nw_score(a, la, b, lb, sub, alpha, gap, prev, cur);
}

// Batched scores over packed sequences; n_threads <= 1 is the
// single-core baseline path, otherwise dynamic work stealing.
void taxtk_protein_nw_batch(const uint8_t* a_data, const int64_t* a_off,
                            const int32_t* a_len, const uint8_t* b_data,
                            const int64_t* b_off, const int32_t* b_len,
                            int n, const int8_t* sub, int alpha, int gap,
                            int32_t* out, int n_threads) {
    if (n_threads <= 1) {
        std::vector<int32_t> prev, cur;
        for (int i = 0; i < n; ++i)
            out[i] = nw_score(a_data + a_off[i], a_len[i],
                              b_data + b_off[i], b_len[i], sub, alpha, gap,
                              prev, cur);
        return;
    }
    std::atomic<int> next(0);
    auto worker = [&]() {
        std::vector<int32_t> prev, cur;
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            out[i] = nw_score(a_data + a_off[i], a_len[i],
                              b_data + b_off[i], b_len[i], sub, alpha, gap,
                              prev, cur);
        }
    };
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
}

// Global-NW traceback reproducing SeqAn's gap placement exactly: the
// reference streams the SeqAn alignment art into the decision log
// (taxonpredictionmodelsequence.hh:534,:637,:783,:803), and SeqAn's
// traceback walks with preference diagonal > vertical (consume B,
// gap in the A row) > horizontal (consume A, gap in the B row) with
// gaps-left (dp_traceback_impl.h _doTraceback; verified 0/500
// mismatches against the compiled SeqAn oracle).  Emits one column
// code per alignment column: M match, X mismatch, A gap-in-A,
// B gap-in-B.  Returns the column count (out must hold m + n chars).
int taxtk_protein_nw_traceback(const uint8_t* a, int m, const uint8_t* b,
                               int n, const int8_t* sub, int alpha,
                               int gap, char* out) {
    std::vector<int32_t> S((size_t)(m + 1) * (n + 1));
    for (int j = 0; j <= n; ++j) S[j] = j * gap;
    for (int i = 1; i <= m; ++i) {
        int32_t* row = &S[(size_t)i * (n + 1)];
        const int32_t* prev = row - (n + 1);
        row[0] = i * gap;
        const int8_t* srow = sub + (size_t)a[i - 1] * alpha;
        for (int j = 1; j <= n; ++j) {
            int32_t best = prev[j - 1] + srow[b[j - 1]];
            int32_t v = prev[j] + gap;
            if (v > best) best = v;
            int32_t h = row[j - 1] + gap;
            if (h > best) best = h;
            row[j] = best;
        }
    }
    int i = m, j = n, k = 0;
    while (i > 0 || j > 0) {
        const int32_t s = S[(size_t)i * (n + 1) + j];
        if (i > 0 && j > 0 &&
            s == S[(size_t)(i - 1) * (n + 1) + (j - 1)] +
                     sub[(size_t)a[i - 1] * alpha + b[j - 1]]) {
            out[k++] = (a[i - 1] == b[j - 1]) ? 'M' : 'X';
            --i;
            --j;
        } else if (j > 0 && s == S[(size_t)i * (n + 1) + (j - 1)] + gap) {
            out[k++] = 'A';  // consume B alone: gap in the A row
            --j;
        } else {
            out[k++] = 'B';  // consume A alone: gap in the B row
            --i;
        }
    }
    for (int l = 0; l < k / 2; ++l) {
        char t = out[l];
        out[l] = out[k - 1 - l];
        out[k - 1 - l] = t;
    }
    return k;
}

}  // extern "C"
