// Native RPA decision replay: the hot host path of the engine.
//
// Mirrors taxtk/models/rpa.py replay_pass0/replay_pass1/replay_pass2
// operation by operation (which in turn replay the reference's
// RPAPredictionModel, reference: core/src/taxonpredictionmodelsequence.hh:
// 497-822).  The Python replay is the parity-pinned implementation; this
// file must produce BIT-IDENTICAL float32 state, node choices and counters
// (tests/test_replay_native.py diffs them on randomized corpora, and the
// reference-code oracle suite diffs the resulting GFF3 against the
// reference's own compiled predict()).
//
// Numeric model (measured against numpy 2.x semantics, see the probe in
// round-5 notes):
//   * np.float32 (x) np.float32            -> float op
//   * python-float (x) np.float32          -> float op (weak promotion:
//     the python float is narrowed FIRST), also for comparisons
//   * float(np.float32) / int              -> double division
//   * int(np.float32)                      -> trunc toward zero
// Compile with -ffp-contract=off: an FMA fusion would change float results.
//
// Taxonomy primitives are the flat arrays (taxtk/taxonomy/flat.py):
//   * LCA: nested-set parent walk (reference: taxonomyinterface.cpp:67-77)
//   * isParentOf: two nested-set comparisons (taxonomyinterface.cpp:52-55)

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Tax {
    const int32_t* left;
    const int32_t* right;
    const int32_t* parent;
    const int32_t* depth;
    int32_t root;

    // matches FlatTaxonomy.lca_scalar (the reference's own walk)
    int32_t lca(int32_t a, int32_t b) const {
        int32_t left_min = std::min(left[a], right[b]);
        int32_t right_max = std::max(right[a], right[b]);
        int32_t n = a;
        while (left[n] > left_min || right[n] < right_max) n = parent[n];
        return n;
    }

    bool is_parent_of(int32_t a, int32_t b) const {
        return right[a] > left[b] && left[a] < left[b];
    }
};

inline bool vec_contains(const std::vector<int32_t>& v, int32_t x) {
    return std::find(v.begin(), v.end(), x) != v.end();
}

inline void vec_remove(std::vector<int32_t>& v, int32_t x) {
    auto it = std::find(v.begin(), v.end(), x);
    if (it != v.end()) v.erase(it);
}

// BandFactor (reference :259-323; python rpa.py:_band_factor)
float band_factor(std::vector<std::pair<float, int32_t>>& data,
                  int32_t anchor_node, const Tax& tax) {
    // stable sort of data[1:] ascending by score (python `sorted` is stable)
    std::stable_sort(
        data.begin() + 1, data.end(),
        [](const std::pair<float, int32_t>& a,
           const std::pair<float, int32_t>& b) { return a.first < b.first; });
    float bandfactor = 1.0f;
    float score0 = data[0].first;
    int32_t a0 = data[0].second;
    int last_rank = tax.depth[a0];
    // worst[rank]: depth fits uint8 (flat.py stores depth as uint8)
    float worst[260];
    bool has[260];
    std::memset(has, 0, sizeof(has));
    worst[last_rank] = score0;
    has[last_rank] = true;
    for (size_t k = 1; k < data.size(); ++k) {
        float score = data[k].first;
        int32_t node = data[k].second;
        int rank = tax.depth[tax.lca(node, anchor_node)];
        if (rank == last_rank) {
            // same level: nothing (reference :296)
        } else if (rank < last_rank) {
            worst[rank] = score;
            has[rank] = true;
            last_rank = rank;
        } else {  // disorder (:298-308)
            for (int r = rank - 1;; --r) {
                if (has[r]) {
                    float refscore = worst[r];
                    if (refscore != 0.0f)
                        bandfactor = std::max(bandfactor, score / refscore);
                }
                if (r == 0) break;
            }
        }
    }
    // C++ sqrt promotes to double then narrows to float (:276)
    return (float)std::sqrt((double)bandfactor);
}

}  // namespace

extern "C" {

// Pass-0 bookkeeping (rpa.py replay_pass0, reference :497-566).
// qdist_c/qsim_c: the ("q", i, -1) alignment cache, valid where p0_aligned.
// out_i32: [qgroup_n, rtax, lca_allnodes, anchors_support, index_best]
// counters: [p0, p0n] increments.
void taxtk_rpa_pass0(
    int32_t n, const double* scores, const int32_t* idents,
    const int32_t* nodes, const uint8_t* p0_exact, const uint8_t* p0_aligned,
    const float* qdist_c, const float* qsim_c, const int32_t* left,
    const int32_t* right, const int32_t* parent, const int32_t* depth,
    int32_t root, float* querydistance, float* querysimilarity,
    int32_t* qgroup_out, int32_t* out_i32, int32_t* counters) {
    Tax tax{left, right, parent, depth, root};
    std::vector<int32_t> qgroup;
    qgroup.reserve(n);
    int32_t index_best = 0;
    int32_t anchors_support = 0;
    int32_t lca_allnodes = nodes[0];
    int32_t p0 = 0, p0n = 0;

    for (int32_t i = 0; i < n; ++i) {
        float dist, sim;
        if (p0_exact[i]) {
            if (!vec_contains(qgroup, i)) qgroup.push_back(i);
            dist = 0.0f;
            sim = (float)idents[i];
            p0n += 1;
        } else if (p0_aligned[i]) {
            qgroup.push_back(i);
            dist = qdist_c[i];
            sim = std::max(qsim_c[i], (float)idents[i]);
            p0 += 1;
            p0n += 1;
        } else {
            dist = FLT_MAX;
            sim = (float)idents[i];
        }
        querydistance[i] = dist;
        querysimilarity[i] = sim;
        // best-index tie-break (:542-546)
        if (dist < querydistance[index_best]) {
            index_best = i;
        } else if (dist == querydistance[index_best]) {
            if (sim > querysimilarity[index_best]) {
                index_best = i;
            } else if (sim == querysimilarity[index_best] &&
                       scores[i] > scores[index_best]) {
                index_best = i;
            }
        }
        anchors_support = std::max(anchors_support, (int32_t)sim);
        lca_allnodes = tax.lca(lca_allnodes, nodes[i]);
    }

    // keep only records matching the best (dist, sim, score) (:553-562);
    // qgroup is built in increasing i, so it is already sorted
    int32_t rtax = nodes[index_best];
    int32_t kept_n = 0;
    for (int32_t i : qgroup) {
        if (querydistance[i] != querydistance[index_best] ||
            querysimilarity[i] != querysimilarity[index_best] ||
            scores[i] != scores[index_best])
            continue;
        rtax = tax.lca(rtax, nodes[i]);
        qgroup_out[kept_n++] = i;
    }
    out_i32[0] = kept_n;
    out_i32[1] = rtax;
    out_i32[2] = lca_allnodes;
    out_i32[3] = anchors_support;
    out_i32[4] = index_best;
    counters[0] = p0;
    counters[1] = p0n;
}

// Pass 1 (rpa.py replay_pass1, reference :576-733).
// sdist: [qgroup_n, n] row-major — row r holds ("s", i, qgroup_in[r])
// distances (entries the replay never reads may be NaN).
// f32_out: [ival_global, bandfactor_max]
// i32_out: [outgroup_n, lnode_global, unode_global, anchor_count]
// counters: [p1, p1n] increments.
void taxtk_rpa_pass1(
    int32_t n, const double* scores, const int32_t* idents,
    const int32_t* nodes, int32_t qrlength, float exclude,
    const float* querydistance, const float* querysimilarity,
    const int32_t* qgroup_in, int32_t qgroup_n, int32_t rtax,
    int32_t lnode_global_in, int32_t unode_global_in, const float* sdist,
    const int32_t* left, const int32_t* right, const int32_t* parent,
    const int32_t* depth, int32_t root, int32_t* outgroup_out,
    float* f32_out, int32_t* i32_out, int32_t* counters) {
    Tax tax{left, right, parent, depth, root};
    std::vector<int32_t> qgroup(qgroup_in, qgroup_in + qgroup_n);
    std::vector<int32_t> row_of(n, -1);
    for (int32_t r = 0; r < qgroup_n; ++r) row_of[qgroup_in[r]] = r;
    std::vector<int32_t> outgroup;
    int lca_root_dist_min = 255;  // small_unsigned_int max (:579)
    float ival_global = 0.0f;
    int32_t lnode_global = lnode_global_in;
    int32_t unode_global = unode_global_in;
    float bandfactor_max = 1.0f;
    int32_t p1 = 0, p1n = 0, anchor_count = 0;

    std::vector<std::pair<float, int32_t>> band_data;
    std::vector<std::pair<int32_t, int32_t>> outgroup_tmp;  // (index, int dist)
    std::vector<std::pair<int32_t, int32_t>> curated;
    while (true) {  // do-while over anchors (:580-729)
        anchor_count += 1;
        band_data.clear();
        int32_t index_anchor = qgroup.front();
        qgroup.erase(qgroup.begin());
        float qdist = querydistance[index_anchor];
        int32_t rnode = nodes[index_anchor];
        band_data.emplace_back(0.0f, rnode);
        int32_t lnode = rtax;
        float ldist = 0.0f;
        float udist = FLT_MAX;
        outgroup_tmp.clear();
        p1n += n - 1;

        double qpid_upper = 0.0;
        double qpid_thresh_guarantee = 0.0;
        double qpid_thresh_heuristic = 0.0;
        int qsearchscore_thresh_heuristic = 0;  // int! (:602)

        const float* srow = sdist + (int64_t)row_of[index_anchor] * n;
        int32_t i = 0;
        // python-float >= python-int: exact double compare
        while (lnode != root && i < n &&
               scores[i] >= (double)qsearchscore_thresh_heuristic) {
            int32_t cnode = nodes[i];
            double qsearchpid = (double)idents[i] / (double)qrlength;
            double qpid = (double)querysimilarity[i] / (double)qrlength;
            double qpid_thresh =
                std::max(qpid_thresh_guarantee, qpid_thresh_heuristic);

            if (qpid >= qpid_thresh) {
                float dist;
                if (i == index_anchor) {
                    dist = 0.0f;
                } else if (querydistance[i] == 0.0f) {
                    // triangle relation (:620-623)
                    dist = querydistance[index_anchor];
                } else {
                    dist = srow[i];
                    p1 += 1;
                }
                band_data.emplace_back(dist, cnode);

                if (dist == 0.0f) {
                    vec_remove(qgroup, i);  // sequence-identical (:644)
                } else {
                    if (dist <= qdist) {
                        lnode = tax.lca(lnode, cnode);
                        if (dist > ldist) ldist = dist;
                    } else {
                        if (dist < udist) {
                            udist = dist;
                            if (qsearchpid > qpid_upper) {
                                qpid_upper = qsearchpid;
                                qpid_thresh_guarantee =
                                    qsearchpid * 2.0 - 1.0;
                                // float(qsearchpid * exclude): weak
                                // promotion -> float product, then widen
                                qpid_thresh_heuristic =
                                    (double)((float)qsearchpid * exclude);
                            }
                            if (!qsearchscore_thresh_heuristic)
                                qsearchscore_thresh_heuristic =
                                    (int)((float)scores[i] * exclude);
                        }
                        outgroup_tmp.emplace_back(i, (int32_t)dist);
                    }
                }
            }
            i += 1;
        }

        float bandfactor = band_factor(band_data, rnode, tax);
        bandfactor_max = std::max(bandfactor_max, bandfactor);
        float qdist_ex = qdist * bandfactor;
        // quirk: INT_MAX seed, not FLT_MAX (:670)
        float min_upper_dist = (float)2147483647;

        // outgroup curation (:673-687)
        curated.clear();
        for (auto& od : outgroup_tmp) {
            float dist = (float)od.second;
            if (dist > qdist_ex) {
                if (dist > min_upper_dist) continue;  // erase
                if (dist < min_upper_dist) min_upper_dist = dist;
                curated.push_back(od);
            } else {
                if (min_upper_dist > qdist_ex)
                    min_upper_dist = dist;
                else
                    min_upper_dist = std::max(min_upper_dist, dist);
                curated.push_back(od);
            }
        }

        // dead-branch quirk: the FLT_MAX comparison always passes (:690)
        int32_t unode = lnode;
        for (auto& od : curated) {
            float dist = (float)od.second;
            int32_t cnode = nodes[od.first];
            if (dist > min_upper_dist) continue;
            unode = tax.lca(cnode, unode);
            int lca_root_dist = tax.depth[tax.lca(cnode, rtax)];
            if (lca_root_dist > lca_root_dist_min) continue;
            if (lca_root_dist < lca_root_dist_min) {
                lca_root_dist_min = lca_root_dist;
                outgroup.clear();
            }
            if (!vec_contains(outgroup, od.first))
                outgroup.push_back(od.first);
        }

        // interpolation value (:714-719)
        float ival = 0.0f;
        if (unode != lnode && ldist < qdist)
            ival = (qdist - ldist) / (udist - ldist);
        ival_global = std::max(ival, ival_global);
        unode_global = tax.lca(unode_global, unode);
        lnode_global = tax.lca(lnode_global, lnode);

        if (!(!qgroup.empty() && lnode_global != root)) break;
    }

    std::sort(outgroup.begin(), outgroup.end());
    for (size_t k = 0; k < outgroup.size(); ++k) outgroup_out[k] = outgroup[k];
    i32_out[0] = (int32_t)outgroup.size();
    i32_out[1] = lnode_global;
    i32_out[2] = unode_global;
    i32_out[3] = anchor_count;
    f32_out[0] = ival_global;
    f32_out[1] = bandfactor_max;
    counters[0] = p1;
    counters[1] = p1n;
}

// Pass 2 (rpa.py replay_pass2, reference :737-822).
// sdist: [outgroup_n, n] row-major — row r holds ("s", i, outgroup_in[r]).
// qdist2/qsim2: [outgroup_n] — the ("q", anchor, -1) cache per anchor row
// (NaN where never requested; the replay then never reads it).
// f32_out: [ival_global]; i32_out: [unode_global]; counters: [p2, p2n].
void taxtk_rpa_pass2(
    int32_t n, const double* scores, const int32_t* idents,
    const int32_t* nodes, int32_t qrlength, float exclude,
    float bandfactor_max, float* querydistance, float* querysimilarity,
    const int32_t* outgroup_in, int32_t outgroup_n, int32_t lca_allnodes,
    int32_t lnode_global, int32_t unode_global_in, float ival_global_in,
    const float* sdist, const float* qdist2, const float* qsim2,
    const int32_t* left, const int32_t* right, const int32_t* parent,
    const int32_t* depth, int32_t root, float* f32_out, int32_t* i32_out,
    int32_t* counters) {
    Tax tax{left, right, parent, depth, root};
    (void)idents;
    std::vector<int32_t> outgroup(outgroup_in, outgroup_in + outgroup_n);
    std::vector<int32_t> row_of(n, -1);
    for (int32_t r = 0; r < outgroup_n; ++r) row_of[outgroup_in[r]] = r;
    int32_t unode_global = unode_global_in;
    int32_t p2 = 0, p2n = 0;

    while (!outgroup.empty()) {
        int32_t index_anchor = outgroup.front();
        outgroup.erase(outgroup.begin());
        if (unode_global == lca_allnodes) {
            p2n += (querydistance[index_anchor] == FLT_MAX) ? n : n - 1;
            continue;
        }
        double qpid_anchor =
            (double)querysimilarity[index_anchor] / (double)qrlength;
        double qpid_thresh_guarantee = qpid_anchor * 2.0 - 1.0;
        // double * float -> double in C++ (:752)
        double qpid_thresh_heuristic = qpid_anchor * (double)exclude;
        double qpid_thresh =
            std::max(qpid_thresh_guarantee, qpid_thresh_heuristic);
        float qsst = (float)scores[index_anchor] * exclude;
        p2n += 1;
        const int32_t arow = row_of[index_anchor];
        const float* srow = sdist + (int64_t)arow * n;

        int32_t i = 0;
        // python-float >= np.float32: weak promotion -> float compare
        while (i < n && (float)scores[i] >= qsst) {
            double qpid = (double)querysimilarity[i] / (double)qrlength;
            if (qpid >= qpid_thresh) {
                int32_t cnode = nodes[i];
                float dist;
                if (i == index_anchor) {
                    dist = 0.0f;
                } else {
                    p2n += 1;
                    if (tax.is_parent_of(unode_global, cnode) ||
                        cnode == unode_global) {
                        i += 1;
                        continue;
                    }
                    dist = srow[i];
                    p2 += 1;
                    querydistance[i] = dist;
                }

                if (dist == 0.0f) {
                    vec_remove(outgroup, i);
                } else {
                    float qdist_ex;
                    if (querydistance[index_anchor] == FLT_MAX) {
                        // align query <=> anchor (:792-808)
                        float qa_dist = qdist2[arow];
                        float qa_sim = std::max(
                            qsim2[arow], querysimilarity[index_anchor]);
                        querydistance[index_anchor] = qa_dist;
                        querysimilarity[index_anchor] = qa_sim;
                        p2 += 1;
                        qdist_ex = qa_dist * bandfactor_max;
                    } else {
                        qdist_ex =
                            querydistance[index_anchor] * bandfactor_max;
                    }
                    if (dist <= qdist_ex)
                        unode_global = tax.lca(unode_global, cnode);
                }
            }
            i += 1;
        }
    }

    float ival_global = ival_global_in;
    if (unode_global == lnode_global) ival_global = 1.0f;
    f32_out[0] = ival_global;
    i32_out[0] = unode_global;
    counters[0] = p2;
    counters[1] = p2n;
}

// ---------------------------------------------------------------------------
// Batched entry points: one call per pass per macro-batch of record sets.
// A ctypes call + numpy pointer marshalling costs ~10-20 us; per-task calls
// spent more time in glue than the replay itself at production set sizes
// (measured: 0.94 s native vs 0.21 s Python on the 2000-set protein e2e).
// All per-task arrays are concatenated; roff[t] offsets into the record
// axis, qgoff/ogoff/sdoff into the qgroup/outgroup/matrix buffers.

void taxtk_rpa_pass0_batch(
    int32_t m, const int32_t* n_arr, const int64_t* roff,
    const double* scores, const int32_t* idents, const int32_t* nodes,
    const uint8_t* p0_exact, const uint8_t* p0_aligned,
    const float* qdist_c, const float* qsim_c, const int32_t* left,
    const int32_t* right, const int32_t* parent, const int32_t* depth,
    int32_t root, float* qd, float* qs, int32_t* qgroup_out,
    int32_t* out5, int32_t* cnt2) {
    for (int32_t t = 0; t < m; ++t) {
        int64_t o = roff[t];
        taxtk_rpa_pass0(
            n_arr[t], scores + o, idents + o, nodes + o, p0_exact + o,
            p0_aligned + o, qdist_c + o, qsim_c + o, left, right, parent,
            depth, root, qd + o, qs + o, qgroup_out + o, out5 + 5 * t,
            cnt2 + 2 * t);
    }
}

void taxtk_rpa_pass1_batch(
    int32_t m, const int32_t* n_arr, const int64_t* roff,
    const double* scores, const int32_t* idents, const int32_t* nodes,
    const int32_t* qrlen, const float* exclude, const float* qd,
    const float* qs, const int32_t* qgroup, const int32_t* qg_n,
    const int64_t* qg_off, const int32_t* rtax, const int32_t* lnode,
    const int32_t* unode, const float* sdist, const int64_t* sd_off,
    const int32_t* left, const int32_t* right, const int32_t* parent,
    const int32_t* depth, int32_t root, int32_t* outgroup_out,
    float* f32o, int32_t* i32o, int32_t* cnt2) {
    for (int32_t t = 0; t < m; ++t) {
        int64_t o = roff[t];
        taxtk_rpa_pass1(
            n_arr[t], scores + o, idents + o, nodes + o, qrlen[t],
            exclude[t], qd + o, qs + o, qgroup + qg_off[t], qg_n[t],
            rtax[t], lnode[t], unode[t], sdist + sd_off[t], left, right,
            parent, depth, root, outgroup_out + o, f32o + 2 * t,
            i32o + 4 * t, cnt2 + 2 * t);
    }
}

void taxtk_rpa_pass2_batch(
    int32_t m, const int32_t* n_arr, const int64_t* roff,
    const double* scores, const int32_t* idents, const int32_t* nodes,
    const int32_t* qrlen, const float* exclude, const float* bf_max,
    float* qd, float* qs, const int32_t* outgroup, const int32_t* og_n,
    const int64_t* og_off, const int32_t* lca_allnodes,
    const int32_t* lnode, const int32_t* unode, const float* ival,
    const float* sdist, const int64_t* sd_off, const float* qdist2,
    const float* qsim2, const int32_t* left, const int32_t* right,
    const int32_t* parent, const int32_t* depth, int32_t root,
    float* f32o, int32_t* i32o, int32_t* cnt2) {
    for (int32_t t = 0; t < m; ++t) {
        int64_t o = roff[t];
        taxtk_rpa_pass2(
            n_arr[t], scores + o, idents + o, nodes + o, qrlen[t],
            exclude[t], bf_max[t], qd + o, qs + o, outgroup + og_off[t],
            og_n[t], lca_allnodes[t], lnode[t], unode[t], ival[t],
            sdist + sd_off[t], qdist2 + og_off[t], qsim2 + og_off[t],
            left, right, parent, depth, root, f32o + t, i32o + t,
            cnt2 + 2 * t);
    }
}

}  // extern "C"
