"""Realignment Placement Algorithm — decision replay over batched alignments.

The reference RPA (reference: core/src/taxonpredictionmodelsequence.hh:326-881)
interleaves pairwise alignments with sequential decision logic.  On TPU the
alignments are 99+% of the cost, so we split the algorithm into

  * three *batchable alignment rounds* whose pair sets are supersets of what
    the reference would compute (supersets are safe: the sequential logic only
    READS distances; extra entries never change decisions), and
  * an exact host *replay* of the reference's control flow between rounds,
    working on flat-taxonomy node indices and float32 arithmetic that mirrors
    the C++ float types operation by operation.

One RpaTask handles one record set (one query segment).  The executor drives
many tasks at once, merging their pair requests into large device batches.

Preserved reference quirks (documented, SURVEY.md section 7):
  * pass-1's score cutoff variable is an `int`, so the float threshold is
    truncated (taxonpredictionmodelsequence.hh:602,659);
  * outgroup candidate distances are stored in an int tuple and re-read as
    float, truncating fractional protein distances (:592,:661,:674);
  * `min_upper_dist` is initialised with INT_MAX but compared against
    FLT_MAX, so the "no outgroup => upper node = root, ival = 1" branch
    (:715-718) is unreachable and the upper node starts at the lower node
    (:670,:690);
  * the interpolation value of a PredictionRecord persists across records in
    the reference's record-reuse pattern: n==0 outputs can inherit the
    previous record's ival (taxator.cpp:66-74 + predictionrecord.hh:255-258).
    The executor replays this serial-mode chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..formats.alignments import AlignmentRecord
from ..formats.gff3 import PredictionRecord
from ..taxonomy.flat import FlatTaxonomy

f32 = np.float32
FLT_MAX = f32(np.finfo(np.float32).max)
# float(INT_MAX) — reference initialises min_upper_dist from int max (:670)
INT_MAX_AS_F32 = f32(2147483647)

# Pair request: ("q", i, -1) = segment_i vs query-range sequence;
#               ("s", i, j) = segment_i vs segment_j (ordered!)
PairKey = Tuple[str, int, int]

# Record sets up to this size request the full segment-vs-segment pair
# matrix in round 0, eliminating the pass-1/2 device rounds (see prepare()).
# Default OFF: measured on the 2000-set protein e2e (v5e via tunnel), the
# +40% alignment cells cost more than the two saved sync round-trips
# (median 1044 vs 1316 Maa/h) — the symmetric-mirror cache alone already
# removes the duplicated (j,i) work.  Worth revisiting on links with much
# higher per-sync latency.
import os as _os

EAGER_ALL_PAIRS_MAX_N = int(_os.environ.get("TAXTK_EAGER_N", "0"))


@dataclass(slots=True)
class AlignValue:
    distance: f32
    similarity: f32


class RpaTask:
    """Replay of one record set through the 3-pass RPA."""

    def __init__(
        self,
        tax: FlatTaxonomy,
        recordset: Sequence[AlignmentRecord],
        exclude_factor: float = 0.5,
        toppercent: float = 0.05,
    ):
        self.tax = tax
        self.recordset = list(recordset)
        self.exclude_factor = f32(exclude_factor)
        # reeval_bandwidth_factor_ = 1 - toppercent (:334)
        self.reeval_factor = f32(1.0 - f32(toppercent))
        self.result: Optional[dict] = None  # final prediction fields
        self.records: List[AlignmentRecord] = []
        self.n = 0
        # replay state
        self.querydistance: List[f32] = []
        self.querysimilarity: List[f32] = []
        self.qgroup: List[int] = []  # sorted set of indices
        self.outgroup: List[int] = []
        self.rtax = -1
        self.lca_allnodes = -1
        self.anchors_support = 0
        self.lnode_global = -1
        self.unode_global = -1
        self.ival_global = f32(0.0)
        self.bandfactor_max = f32(1.0)
        self.pass1_anchor_count = 0
        # per-record counters (STATS parity, :479-486)
        self.counters = dict(p0=0, p0n=0, p1=0, p1n=0, p2=0, p2n=0)
        # decision log (taxator -l, reference logsink; format parity with
        # taxonpredictionmodelsequence.hh — timings are our own)
        self.logging = False
        self.log_lines: List[str] = []
        # protein -l: {PairKey: (a_codes, b_codes)} filled by the executor
        # so +ALN lines can stream the SeqAn alignment art the reference
        # logs (models/alignment_art.py); None outside protein logging
        self.art_seqs = None

    # ------------------------------------------------------------------ logging
    def _log(self, line: str):
        if self.logging:
            self.log_lines.append(line)

    def _name(self, node: int) -> str:
        return self.tax.name_of(node)

    @staticmethod
    def _f2(x) -> str:
        # logsink uses std::fixed setprecision(2) (:347)
        return "%.2f" % float(x)

    def _log_aln(self, tag: str, left: str, right: str, dist, sim,
                 extras: str = "", key=None):
        self._log(
            f"    {tag}ALN {left} <=> {right}\tdist={self._f2(dist)}; "
            f"sim={self._f2(sim)}{extras}"
        )
        self._log_art(key)

    def _log_art(self, key):
        """The `logsink << alignment << endl` slot after a +ALN line:
        SeqAn art for protein (reference :534,:637,:783,:803), a single
        empty line for DNA (the Align object is empty there)."""
        if self.logging and self.art_seqs is not None and key is not None:
            seqs = self.art_seqs.get(key)
            if seqs is not None:
                from .alignment_art import render_alignment_art

                self.log_lines.extend(render_alignment_art(*seqs))
        self._log("")  # the trailing std::endl

    def _log_stats(self, qrseqname: str, n: int):
        c = self.counters
        g = c["p0"] + c["p1"] + c["p2"]
        nrt = self._f2(g / n) if n else ".0"
        self._log(
            f"STATS\t{qrseqname}\t{n}\t{c['p0']}\t{c['p1']}\t{c['p2']}\t{g}"
            f"\t0\t0\t0\t{nrt}"
        )
        self._log("")

    # ------------------------------------------------------------------ helpers
    def _lca(self, a: int, b: int) -> int:
        return self.tax.lca_scalar(int(a), int(b))

    # ------------------------------------------------------- native dispatch
    # The replay passes are the engine's dominant host cost; when the
    # native library is available (and the task neither logs nor rides a
    # mesh merge), the decision replay runs in C++ with identical
    # float32/double semantics (taxtk/native/replay.cpp — diffed against
    # this Python implementation on randomized corpora and against the
    # reference's own compiled predict() via the oracle suite).

    def _native_ok(self) -> bool:
        if self.logging:
            return False
        from ..native import replay as _nr

        return _nr.available()

    def _native_arrays(self):
        arrs = getattr(self, "_na", None)
        if arrs is None:
            records = self.records
            n = self.n
            scores = np.fromiter(
                (r.score for r in records), np.float64, count=n
            )
            idents = np.fromiter(
                (r.identities for r in records), np.int32, count=n
            )
            nodes = np.fromiter(
                (r.reference_node for r in records), np.int32, count=n
            )
            arrs = self._na = (scores, idents, nodes)
        return arrs

    def _native_pass0(self, cache) -> List[PairKey]:
        from ..native import replay as _nr

        n = self.n
        scores, idents, nodes = self._native_arrays()
        exact = np.asarray(self._pass0_exact, np.uint8)
        aligned = np.asarray(self._pass0_aligned, np.uint8)
        qdist_c = np.full(n, np.nan, np.float32)
        qsim_c = np.full(n, np.nan, np.float32)
        for i in np.flatnonzero(aligned):
            v = cache[("q", int(i), -1)]
            qdist_c[i] = v.distance
            qsim_c[i] = v.similarity
        tl, tr, tp, td, root = _nr.tax_arrays(self.tax)
        (qd, qs, qgroup, rtax, lca_allnodes, support, (p0, p0n)) = (
            _nr.rpa_pass0(
                scores, idents, nodes, exact, aligned, qdist_c, qsim_c,
                tl, tr, tp, td, root,
            )
        )
        self.querydistance = qd  # np.float32 array (scalar reads match)
        self.querysimilarity = qs
        self.qgroup = qgroup
        self.rtax = rtax
        self.lca_allnodes = lca_allnodes
        self.anchors_support = support
        self.lnode_global = rtax
        self.unode_global = rtax
        self.counters["p0"] += p0
        self.counters["p0n"] += p0n

        reqs: List[PairKey] = []
        nz = [int(i) for i in np.flatnonzero(qd != np.float32(0.0))]
        for a in qgroup:
            reqs.extend(("s", i, a) for i in nz if i != a)
        return reqs

    def _native_pass1(self, cache) -> List[PairKey]:
        from ..native import replay as _nr

        n = self.n
        scores, idents, nodes = self._native_arrays()
        qd = self.querydistance
        qgroup = self.qgroup
        sdist = np.full((len(qgroup), n), np.nan, np.float32)
        zero = np.float32(0.0)
        for r, a in enumerate(qgroup):
            row = sdist[r]
            for i in range(n):
                if i != a and qd[i] != zero:
                    row[i] = cache[("s", i, a)].distance
        tl, tr, tp, td, root = _nr.tax_arrays(self.tax)
        (outgroup, ival_g, bf_max, lnode_g, unode_g, anchors, (p1, p1n)) = (
            _nr.rpa_pass1(
                scores, idents, nodes, self.qrlength,
                self.exclude_factor, qd, self.querysimilarity, qgroup,
                self.rtax, self.lnode_global, self.unode_global, sdist,
                tl, tr, tp, td, root,
            )
        )
        self.outgroup = outgroup
        self.ival_global = ival_g
        self.lnode_global = lnode_g
        self.unode_global = unode_g
        self.bandfactor_max = bf_max
        self.pass1_anchor_count += anchors
        self.counters["p1"] += p1
        self.counters["p1n"] += p1n

        reqs: List[PairKey] = []
        for a in outgroup:
            reqs.extend(("s", i, a) for i in range(n) if i != a)
            if qd[a] == FLT_MAX:
                reqs.append(("q", a, -1))
        return reqs

    def _native_pass2(self, cache) -> None:
        from ..native import replay as _nr

        n = self.n
        scores, idents, nodes = self._native_arrays()
        outgroup = self.outgroup
        k = len(outgroup)
        sdist = np.full((k, n), np.nan, np.float32)
        qdist2 = np.full(k, np.nan, np.float32)
        qsim2 = np.full(k, np.nan, np.float32)
        for r, a in enumerate(outgroup):
            row = sdist[r]
            for i in range(n):
                if i != a:
                    row[i] = cache[("s", i, a)].distance
            qv = cache.get(("q", a, -1))
            if qv is not None:
                qdist2[r] = qv.distance
                qsim2[r] = qv.similarity
        tl, tr, tp, td, root = _nr.tax_arrays(self.tax)
        ival_g, unode_g, (p2, p2n) = _nr.rpa_pass2(
            scores, idents, nodes, self.qrlength, self.exclude_factor,
            self.bandfactor_max, self.querydistance, self.querysimilarity,
            outgroup, self.lca_allnodes, self.lnode_global,
            self.unode_global, self.ival_global, sdist, qdist2, qsim2,
            tl, tr, tp, td, root,
        )
        self.counters["p2"] += p2
        self.counters["p2n"] += p2n
        self.result = dict(
            kind="full",
            qrstart=self.qrstart,
            qrstop=self.qrstop,
            lnode=self.lnode_global,
            unode=unode_g,
            support=self.anchors_support,
            rtax=self.rtax,
            ival=ival_g,
            signal=f32(0.0),
        )

    @property
    def _root(self) -> int:
        return self.tax.ROOT

    # ------------------------------------------------------------------ phase A
    def prepare(self) -> List[PairKey]:
        """Classify the record set; returns pass-0 pair requests (empty when
        the task resolved immediately: n==0, n==1, or exact-match shortcut)."""
        front = self.recordset[0]
        self.qid = front.query_identifier
        self.qlen = front.query_length

        active = [r for r in self.recordset if not r.masked]
        n = len(active)

        if n == 0:  # unclassified (:359-368)
            qrseqname = f"-1:-1@{self.qid}"
            root_name = self._name(self._root)
            self._log(f"ID\t{qrseqname}")
            self._log(f"  NUMREF\t{n}")
            self._log("")
            self._log(f"    RANGE\t{root_name}\t{root_name}\t{root_name}")
            self._log("")
            self._log(f"STATS\t{qrseqname}\t{n}\t0\t0\t0\t0\t0\t0\t0\t.0")
            self._log("")
            self.result = dict(kind="unclassified")
            return []

        if n == 1:  # single alignment pass-through (:371-388)
            rec = active[0]
            qrseqname = f"{rec.query_start}:{rec.query_stop}@{self.qid}"
            name = self._name(rec.reference_node)
            self._log(f"ID\t{qrseqname}")
            self._log(f"  NUMREF\t{n}")
            self._log(f"  RANGE\t{name}\t{name}\t{self._name(self._root)}")
            self._log("")
            self._log(f"STATS\t{qrseqname}\t{n}\t0\t0\t0\t0\t0\t0\t0\t.0")
            self._log("")
            self.result = dict(
                kind="single",
                qrstart=rec.query_start,
                qrstop=rec.query_stop,
                lnode=rec.reference_node,
                unode=self._root,
                support=rec.identities,
                rtax=rec.reference_node,
                ival=f32(1.0),
            )
            return []

        # query range = union of active record spans (:390-404)
        self.qrstart = min(r.query_start for r in active)
        self.qrstop = max(r.query_stop for r in active)
        self.qrlength = self.qrstop - self.qrstart + 1

        self.qrseqname = f"{self.qrstart}:{self.qrstop}@{self.qid}"
        self._log(f"ID\t{self.qrseqname}")
        self._log(f"  NUMREF\t{n}")

        # stable sort desc by (score, identities) (:412, alignmentsfilter.hh:172)
        self.records = sorted(
            active, key=lambda r: (-float(r.score), -r.identities)
        )
        records = self.records
        self.n = n
        qmax_searchscore = records[0].score

        # exact-match shortcut (:431-472)
        if (
            records[0].alignment_length == self.qrlength
            and records[0].identities == self.qrlength
        ):
            searchscore_best = records[0].score
            lnode = records[0].reference_node
            unode = None
            i = 1
            while True:
                if i == n:
                    unode = self._root
                    break
                searchscore = records[i].score
                if searchscore == searchscore_best:
                    cnode = records[i].reference_node
                    lnode = self._lca(lnode, cnode)
                    self._log(
                        f"    current ref/lower node: ({self._f2(searchscore)}) "
                        f"{self._name(lnode)} (+ {self._name(cnode)} )"
                    )
                else:
                    uscore = searchscore
                    unode = lnode
                    while True:
                        cnode = records[i].reference_node
                        unode = self._lca(unode, cnode)
                        self._log(
                            f"    current upper node: ({self._f2(uscore)}) "
                            f"{self._name(unode)} (+ {self._name(cnode)} at "
                            f"{int(self.tax.depth[self._lca(cnode, lnode)])} )"
                        )
                        i += 1
                        if not (i < n and records[i].score == uscore):
                            break
                    break
                i += 1
            self._log(
                f"  RANGE\t{self._name(lnode)}\t{self._name(lnode)}\t{self._name(unode)}"
            )
            self._log("")
            self._log(f"STATS\t{self.qrseqname}\t{n}\t0\t0\t0\t0\t0\t0\t0\t.0")
            self._log("")
            self.result = dict(
                kind="exact",
                qrstart=self.qrstart,
                qrstop=self.qrstop,
                lnode=lnode,
                unode=unode,
                support=self.qrlength,
                rtax=lnode,
                ival=f32(0.0),
            )
            return []

        # full path: emit pass-0 requests (:497-549)
        self.querydistance = [FLT_MAX] * n
        self.querysimilarity = [f32(0.0)] * n
        threshold = f32(self.reeval_factor * qmax_searchscore)
        self._pass0_exact: List[bool] = []
        self._pass0_aligned: List[bool] = []
        reqs: List[PairKey] = []
        for i, rec in enumerate(records):
            exact = (
                rec.alignment_length == self.qrlength
                and rec.identities == self.qrlength
            )
            aligned = (not exact) and rec.score >= threshold
            self._pass0_exact.append(exact)
            self._pass0_aligned.append(aligned)
            if aligned:
                reqs.append(("q", i, -1))
        # EAGER all-pairs superset: for small record sets, also request every
        # segment-vs-segment pair up front.  Passes 1-2 then find all their
        # distances already cached and contribute NO device rounds, cutting
        # the per-batch sync count from 3 to 1 (supersets are safe — the
        # replay only reads the distances it would have requested; AlignValue
        # is symmetric in the pair, so (i,j) serves (j,i), see
        # executor._align_round's mirror fill).  n*(n-1)/2 extra pairs is a
        # good trade only while n is small; the reference's sequential
        # pass-1/2 loops align O(n) per anchor (hh:576-733).
        if n <= EAGER_ALL_PAIRS_MAX_N:
            for i in range(n):
                for j in range(i + 1, n):
                    reqs.append(("s", i, j))
        return reqs

    # ------------------------------------------------------------------ phase B
    def pass0_values(self, i: int, cache: Dict[PairKey, AlignValue]):
        """(distance, similarity) of record i after pass 0 — exact records
        are 0/identities, aligned records read the cache, everything else is
        FLT_MAX/identities (:507-549)."""
        rec = self.records[i]
        if self._pass0_exact[i]:
            return f32(0.0), f32(rec.identities)
        if self._pass0_aligned[i]:
            aln = cache[("q", i, -1)]
            return aln.distance, max(aln.similarity, f32(rec.identities))
        return FLT_MAX, f32(rec.identities)

    def pass0_table(self, cache: Dict[PairKey, AlignValue]):
        """Per-record (distances, similarities) lists for the collective
        pass-0 merge (parallel/engine_mesh.py)."""
        vals = [self.pass0_values(i, cache) for i in range(self.n)]
        return [v[0] for v in vals], [v[1] for v in vals]

    def pass0_table_arrays(self, cache: Dict[PairKey, AlignValue]):
        """Vectorized pass0_table: (dists f32[n], sims f32[n]) — the
        per-record Python loop was the dominant cost of the collective
        merge stage at scale (measured 17-20% of engine time on the
        8-device virtual mesh; bench_mesh_overhead.py)."""
        n = self.n
        exact = np.asarray(self._pass0_exact, bool)
        aligned = np.asarray(self._pass0_aligned, bool)
        scores, idents, nodes = self._native_arrays()
        identsf = idents.astype(np.float32)
        qdist_c = np.zeros(n, np.float32)
        qsim_c = np.zeros(n, np.float32)
        for i in np.flatnonzero(aligned):
            v = cache[("q", int(i), -1)]
            qdist_c[i] = v.distance
            qsim_c[i] = v.similarity
        dists = np.where(exact, np.float32(0.0),
                         np.where(aligned, qdist_c, FLT_MAX))
        sims = np.where(exact, identsf,
                        np.where(aligned, np.maximum(qsim_c, identsf),
                                 identsf))
        return dists, sims, nodes

    def replay_pass0(
        self, cache: Dict[PairKey, AlignValue], merged: Optional[dict] = None
    ) -> List[PairKey]:
        """Pass-0 bookkeeping (:497-566) and pass-1 pair superset.

        When `merged` is given (the dp×tp collective merge result from
        MeshEngineBackend.pass0_merge), the device is authoritative for the
        pass-0 reductions — best-candidate tie-break, rtax LCA, all-nodes
        LCA and max support — and the host loop only fills the per-record
        distance/similarity state.  The logging path recomputes on host
        (the decision log prints the incremental LCA chain) and then
        CROSS-CHECKS the collective result against the host reductions —
        a logged mesh run is a built-in differential test of the merge
        (it fails loudly on divergence instead of silently bypassing)."""
        self._use_native = merged is None and self._native_ok()
        if self._use_native:
            return self._native_pass0(cache)
        use_merged = merged is not None and not self.logging
        records = self.records
        n = self.n
        tax = self.tax
        qgroup: List[int] = []
        index_best = 0
        anchors_support = 0
        lca_allnodes = records[0].reference_node

        self._log("")
        self._log("  PASS\t0")
        for i, rec in enumerate(records):
            qsearchpid = rec.identities / self.qrlength
            if self._pass0_exact[i]:
                if i not in qgroup:
                    qgroup.append(i)
                dist = f32(0.0)
                sim = f32(rec.identities)
                self.counters["p0n"] += 1
                if self.logging:
                    self._log(
                        f"    *ALN {i} <=> query\tdist={self._f2(dist)}; "
                        f"sim={self._f2(sim)}; qsearchscore={self._f2(rec.score)}; "
                        f"qsearchmatch={rec.identities}; qpid=1.0"
                    )
            elif self._pass0_aligned[i]:
                qgroup.append(i)
                aln = cache[("q", i, -1)]
                dist = aln.distance
                sim = max(aln.similarity, f32(rec.identities))
                self.counters["p0"] += 1
                self.counters["p0n"] += 1
                if self.logging:
                    self._log(
                        f"    +ALN {i} <=> query\tdist={self._f2(dist)}; "
                        f"sim={self._f2(sim)}; qsearchscore={self._f2(rec.score)}; "
                        f"qsearchmatch={rec.identities}; "
                        f"qsearchpid={self._f2(qsearchpid)}; "
                        f"qpid={self._f2(float(sim) / self.qrlength)}"
                    )
                    self._log_art(("q", i, -1))
            else:
                dist = FLT_MAX
                sim = f32(rec.identities)
            self.querydistance[i] = dist
            self.querysimilarity[i] = sim
            if not use_merged:
                # best-index tie-break (:542-546)
                if dist < self.querydistance[index_best]:
                    index_best = i
                elif dist == self.querydistance[index_best]:
                    if sim > self.querysimilarity[index_best]:
                        index_best = i
                    elif (
                        sim == self.querysimilarity[index_best]
                        and rec.score > records[index_best].score
                    ):
                        index_best = i
                anchors_support = max(anchors_support, int(sim))
                lca_allnodes = self._lca(lca_allnodes, rec.reference_node)

        if use_merged:
            # device-merged reductions (collectives over the dp×tp mesh)
            index_best = int(merged["best_slot"])
            anchors_support = int(merged["support"])
            lca_allnodes = int(merged["lca_allnodes"])

        # keep only records matching the best (dist, sim, score) (:553-562)
        rtax = records[index_best].reference_node
        kept = []
        for i in sorted(qgroup):
            if (
                self.querydistance[i] != self.querydistance[index_best]
                or self.querysimilarity[i] != self.querysimilarity[index_best]
                or records[i].score != records[index_best].score
            ):
                continue
            cnode = records[i].reference_node
            if not use_merged:
                rtax = self._lca(rtax, cnode)
            if self.logging:
                self._log(
                    f"      current ref node: ({self._f2(self.querydistance[i])}) "
                    f"{self._name(rtax)} (+ {self._name(cnode)} )"
                )
            kept.append(i)
        if use_merged:
            rtax = int(merged["rtax"])
        elif merged is not None:
            # logged run: host reductions were just recomputed for the log
            # chain — assert the collective merge agrees on every field
            got = (
                int(merged["best_slot"]),
                f32(merged["best_dist"]),
                f32(merged["best_sim"]),
                int(merged["support"]),
                int(merged["lca_allnodes"]),
                int(merged["rtax"]),
            )
            want = (
                index_best,
                self.querydistance[index_best],
                self.querysimilarity[index_best],
                anchors_support,
                lca_allnodes,
                rtax,
            )
            if got != want:
                raise RuntimeError(
                    "collective pass-0 merge diverged from host reductions "
                    f"for {self.qrseqname}: device={got} host={want}"
                )
        self._log(
            f"    NUMALN\t{self.counters['p0']}\t"
            f"{self.counters['p0n'] - self.counters['p0']}"
        )
        self._log("")
        self.qgroup = kept
        self.rtax = rtax
        self.lca_allnodes = lca_allnodes
        self.anchors_support = anchors_support
        self.lnode_global = rtax
        self.unode_global = rtax

        # pass-1 superset: every anchor in the snapshot vs every candidate
        # that will need a real alignment (querydistance != 0, not the anchor)
        reqs: List[PairKey] = []
        for a in self.qgroup:
            for i in range(n):
                if i != a and self.querydistance[i] != f32(0.0):
                    reqs.append(("s", i, a))
        return reqs

    # ------------------------------------------------------------------ phase C
    def replay_pass1(self, cache: Dict[PairKey, AlignValue]) -> List[PairKey]:
        """Pass 1 (:576-733).  Returns the pass-2 pair superset."""
        if getattr(self, "_use_native", False):
            return self._native_pass1(cache)
        records = self.records
        n = self.n
        root = self._root
        qgroup = list(self.qgroup)
        outgroup: List[int] = []
        lca_root_dist_min = 255  # small_unsigned_int max (:579)
        exclude = self.exclude_factor
        ival_global = f32(0.0)
        lnode_global = self.lnode_global
        unode_global = self.unode_global
        bandfactor_max = f32(1.0)

        self._log("  PASS\t1")
        while True:  # do-while over anchors (:580-729)
            self.pass1_anchor_count += 1
            band_data: List[Tuple[f32, int]] = []
            index_anchor = qgroup.pop(0)
            qdist = self.querydistance[index_anchor]
            rnode = records[index_anchor].reference_node
            band_data.append((f32(0.0), rnode))
            lnode = self.rtax
            unode: Optional[int] = None
            ldist = f32(0.0)
            udist = FLT_MAX
            outgroup_tmp: List[Tuple[int, int]] = []  # (index, int-dist) (:592)
            if self.logging:
                self._log(f"      query: ({self._f2(qdist)}) unknown")
            self.counters["p1n"] += n - 1

            qpid_upper = 0.0
            qpid_thresh_guarantee = 0.0
            qpid_thresh_heuristic = 0.0
            qsearchscore_thresh_heuristic = 0  # int! (:602)

            i = 0
            while (
                lnode != root
                and i < n
                and records[i].score >= qsearchscore_thresh_heuristic
            ):
                cnode = records[i].reference_node
                qsearchpid = float(records[i].identities) / self.qrlength
                qpid = float(self.querysimilarity[i]) / self.qrlength
                qpid_thresh = max(qpid_thresh_guarantee, qpid_thresh_heuristic)

                if qpid >= qpid_thresh:
                    if i == index_anchor:
                        dist = f32(0.0)
                    elif self.querydistance[i] == f32(0.0):
                        # triangle relation (:620-623)
                        dist = self.querydistance[index_anchor]
                    else:
                        aln = cache[("s", i, index_anchor)]
                        dist = aln.distance
                        self.counters["p1"] += 1
                        if self.logging:
                            self._log_aln(
                            "+",
                            str(i),
                            str(index_anchor),
                            dist,
                            aln.similarity,
                            f"; qsearchscore={self._f2(records[i].score)}; "
                            f"qsearchmatch={records[i].identities}; "
                            f"qsearchpid={self._f2(qsearchpid)}; qpid={self._f2(qpid)}; "
                            f"qsearchscore_cut={qsearchscore_thresh_heuristic}; "
                            f"qpid_cutg={self._f2(qpid_thresh_guarantee)}; "
                            f"qpid_cut_h={self._f2(qpid_thresh_heuristic)}",
                            key=("s", i, index_anchor),
                        )

                    band_data.append((dist, cnode))

                    if dist == f32(0.0):
                        if i in qgroup:
                            qgroup.remove(i)  # sequence-identical (:644)
                    else:
                        if dist <= qdist:
                            lnode = self._lca(lnode, cnode)
                            if dist > ldist:
                                ldist = dist
                            if self.logging:
                                self._log(
                                    f"      current lower node: ({self._f2(dist)}) "
                                    f"{self._name(lnode)} (+ {self._name(cnode)} at "
                                    f"{int(self.tax.depth[self._lca(cnode, rnode)])} )"
                                )
                        else:
                            if dist < udist:
                                udist = dist
                                if qsearchpid > qpid_upper:
                                    qpid_upper = qsearchpid
                                    qpid_thresh_guarantee = qsearchpid * 2.0 - 1.0
                                    qpid_thresh_heuristic = float(
                                        qsearchpid * exclude
                                    )
                                if not qsearchscore_thresh_heuristic:
                                    qsearchscore_thresh_heuristic = int(
                                        f32(records[i].score * exclude)
                                    )
                            outgroup_tmp.append((i, int(dist)))
                i += 1

            bandfactor = self._band_factor(band_data, rnode)
            bandfactor_max = max(bandfactor_max, bandfactor)
            qdist_ex = f32(qdist * bandfactor)
            if self.logging:
                self._log("")
                self._log(
                    f"    EXT\tquerydist = {self._f2(qdist)}; threshold = "
                    f"{self._f2(qdist_ex)}; bandfactor = {self._f2(bandfactor)}"
                )
            min_upper_dist = INT_MAX_AS_F32  # quirk: INT_MAX, not FLT_MAX (:670)

            # outgroup curation (:673-687)
            curated: List[Tuple[int, int]] = []
            for idx, dist_i in outgroup_tmp:
                dist = f32(dist_i)
                if dist > qdist_ex:
                    if dist > min_upper_dist:
                        continue  # erase
                    if dist < min_upper_dist:
                        min_upper_dist = dist
                    curated.append((idx, dist_i))
                else:
                    if min_upper_dist > qdist_ex:
                        min_upper_dist = dist
                    else:
                        min_upper_dist = max(min_upper_dist, dist)
                    curated.append((idx, dist_i))

            # dead-branch quirk: the FLT_MAX comparison always passes (:690)
            unode = lnode
            for idx, dist_i in curated:
                dist = f32(dist_i)
                cnode = records[idx].reference_node
                if dist > min_upper_dist:
                    continue
                unode = self._lca(cnode, unode)
                if self.logging:
                    self._log(
                        f"      current upper node: ({self._f2(dist)}) "
                        f"{self._name(unode)} (+ {self._name(cnode)} at "
                        f"{int(self.tax.depth[self._lca(cnode, rnode)])} )"
                    )
                lca_root_dist = int(self.tax.depth[self._lca(cnode, self.rtax)])
                if lca_root_dist > lca_root_dist_min:
                    continue
                if lca_root_dist < lca_root_dist_min:
                    lca_root_dist_min = lca_root_dist
                    outgroup = []
                if idx not in outgroup:
                    outgroup.append(idx)

            # interpolation value (:714-719)
            ival = f32(0.0)
            if unode != lnode and ldist < qdist:
                ival = f32((qdist - ldist) / f32(udist - ldist))
            if self.logging:
                self._log("")
                self._log(
                    f"    SCORE\tldist = {self._f2(ldist)}; udist = {self._f2(udist)}; "
                    f"querydist = {self._f2(qdist)}; querydist_ex = {self._f2(qdist_ex)}; "
                    f"ival = {self._f2(ival)}"
                )
                self._log("")

            ival_global = max(ival, ival_global)
            unode_global = self._lca(unode_global, unode)
            lnode_global = self._lca(lnode_global, lnode)

            if not (qgroup and lnode_global != root):
                break

        self._log(
            f"    NUMALN\t{self.counters['p1']}\t"
            f"{self.counters['p1n'] - self.counters['p1']}"
        )
        self._log(f"    NUMOUTGRP\t{len(outgroup)}")
        self._log(
            f"    RANGE\t{self._name(self.rtax)}\t{self._name(lnode_global)}"
            f"\t{self._name(unode_global)}"
        )
        self._log("")
        self.outgroup = sorted(outgroup)
        self.ival_global = ival_global
        self.lnode_global = lnode_global
        self.unode_global = unode_global
        self.bandfactor_max = bandfactor_max

        # pass-2 superset
        reqs: List[PairKey] = []
        for a in self.outgroup:
            for i in range(n):
                if i != a:
                    reqs.append(("s", i, a))
            if self.querydistance[a] == FLT_MAX:
                reqs.append(("q", a, -1))
        return reqs

    def _band_factor(self, data: List[Tuple[f32, int]], anchor_node: int) -> f32:
        """BandFactor (:259-323): score-vs-LCA-rank disorder into a
        multiplicative band sqrt(max(score/refscore))."""
        # sort data[1:] ascending by score; reference std::sort is unstable
        # only for equal scores where the outcome is rank-identical in practice
        head, tail = data[0], sorted(data[1:], key=lambda t: float(t[0]))
        seq = [head] + tail
        bandfactor = f32(1.0)
        score0, a0 = seq[0]
        last_rank = int(self.tax.depth[a0])
        worst: Dict[int, f32] = {last_rank: score0}
        for score, node in seq[1:]:
            rank = int(self.tax.depth[self._lca(node, anchor_node)])
            if rank == last_rank:
                pass
            elif rank < last_rank:
                worst[rank] = score
                last_rank = rank
            else:  # disorder (:298-308)
                r = rank - 1
                while True:
                    if r in worst:
                        refscore = worst[r]
                        if refscore:
                            bandfactor = max(bandfactor, f32(score / refscore))
                    if r == 0:
                        break
                    r -= 1
        # C++ sqrt promotes to double then narrows to float (:276)
        return f32(np.sqrt(np.float64(bandfactor)))

    # ------------------------------------------------------------------ phase D
    def replay_pass2(self, cache: Dict[PairKey, AlignValue]) -> None:
        """Pass 2 (:737-822) and final result assembly (:824-837)."""
        if getattr(self, "_use_native", False):
            return self._native_pass2(cache)
        records = self.records
        n = self.n
        exclude = self.exclude_factor
        outgroup = list(self.outgroup)
        unode_global = self.unode_global
        self._log("  PASS\t2")

        while outgroup:
            index_anchor = outgroup.pop(0)
            if unode_global == self.lca_allnodes:
                if self.querydistance[index_anchor] == FLT_MAX:
                    self.counters["p2n"] += n
                else:
                    self.counters["p2n"] += n - 1
                continue

            qpid_anchor = float(self.querysimilarity[index_anchor]) / self.qrlength
            qpid_thresh_guarantee = qpid_anchor * 2.0 - 1.0
            # double * float -> double in C++ (:752)
            qpid_thresh_heuristic = qpid_anchor * float(exclude)
            qpid_thresh = max(qpid_thresh_guarantee, qpid_thresh_heuristic)
            qsst = f32(records[index_anchor].score * exclude)
            self.counters["p2n"] += 1

            i = 0
            while i < n and records[i].score >= qsst:
                qpid = float(self.querysimilarity[i]) / self.qrlength
                if qpid >= qpid_thresh:
                    cnode = records[i].reference_node
                    if i == index_anchor:
                        dist = f32(0.0)
                    else:
                        self.counters["p2n"] += 1
                        if (
                            self.tax.is_parent_of(unode_global, cnode)
                            or cnode == unode_global
                        ):
                            i += 1
                            continue
                        aln2 = cache[("s", i, index_anchor)]
                        dist = aln2.distance
                        self._log_aln(
                            "+",
                            str(i),
                            str(index_anchor),
                            dist,
                            aln2.similarity,
                            f"; qsearchscore={self._f2(records[i].score)}; "
                            f"qsearchmatch={records[i].identities}; "
                            f"qpid={self._f2(qpid)}",
                            key=("s", i, index_anchor),
                        )
                        self.counters["p2"] += 1
                        self.querydistance[i] = dist

                    if dist == f32(0.0):
                        if i in outgroup:
                            outgroup.remove(i)
                    else:
                        if self.querydistance[index_anchor] == FLT_MAX:
                            # align query <=> anchor (:792-808); the log
                            # line mixes the CURRENT record's identities
                            # (qsearchmatch, :765) with the ANCHOR's
                            # score — reference quirk, mirrored
                            aln = cache[("q", index_anchor, -1)]
                            qa_dist = aln.distance
                            qa_sim = max(
                                aln.similarity, self.querysimilarity[index_anchor]
                            )
                            self._log_aln(
                                "+", "query", str(index_anchor),
                                qa_dist, qa_sim,
                                f"; qsearchscore="
                                f"{self._f2(records[index_anchor].score)}; "
                                f"qsearchmatch={records[i].identities}; "
                                f"qpid={self._f2(float(qa_sim) / self.qrlength)}",
                                key=("q", index_anchor, -1),
                            )
                            self.querydistance[index_anchor] = qa_dist
                            self.querysimilarity[index_anchor] = qa_sim
                            self.counters["p2"] += 1
                            qdist_ex = f32(qa_dist * self.bandfactor_max)
                            self._log(
                                f"      query: ({self._f2(qdist_ex)}) unknown"
                            )
                        else:
                            qdist_ex = f32(
                                self.querydistance[index_anchor] * self.bandfactor_max
                            )
                        if dist <= qdist_ex:
                            unode_global = self._lca(unode_global, cnode)
                            if self.logging:
                                self._log(
                                    f"      current upper node: ({self._f2(dist)}) "
                                    f"{self._name(unode_global)} (+ {self._name(cnode)} at "
                                    f"{int(self.tax.depth[self._lca(cnode, records[index_anchor].reference_node)])} )"
                                )
                i += 1
            # per-iteration trailing endl (:820) — emitted for every
            # outgroup anchor that reaches the candidate loop
            self._log("")

        self._log(
            f"    NUMALN\t{self.counters['p2']}\t"
            f"{self.counters['p2n'] - self.counters['p2']}"
        )

        ival_global = self.ival_global
        if unode_global == self.lnode_global:
            ival_global = f32(1.0)

        self._log(
            f"    RANGE\t{self._name(self.rtax)}\t{self._name(self.lnode_global)}"
            f"\t{self._name(unode_global)}"
        )
        self._log("")
        self._log_stats(self.qrseqname, n)

        self.result = dict(
            kind="full",
            qrstart=self.qrstart,
            qrstop=self.qrstop,
            lnode=self.lnode_global,
            unode=unode_global,
            support=self.anchors_support,
            rtax=self.rtax,
            ival=ival_global,
            signal=f32(0.0),  # anchors_taxsig: min(.0, 1.) (:569,:722-725)
        )

    # ------------------------------------------------------------------ output
    def fill_prediction(self, prec: PredictionRecord) -> None:
        """Write the result into a PredictionRecord, mimicking the reference's
        record-reuse field updates (only `full` sets the signal strength)."""
        r = self.result
        assert r is not None
        prec.initialize(self.qid, self.qlen)
        if r["kind"] == "unclassified":
            # setUnclassified (taxonpredictionmodel.hh:46-49); ival untouched
            prec.set_node_point(self.tax.ROOT, 0)
            prec.rtax = self.tax.ROOT
            return
        prec.query_feature_begin = r["qrstart"]
        prec.query_feature_end = r["qrstop"]
        prec.interpolation_value = float(r["ival"])
        prec.set_node_range(r["lnode"], r["unode"], int(r["support"]))
        prec.rtax = r["rtax"]
        if r["kind"] == "full":
            prec.signal_strength = float(r["signal"])
