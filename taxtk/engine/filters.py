"""Composable alignment-record filters.

Port of the reference mask-based filter set (reference:
core/src/alignmentsfilter.hh).  Filters mutate `masked` flags in place (the
reference calls this filterOut) or reorder the set; masked records stay in
the stream so downstream tools can print them '*'-prefixed.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..formats.alignments import AlignmentRecord
from ..taxonomy.flat import FlatTaxonomy


def first_unmasked(recordset):
    for r in recordset:
        if not r.masked:
            return r
    return None


class MaxBitscoreAlignmentFilter:
    """Pseudo-filter collecting the best-scoring records
    (reference: alignmentsfilter.hh:55-108)."""

    def __init__(self):
        self.best_records: List[AlignmentRecord] = []

    def filter(self, recordset):
        self.best_records = []
        unmasked = [r for r in recordset if not r.masked]
        if not unmasked:
            return
        max_bs = max(float(r.score) for r in unmasked)
        self.best_records = [r for r in unmasked if float(r.score) == max_bs]

    def get_best(self):
        return self.best_records[0] if self.best_records else None


class MinMaxBitscoreFilter:
    """Pseudo-filter recording the min/max score
    (reference: alignmentsfilter.hh:116-164)."""

    def __init__(self):
        self.min_bitscore = 0.0
        self.max_bitscore = 0.0

    def filter(self, recordset):
        scores = [float(r.score) for r in recordset if not r.masked]
        self.min_bitscore = min(scores) if scores else 0.0
        self.max_bitscore = max(scores) if scores else 0.0


class CleanseFDistAlignmentFilter:
    """Experimental combined score+tree-distance filter
    (reference: alignmentsfilter.hh:196-254): keep a core set within a
    score band, mask the rest when (score distance + normalized taxonomy
    distance)/2 exceeds the cutoff."""

    def __init__(self, tax: FlatTaxonomy, t1: float, t2: float):
        self.tax = tax
        self.coreset_threshold = 1.0 - t1
        self.cutoff = t2
        self._sort = SortFilter()

    def filter(self, recordset):
        if not recordset:
            return
        self._sort.filter(recordset)
        it = [r for r in recordset if not r.masked]
        if not it:
            return
        best_bs = float(it[0].score)
        bestnodes = []
        rest_start = 0
        for k, r in enumerate(it):
            if float(r.score) >= self.coreset_threshold * best_bs:
                bestnodes.append(r.reference_node)
                rest_start = k + 1
            else:
                break
        from ..constants import DEFAULT_RANKS

        for r in it[rest_start:]:
            bs_dist = 1.0 - float(r.score) / best_bs
            c_sum = sum(
                self.tax.inter_distances(r.reference_node, n)[2] for n in bestnodes
            )
            tree_dist = c_sum / float(len(bestnodes) * len(DEFAULT_RANKS))
            if (bs_dist + tree_dist) / 2.0 > self.cutoff:
                r.masked = True


class SortFilter:
    """Stable sort desc by (score, identities), masked included
    (reference: alignmentsfilter.hh:172-190)."""

    def filter(self, recordset: List[AlignmentRecord]):
        recordset.sort(key=lambda r: (-float(r.score), -r.identities))


class MinScoreTopPercentFilter:
    """reference: alignmentsfilter.hh:307-341"""

    def __init__(self, minscore: float, toppercent: float):
        self.minscore = minscore
        self.toppercent = toppercent

    def filter(self, recordset):
        max_bs = 0.0
        for r in recordset:
            if not r.masked:
                if r.score < self.minscore:
                    r.masked = True
                elif r.score > max_bs:
                    max_bs = float(r.score)
        cut = (1.0 - self.toppercent) * max_bs
        for r in recordset:
            if not r.masked and r.score < cut:
                r.masked = True


class MinScoreMaxEvalueTopPercentFilter:
    """reference: alignmentsfilter.hh:349-389 — note the final toppercent
    sweep masks records regardless of their existing mask state, and
    `support` counts max-score improvements, not survivors."""

    def __init__(self, minscore: float, maxevalue: float, toppercent: float):
        self.minscore = minscore
        self.maxevalue = maxevalue
        self.toppercent = toppercent
        self.support = 0

    def filter(self, recordset):
        max_bs = 0.0
        self.support = 0
        for r in recordset:
            if not r.masked:
                if r.score < self.minscore or r.evalue > self.maxevalue:
                    r.masked = True
                elif r.score > max_bs:
                    max_bs = float(r.score)
                    self.support += 1
        cut = (1.0 - self.toppercent) * max_bs
        for r in recordset:
            if r.score < cut:
                r.masked = True


class MaxEvalueMinScoreTopPercentFilter:
    """reference: alignmentsfilter.hh:419-455 — max score taken over ALL
    records (even ones masked in the same pass)."""

    def __init__(self, minscore: float, toppercent: float, maxevalue: float):
        self.minscore = minscore
        self.toppercent = toppercent
        self.maxevalue = maxevalue

    def filter(self, recordset):
        max_bs = 0.0
        for r in recordset:
            max_bs = max(max_bs, float(r.score))
            if r.evalue > self.maxevalue or r.score < self.minscore:
                r.masked = True
        if self.toppercent >= 1.0:
            return
        cut = (1.0 - self.toppercent) * max_bs
        for r in recordset:
            if r.score < cut:
                r.masked = True


class MinPIDFilter:
    """reference: alignmentsfilter.hh:394-414 (masks regardless of state)."""

    def __init__(self, minpid: float):
        self.minpid = minpid

    def filter(self, recordset):
        for r in recordset:
            if r.pid < self.minpid:
                r.masked = True


class MinSupportFilter:
    """Mask everything when fewer than minsupport unmasked records
    (reference: alignmentsfilter.hh:463-488)."""

    def __init__(self, minsupport: int):
        self.minsupport = minsupport

    def filter(self, recordset):
        count = sum(not r.masked for r in recordset)
        if count < self.minsupport:
            for r in recordset:
                r.masked = True


class NumBestBitscoreFilter:
    """Keep the nbb best distinct bitscore classes
    (reference: alignmentsfilter.hh:493-537)."""

    def __init__(self, numbestbitscore: int):
        self.numbestbitscore = numbestbitscore

    def filter(self, recordset):
        unmasked = [r for r in recordset if not r.masked]
        if not unmasked:
            return
        by_score = sorted(unmasked, key=lambda r: -float(r.score))
        count = self.numbestbitscore
        lastvalue = float(by_score[0].score)
        k = 1
        while k < len(by_score):
            if float(by_score[k].score) != lastvalue:
                count -= 1
                if count <= 0:
                    break
                lastvalue = float(by_score[k].score)
            k += 1
        for r in by_score[k:]:
            r.masked = True


class BestScorePerReferenceSeqIDFilter:
    """reference: alignmentsfilter.hh:542-569"""

    def filter(self, recordset):
        keep: Dict[str, AlignmentRecord] = {}
        for r in recordset:
            if r.masked:
                continue
            prev = keep.get(r.reference_identifier)
            if prev is not None:
                if prev.score < r.score:
                    prev.masked = True
                    keep[r.reference_identifier] = r
                else:
                    r.masked = True
            else:
                keep[r.reference_identifier] = r


class BestScorePerReferenceTaxIDFilter:
    """Keep only the best-scoring record per reference TAXON (reference:
    alignmentsfilter.hh:577-604; unreachable from any reference binary —
    provided for library completeness, exposed as --keep-best-per-taxid).

    key: record -> taxon key; defaults to the resolved reference node
    (engine context); the CLI passes a seqid->taxid mapping lookup."""

    def __init__(self, key=None):
        self.key = key or (lambda r: r.reference_node)

    def filter(self, recordset):
        keep: Dict[object, AlignmentRecord] = {}
        for r in recordset:
            if r.masked:
                continue
            key = self.key(r)
            prev = keep.get(key)
            if prev is not None:
                if prev.score < r.score:
                    prev.masked = True
                    keep[key] = r
                else:
                    r.masked = True
            else:
                keep[key] = r


class RemoveRedundantFilter:
    """Mask records whose taxon is subsumed by the running LCA; expects a
    sorted set (reference: alignmentsfilter.hh:262-299)."""

    def __init__(self, tax: FlatTaxonomy):
        self.tax = tax

    def filter(self, recordset):
        it = iter(recordset)
        lca = None
        for r in it:
            if not r.masked:
                lca = r.reference_node
                break
        if lca is None:
            return
        for r in it:
            if r.masked:
                continue
            node = r.reference_node
            if node == lca or self.tax.is_parent_of(lca, node):
                r.masked = True
            else:
                lca = int(self.tax.lca(lca, node))


class RemoveUnclassifiedFilter:
    """reference: alignmentsfilter.hh:612-623"""

    def __init__(self, tax: FlatTaxonomy):
        self.tax = tax

    def filter(self, recordset):
        for r in recordset:
            if self.tax.unclassified[r.reference_node]:
                r.masked = True


class TaxonMaskingFilter:
    """Supervised-eval filter: mask alignments whose reference taxon equals
    the query's (reference: alignmentsfilter.hh:633-666)."""

    def __init__(self, staxon: Dict[str, str], rtaxon: Dict[str, str]):
        self.staxon = staxon
        self.rtaxon = rtaxon

    def filter(self, recordset):
        if not recordset:
            return
        qid = recordset[0].query_identifier
        qtax = self.staxon.get(qid)
        if qtax is None:
            import sys

            print(
                f'No mapping for query identifier "{qid}", masking all alignments.',
                file=sys.stderr,
            )
            for r in recordset:
                r.masked = True
            return
        for r in recordset:
            rtax = self.rtaxon.get(r.reference_identifier)
            if rtax is None or rtax == qtax:
                r.masked = True


class RemoveIdentSeqIDFilter:
    """reference: alignmentsfilter.hh:674-700"""

    def __init__(self, extract_re: str):
        import re

        self.regex = re.compile(extract_re)

    def filter(self, recordset):
        if not recordset:
            return
        m = self.regex.match(recordset[0].query_identifier)
        seqid = m.group(1) if m else recordset[0].query_identifier
        for r in recordset:
            if seqid == r.reference_identifier:
                r.masked = True


class RemoveIdentTaxIDFilter:
    """reference: alignmentsfilter.hh:708-745"""

    def __init__(self, seqid2taxid: Dict[str, str], extract_re: str):
        import re

        self.regex = re.compile(extract_re)
        self.seqid2taxid = seqid2taxid

    def filter(self, recordset):
        if not recordset:
            return
        m = self.regex.match(recordset[0].query_identifier)
        seqid = m.group(1) if m else recordset[0].query_identifier
        taxid = self.seqid2taxid.get(seqid)
        if taxid is None:
            import sys

            print(
                f"RemoveIdentTaxIDFilter: Could not map sequence id {seqid} "
                "to TaxID, skipping all records for record set.",
                file=sys.stderr,
            )
            for r in recordset:
                r.masked = True
            return
        for r in recordset:
            if self.seqid2taxid.get(r.reference_identifier) == taxid:
                r.masked = True
