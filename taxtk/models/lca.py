"""LCA-family prediction models (no realignment, pure taxonomy reductions).

Port of the reference strategy classes (reference:
core/src/taxonpredictionmodel.hh:36-259) onto the flat taxonomy.  Each model
is a callable: predict(recordset, prec) fills a PredictionRecord; the
unclassified fallback leaves ival untouched (record-reuse parity, see
models/rpa.py quirk notes).
"""

from __future__ import annotations

from typing import List

from ..formats.alignments import AlignmentRecord
from ..formats.gff3 import PredictionRecord
from ..taxonomy.flat import FlatTaxonomy
from ..engine.filters import (
    MinScoreMaxEvalueTopPercentFilter,
    NumBestBitscoreFilter,
    RemoveUnclassifiedFilter,
)


class _Base:
    def __init__(self, tax: FlatTaxonomy):
        self.tax = tax

    def _init(self, recordset, prec: PredictionRecord):
        front = recordset[0]
        prec.initialize(front.query_identifier, front.query_length)

    def _set_unclassified(self, prec: PredictionRecord):
        # reference: taxonpredictionmodel.hh:46-49
        prec.set_node_point(self.tax.ROOT, 0)
        prec.rtax = self.tax.ROOT


class DummyPredictionModel(_Base):
    """Always root (reference: taxonpredictionmodel.hh:57-66)."""

    def predict(self, recordset: List[AlignmentRecord], prec: PredictionRecord):
        self._init(recordset, prec)
        self._set_unclassified(prec)


class LCASimplePredictionModel(_Base):
    """LCA (or LCC) over reference taxa + best-score reference taxon
    (reference: taxonpredictionmodel.hh:70-132)."""

    def __init__(self, tax: FlatTaxonomy, treat_unclassified: bool = False):
        super().__init__(tax)
        self.treat_unclassified = treat_unclassified

    def predict(self, recordset, prec):
        self._init(recordset, prec)
        active = [r for r in recordset if not r.masked]
        if not active:
            self._set_unclassified(prec)
            return
        qrstart, qrstop = active[0].query_start, active[0].query_stop
        if qrstart > qrstop:
            qrstart, qrstop = qrstop, qrstart
        maxscore = active[0].score
        refnodes = []
        for r in active:
            qs, qe = r.query_start, r.query_stop
            if qs > qe:
                qs, qe = qe, qs
            qrstart = min(qrstart, qs)
            qrstop = max(qrstop, qe)
            if r.score > maxscore:
                maxscore = r.score
            if r.reference_node not in refnodes:
                refnodes.append(r.reference_node)
        prec.query_feature_begin = qrstart
        prec.query_feature_end = qrstop

        best_nodes = []
        for r in active:
            if r.score == maxscore and r.reference_node not in best_nodes:
                best_nodes.append(r.reference_node)

        if self.treat_unclassified:
            node = self.tax.lcc_reduce(refnodes)
            prec.set_node_point(node)
            if len(refnodes) != len(best_nodes):
                prec.rtax = self.tax.lcc_reduce(best_nodes)
            else:
                prec.rtax = node
        else:
            node = self.tax.lca_reduce(refnodes)
            prec.set_node_point(node)
            if len(refnodes) != len(best_nodes):
                prec.rtax = self.tax.lca_reduce(best_nodes)
            else:
                prec.rtax = node


class MeganLCAPredictionModel(_Base):
    """MEGAN-like: score/evalue/top-percent filter + min support
    (reference: taxonpredictionmodel.hh:136-163)."""

    def __init__(
        self,
        tax: FlatTaxonomy,
        ignore_unclassified: bool = False,
        toppercent: float = 1.0,
        minscore: float = 0.0,
        minsupport: int = 1,
        maxevalue: float = float("inf"),
    ):
        super().__init__(tax)
        self.filter = MinScoreMaxEvalueTopPercentFilter(minscore, maxevalue, toppercent)
        self.minsupport = minsupport
        self.ignore_unclassified = ignore_unclassified
        self.remove_unclassified = RemoveUnclassifiedFilter(tax)
        self.lca_simple = LCASimplePredictionModel(tax)

    def predict(self, recordset, prec):
        self.filter.filter(recordset)
        if self.ignore_unclassified:
            self.remove_unclassified.filter(recordset)
        if self.filter.support >= self.minsupport:
            self.lca_simple.predict(recordset, prec)
            return
        self._init(recordset, prec)
        self._set_unclassified(prec)


class NBestLCAPredictionModel(_Base):
    """reference: taxonpredictionmodel.hh:242-259"""

    def __init__(self, tax: FlatTaxonomy, n: int = 1):
        super().__init__(tax)
        self.findnbest = NumBestBitscoreFilter(n)
        self.lca_simple = LCASimplePredictionModel(tax)

    def predict(self, recordset, prec):
        self.findnbest.filter(recordset)
        self.lca_simple.predict(recordset, prec)
