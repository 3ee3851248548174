"""Filter-chain behavior tests against hand-computed expectations
(reference semantics from alignmentsfilter.hh)."""

import numpy as np
import pytest

from taxtk.formats.alignments import parse_alignment_line
from taxtk.engine.filters import (
    SortFilter,
    MinScoreTopPercentFilter,
    MinScoreMaxEvalueTopPercentFilter,
    MaxEvalueMinScoreTopPercentFilter,
    MinPIDFilter,
    MinSupportFilter,
    NumBestBitscoreFilter,
    BestScorePerReferenceSeqIDFilter,
    RemoveRedundantFilter,
    RemoveUnclassifiedFilter,
    TaxonMaskingFilter,
    MaxBitscoreAlignmentFilter,
    MinMaxBitscoreFilter,
)
from fixture_tax import make_taxonomy


def _rec(score, ident=40, alen=50, rid="r1", qid="q1", evalue=0.0):
    r = parse_alignment_line(
        f"{qid}\t1\t50\t100\t{rid}\t1\t50\t{score}\t{evalue}\t{ident}\t{alen}"
    )
    return r


def masks(rs):
    return [r.masked for r in rs]


class TestScoreFilters:
    def test_min_score_top_percent(self):
        rs = [_rec(100), _rec(95), _rec(80), _rec(10)]
        MinScoreTopPercentFilter(20, 0.1).filter(rs)
        # minscore drops 10; toppercent keeps >= 0.9*100
        assert masks(rs) == [False, False, True, True]

    def test_top_percent_max_includes_masked_scores(self):
        # MaxEvalueMinScoreTopPercent takes the max over ALL records
        rs = [_rec(100, evalue=50.0), _rec(90), _rec(80)]
        MaxEvalueMinScoreTopPercentFilter(0, 0.15, 1.0).filter(rs)
        # 100 masked by evalue but still sets the band: cut = 85
        assert masks(rs) == [True, False, True]

    def test_megan_filter_support_counts_improvements(self):
        rs = [_rec(50), _rec(80), _rec(100)]
        f = MinScoreMaxEvalueTopPercentFilter(0, 1e9, 1.0)
        f.filter(rs)
        assert f.support == 3  # each record improved the max

    def test_min_pid(self):
        rs = [_rec(50, ident=90, alen=100), _rec(50, ident=40, alen=100)]
        MinPIDFilter(0.5).filter(rs)
        assert masks(rs) == [False, True]

    def test_min_support_masks_all(self):
        rs = [_rec(50), _rec(60)]
        MinSupportFilter(3).filter(rs)
        assert masks(rs) == [True, True]

    def test_num_best_bitscore_classes(self):
        rs = [_rec(100), _rec(100), _rec(90), _rec(80)]
        NumBestBitscoreFilter(2).filter(rs)
        # two distinct score classes kept: {100,100,90}
        assert masks(rs) == [False, False, False, True]

    def test_best_per_reference(self):
        rs = [_rec(100, rid="a"), _rec(90, rid="a"), _rec(95, rid="b")]
        BestScorePerReferenceSeqIDFilter().filter(rs)
        assert masks(rs) == [False, True, False]

    def test_best_per_reference_taxid(self):
        # a and b map to the same taxon: only the best of the three survives
        from taxtk.engine.filters import BestScorePerReferenceTaxIDFilter

        taxmap = {"a": "t1", "b": "t1", "c": "t2"}
        rs = [_rec(100, rid="a"), _rec(90, rid="b"), _rec(95, rid="c"),
              _rec(110, rid="b")]
        BestScorePerReferenceTaxIDFilter(
            key=lambda r: taxmap[r.reference_identifier]
        ).filter(rs)
        assert masks(rs) == [True, True, False, False]

    def test_sort_stable_desc(self):
        rs = [_rec(50, ident=10), _rec(100), _rec(50, ident=20)]
        SortFilter().filter(rs)
        assert [float(r.score) for r in rs] == [100.0, 50.0, 50.0]
        assert [r.identities for r in rs] == [40, 20, 10]

    def test_pseudo_filters(self):
        rs = [_rec(50), _rec(100), _rec(70)]
        mb = MaxBitscoreAlignmentFilter()
        mb.filter(rs)
        assert float(mb.get_best().score) == 100.0
        mm = MinMaxBitscoreFilter()
        mm.filter(rs)
        assert (mm.min_bitscore, mm.max_bitscore) == (50.0, 100.0)


class TestTaxonomyFilters:
    @pytest.fixture
    def tax(self, tmp_path):
        return make_taxonomy(tmp_path, prune=True)

    def test_remove_redundant(self, tax):
        # sorted desc; species first, then its genus (subsumed -> masked),
        # then an unrelated species (kept, LCA widens)
        rs = [_rec(100, rid="a"), _rec(90, rid="b"), _rec(80, rid="c")]
        rs[0].reference_node = tax.node("2111111")
        rs[1].reference_node = tax.node("211111")  # ancestor of 2111111? no:
        # genus IS an ancestor, so isParentOf(lca=species, genus) is False ->
        # widens lca instead.  Use a descendant case: lca starts at genus.
        rs[0].reference_node = tax.node("211111")
        rs[1].reference_node = tax.node("2111111")  # child of running LCA
        rs[2].reference_node = tax.node("2211111")
        RemoveRedundantFilter(tax).filter(rs)
        assert masks(rs) == [False, True, False]

    def test_remove_unclassified(self, tax):
        rs = [_rec(100, rid="a"), _rec(90, rid="b")]
        rs[0].reference_node = tax.node("21121")  # unclassified subtree
        rs[1].reference_node = tax.node("2111111")
        RemoveUnclassifiedFilter(tax).filter(rs)
        assert masks(rs) == [True, False]

    def test_taxon_masking(self, tax):
        rs = [_rec(100, rid="refA"), _rec(90, rid="refB")]
        TaxonMaskingFilter(
            {"q1": "2111111"}, {"refA": "2111111", "refB": "2111112"}
        ).filter(rs)
        assert masks(rs) == [True, False]
