"""FlatTaxonomy property tests.

Ports the invariants of the reference taxonomy test binary
(reference: core/unittest_ncbitaxonomy.cpp:27-231) to the flattened-array
design, plus vectorized-LCA correctness against brute force.
"""

import itertools

import numpy as np
import pytest

from taxtk.utils.errors import TaxonNotFound
from fixture_tax import make_taxonomy, NODES, NAMES


@pytest.fixture
def tax(tmp_path):
    return make_taxonomy(tmp_path)


@pytest.fixture
def pruned(tmp_path):
    return make_taxonomy(tmp_path, prune=True)


def brute_lca(tax, a, b):
    pa = set(tax.path_up(a))
    n = b
    while n not in pa:
        n = int(tax.parent[n])
    return n


class TestConstruction:
    def test_index_size_equals_tree_size(self, tax):
        # unittest_ncbitaxonomy.cpp:48
        assert len(tax.taxid2idx) == tax.size == len(NODES)

    def test_annotation(self, tax):
        # names and ranks resolved for every node (:51-53)
        for taxid, name in NAMES.items():
            i = tax.node(taxid)
            assert tax.name_of(i) == name
        assert tax.rank_of(tax.node("2")) == "superkingdom"
        assert tax.rank_of(tax.node("21111111")) == "no rank"

    def test_nested_set_containment(self, tax):
        # nested-set vs real ancestorship on all pairs (:58-67)
        for a, b in itertools.product(range(tax.size), repeat=2):
            expected = a != b and a in tax.path_up(b)[1:]
            assert bool(tax.is_parent_of(a, b)) == expected

    def test_root_pathlength_invariants(self, tax):
        # depth(child) == depth(parent)+1, root==0 (:70-92)
        assert tax.depth[tax.ROOT] == 0
        for i in range(1, tax.size):
            assert tax.depth[i] == tax.depth[tax.parent[i]] + 1

    def test_unclassified_propagation(self, tax):
        # :94-124
        assert tax.unclassified[tax.node("2112")]
        assert tax.unclassified[tax.node("21121")]  # inherited
        assert not tax.unclassified[tax.node("2111111")]
        assert not tax.unclassified[tax.node("1")]
        assert tax.map_unclassified(tax.node("21121")) == tax.node("211")

    def test_unknown_taxid_raises(self, tax):
        # :221-231
        with pytest.raises(TaxonNotFound):
            tax.node("999999")

    def test_path_up_down_equality(self, tax):
        # up/down path iterator equality over all leaves (:165-204)
        for i in range(tax.size):
            if tax.is_leaf(i):
                up = tax.path_up(i)
                down = tax.path_down(i)
                assert list(reversed(up)) == down


class TestPrune:
    def test_pruned_depths_are_rank_positions_after_normalize(self, tmp_path):
        # after deleteUnmarkedNodes + setRankDistances, superkingdom..species
        # sit exactly at depths 1..7 (unittest_ncbitaxonomy.cpp:127-163)
        from taxtk.constants import DEFAULT_RANKS

        tax = make_taxonomy(tmp_path, prune=True)
        tax.set_rank_distances(DEFAULT_RANKS)
        for i in range(tax.size):
            r = tax.rank_of(i)
            if r in DEFAULT_RANKS:
                assert tax.depth[i] == DEFAULT_RANKS.index(r) + 1, tax.taxid_of(i)

    def test_pruned_taxids_forgotten(self, pruned):
        # strain + no-rank nodes are gone and unknown (taxontree.cpp:55-70)
        with pytest.raises(TaxonNotFound):
            pruned.node("21111111")
        with pytest.raises(TaxonNotFound):
            pruned.node("2112")

    def test_reparenting(self, pruned):
        # unclassified species reparents to the class node
        i = pruned.node("21121")
        assert pruned.taxid_of(int(pruned.parent[i])) == "211"
        # rank-skipping branch: species directly under superkingdom
        j = pruned.node("31")
        assert pruned.taxid_of(int(pruned.parent[j])) == "3"
        assert pruned.depth[j] == 2  # pruned-tree distance, not rank depth

    def test_pruned_depth_consistency(self, pruned):
        for i in range(1, pruned.size):
            assert pruned.depth[i] == pruned.depth[pruned.parent[i]] + 1


class TestQueries:
    def test_lca_vs_brute_force(self, tax):
        idx = np.arange(tax.size)
        rng = np.random.RandomState(0)
        a = rng.choice(idx, 200)
        b = rng.choice(idx, 200)
        got = tax.lca(a, b)
        for x, y, l in zip(a, b, got):
            assert l == brute_lca(tax, int(x), int(y))

    def test_lca_reduce(self, tax):
        nodes = [tax.node("2111111"), tax.node("2111112"), tax.node("2111121")]
        assert tax.lca_reduce(nodes) == tax.node("21111")
        assert tax.lca_reduce([tax.node("2111111")]) == tax.node("2111111")

    def test_lcc(self, tax):
        a, b = tax.node("211111"), tax.node("2111111")
        assert tax.lcc(a, b) == b  # descendant wins
        assert tax.lcc(b, a) == b
        c = tax.node("2211111")
        assert tax.lcc(b, c) == tax.node("2")

    def test_ancestor_at_depth(self, tax):
        i = tax.node("2111111")
        assert tax.ancestor_at_depth(i, 0) == tax.ROOT
        assert tax.ancestor_at_depth(i, 1) == tax.node("2")
        assert tax.taxid_of(int(tax.ancestor_at_depth(i, 3))) == "211"

    def test_path_down_partial(self, tax):
        i = tax.node("2111111")
        start = tax.node("21")
        chain = tax.path_down(i, start)
        assert chain[0] == start and chain[-1] == i
        assert [tax.taxid_of(x) for x in chain] == [
            "21",
            "211",
            "2111",
            "21111",
            "211111",
            "2111111",
        ]


class TestVersionAndGzip:
    def test_gzip_roundtrip(self, tmp_path):
        import gzip
        import os
        from fixture_tax import write_dump
        from taxtk.taxonomy import parse_ncbi_flat_files

        nodes, names = write_dump(str(tmp_path))
        for p in (nodes, names):
            with open(p, "rb") as fh:
                data = fh.read()
            with gzip.open(p + ".gz", "wb") as fh:
                fh.write(data)
        tax = parse_ncbi_flat_files(nodes + ".gz", names + ".gz", "v2")
        assert tax.size == len(NODES)
        assert tax.version == "v2"

    def test_load_from_environment(self, tmp_path, monkeypatch):
        from fixture_tax import write_dump
        from taxtk.taxonomy import load_taxonomy_from_environment

        write_dump(str(tmp_path))
        (tmp_path / "version.txt").write_text("2024-01-01\n")
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))
        tax = load_taxonomy_from_environment()
        assert tax is not None
        assert tax.version == "2024-01-01"
        monkeypatch.delenv("TAXATORTK_TAXONOMY_NCBI")
        assert load_taxonomy_from_environment() is None
