"""Binner + consensus tests against hand-computed expectations."""

import io

import pytest

from taxtk.binning.binner import run_binner, write_bioboxes_header
from taxtk.binning.consensus import combine_prediction_ranges
from taxtk.formats.gff3 import PredictionRecord, BINNING_DIRECT, BINNING_FALLBACK
from fixture_tax import make_taxonomy


@pytest.fixture
def tax(tmp_path):
    t = make_taxonomy(tmp_path, prune=True)
    t.version = "deadbeef"
    return t


def _seg(tax, qid, qlen, lower, upper, support, begin=1, end=None):
    prec = PredictionRecord(tax)
    prec.initialize(qid, qlen)
    prec.query_feature_begin = begin
    prec.query_feature_end = end or qlen
    prec.rtax = tax.node(lower)
    prec.set_node_range(tax.node(lower), tax.node(upper), support)
    return prec


class TestCombine:
    def test_direct_mode_majority(self, tax):
        # two segments agree on E. coli lineage, one is Bacillus:
        # direct support on the shared lineage clears the threshold
        segs = [
            _seg(tax, "c1", 500, "2111111", "1", 300),
            _seg(tax, "c1", 500, "2111111", "1", 250),
            _seg(tax, "c1", 500, "2211111", "1", 60),
        ]
        prec = combine_prediction_ranges(segs, "c1", tax, 0.7, 50)
        assert prec.binning_type == BINNING_DIRECT
        # majority branch is E. coli; threshold = max(0.7*610, 50) = 427
        # direct support along E. coli path = 300+250 = 550 >= 427 at each
        # level down to species
        assert tax.taxid_of(prec.lower_node) == "2111111"
        assert prec.query_length == 500  # same query id counted once

    def test_fallback_mode(self, tax):
        # conflicting deep assignments with low per-branch support ->
        # fallback to total support at the deepest node above threshold
        segs = [
            _seg(tax, "c2", 400, "2111111", "211111", 100),
            _seg(tax, "c2", 400, "2211111", "221111", 90),
        ]
        # threshold = max(0.7*190, 120) = 133 -> no single level has direct
        # support >= 133 below the divergence... but the root does (190)
        prec = combine_prediction_ranges(segs, "c2", tax, 0.7, 120)
        assert prec.binning_type in (BINNING_DIRECT, BINNING_FALLBACK)

    def test_uint16_wrap_parity(self, tax):
        # summed support wraps at 65536 like the reference's
        # medium_unsigned_int accumulation (types.hh:35)
        segs = [
            _seg(tax, "c3", 70000, "2111111", "1", 40000),
            _seg(tax, "c3", 70000, "2111111", "1", 40000),
        ]
        prec = combine_prediction_ranges(segs, "c3", tax, 0.7, 50)
        # 40000+40000 = 80000 -> wraps to 14464; threshold = 0.7*14464 = 10124
        # direct support at each E.coli level = 14464 >= 10124 -> direct mode
        assert prec.binning_type == BINNING_DIRECT
        assert prec.get_support_at_node(prec.lower_node) == (80000) % 65536


GFF3_INPUT = """##gff-version 3
contig1\ttaxator-tk\tsequence_feature\t1\t500\t0\t.\t.\tseqlen=1200;tax=2111111:480-21111;rtax=2111111;ival=0.25
contig1\ttaxator-tk\tsequence_feature\t600\t1100\t0\t.\t.\tseqlen=1200;tax=2111111:400-211111;rtax=2111111
contig2\ttaxator-tk\tsequence_feature\t1\t300\t0\t.\t.\tseqlen=300;tax=2211111:250-22111;rtax=2211111
"""


class TestRunBinner:
    def test_basic(self, tax, capsys):
        out = io.StringIO()
        run_binner(
            tax,
            [io.StringIO(GFF3_INPUT)],
            out,
            sample_identifier="testsample",
        )
        text = out.getvalue()
        lines = text.splitlines()
        assert lines[0].startswith("# This is the bioboxes.org")
        assert "@Version:0.9.1" in lines
        assert "@SampleID:testsample" in lines
        assert "@TaxonomyID:deadbeef" in lines
        assert "@_TaxatorTK_Version:1.5.0" in lines
        assert "@@SequenceID\tTaxID\t_TaxatorTK_Support\t_TaxatorTK_Length" in lines
        body = [l for l in lines if l and not l.startswith(("#", "@"))]
        assert len(body) == 2
        # contig1: two segments combined; contig2 single -> upper node taxid
        c1 = [l for l in body if l.startswith("contig1\t")][0]
        c2 = [l for l in body if l.startswith("contig2\t")][0]
        assert c2.split("\t")[1] == "22111"  # single record -> upper node
        assert c2.split("\t")[3] == "300"
        # contig1 consensus: threshold max(0.7*880,50)=616; direct support
        # reaches 880 at genus+species; the binner reports the consensus
        # UPPER node (binner.cpp:333-335) -> genus
        assert c1.split("\t")[1] == "211111"
        assert c1.split("\t")[3] == "1200"

    def test_bioboxes_reader_roundtrip(self, tax):
        """Writer -> BioboxesReader round trip (reference parser semantics,
        bioboxes.hh:104-209): header variables, custom column indices,
        body values."""
        from taxtk.formats.bioboxes import BioboxesReader

        out = io.StringIO()
        run_binner(
            tax, [io.StringIO(GFF3_INPUT)], out, sample_identifier="rt"
        )
        reader = BioboxesReader(io.StringIO(out.getvalue()))
        assert reader.header_variables["@Version"] == "0.9.1"
        assert reader.header_variables["@SampleID"] == "rt"
        assert reader.header_variables["@TaxonomyID"] == "deadbeef"
        assert reader.columns[0] == "SequenceID"
        assert reader.index_support == 2 and reader.index_length == 3
        rows = list(reader)
        assert sorted(r.seqid for r in rows) == ["contig1", "contig2"]
        by_id = {r.seqid: r for r in rows}
        assert by_id["contig2"].taxid == "22111"
        assert by_id["contig2"].length(reader) == 300
        assert by_id["contig1"].support(reader) > 0

    def test_identity_constraint(self, tax, capsys):
        out = io.StringIO()
        run_binner(
            tax,
            [io.StringIO(GFF3_INPUT)],
            out,
            sample_identifier="s",
            identity_constraints={"species": 0.99},
        )
        body = [
            l
            for l in out.getvalue().splitlines()
            if l and not l.startswith(("#", "@"))
        ]
        c1 = [l for l in body if l.startswith("contig1\t")][0]
        # 880/1200 = 0.73 < 0.99 -> constraint walk stops above species
        assert c1.split("\t")[1] != "2111111"

    def test_glob_regex(self, tax, capsys):
        gff = (
            "orf1_1\ttaxator-tk\tsequence_feature\t1\t100\t0\t.\t.\t"
            "seqlen=100;tax=2111111:90-21111;rtax=2111111\n"
            "orf1_2\ttaxator-tk\tsequence_feature\t1\t80\t0\t.\t.\t"
            "seqlen=80;tax=2111112:70-21111;rtax=2111112\n"
        )
        out = io.StringIO()
        run_binner(
            tax,
            [io.StringIO(gff)],
            out,
            sample_identifier="s",
            glob_regex="([^_]+)_.*",
        )
        body = [
            l
            for l in out.getvalue().splitlines()
            if l and not l.startswith(("#", "@"))
        ]
        assert len(body) == 1
        assert body[0].startswith("orf1\t")
        # lengths of distinct query ids summed
        assert body[0].split("\t")[3] == "180"


class TestBinnerMultiFile:
    def test_files_flag_with_stdin_mix(self, tax, tmp_path, capsys, monkeypatch):
        import io
        import sys
        from taxtk.cli import binner as binner_cli
        import taxtk.taxonomy.flat as flatmod

        # write the taxonomy dump for the CLI to load
        from fixture_tax import write_dump

        write_dump(str(tmp_path))
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))

        part1 = tmp_path / "a.gff3"
        part1.write_text(
            "c1\ttaxator-tk\tsequence_feature\t1\t100\t0\t.\t.\t"
            "seqlen=100;tax=2111111:90-21111;rtax=2111111\n"
        )
        monkeypatch.setattr(
            sys,
            "stdin",
            io.StringIO(
                "c2\ttaxator-tk\tsequence_feature\t1\t80\t0\t.\t.\t"
                "seqlen=80;tax=2211111:70-22111;rtax=2211111\n"
            ),
        )
        rc = binner_cli.main(
            ["-n", "s", "-l", "/dev/null", "-f", str(part1), "-"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        rows = [l for l in out.splitlines() if l and not l.startswith(("#", "@"))]
        assert {r.split("\t")[0] for r in rows} == {"c1", "c2"}
