"""Format parity tests: tokenizer quirks, alignments TSV, GFF3 roundtrip,
FASTA stores and .fai compatibility, C++ float formatting."""

import numpy as np
import pytest

from taxtk.utils.tokenize import tokenize_single_char, tokenize_multi_char
from taxtk.utils.fmt import cxx_float, cxx_double
from taxtk.formats.alignments import parse_alignment_line
from taxtk.formats.gff3 import PredictionRecord
from taxtk.refpack.store import (
    FaiIndex,
    IndexedFastaStore,
    InMemoryFastaStore,
    encode_dna,
    revcomp_dna,
    decode_dna,
)
from taxtk.utils.errors import ParsingError, SequenceNotFound
from fixture_tax import make_taxonomy


class TestTokenizer:
    def test_trailing_token_always_appended(self):
        # reference utils.hh:77 appends the remainder unconditionally
        assert tokenize_single_char("a\tb", "\t") == ["a", "b", ""]
        assert tokenize_single_char("a\tb\t", "\t") == ["a", "b", ""]
        assert tokenize_single_char("a", "\t") == ["a", ""]
        assert tokenize_single_char("", "\t") == [""]

    def test_fieldnum_limit(self):
        assert tokenize_single_char("a\tb\tc\td", "\t", 2) == ["a", "b", "c\td"]

    def test_trimempty(self):
        assert tokenize_single_char("a;;b", ";", 0, True) == ["a", "b", ""]

    def test_multi_char(self):
        assert tokenize_multi_char("1\t|\t2\t|\trank", "\t|\t", 3) == ["1", "2", "rank"]


class TestCxxFormat:
    def test_float_defaults(self):
        assert cxx_float(0.0) == "0"
        assert cxx_float(100.0) == "100"
        assert cxx_float(0.05) == "0.05"
        assert cxx_float(1.0 / 3.0) == "0.333333"
        assert cxx_float(1e7) == "1e+07"
        assert cxx_float(1234.5) == "1234.5"
        assert cxx_double(1e-100) == "1e-100"
        assert cxx_double(0.001) == "0.001"


class TestAlignmentRecord:
    LINE = "q1\t5\t50\t100\tr1\t10\t55\t81.5\t0.001\t40\t46"

    def test_parse(self):
        rec = parse_alignment_line(self.LINE)
        assert rec.query_identifier == "q1"
        assert (rec.query_start, rec.query_stop, rec.query_length) == (5, 50, 100)
        assert rec.reference_identifier == "r1"
        assert (rec.reference_start, rec.reference_stop) == (10, 55)
        assert float(rec.score) == np.float32("81.5")
        assert rec.evalue == 0.001
        assert (rec.identities, rec.alignment_length) == (40, 46)
        assert not rec.masked

    def test_print_roundtrip_with_trailing_tab(self):
        # reference print emits a separator after the CIGAR column
        rec = parse_alignment_line(self.LINE)
        assert rec.print_line() == self.LINE + "\t\t"

    def test_masked(self):
        rec = parse_alignment_line("*" + self.LINE)
        assert rec.masked
        assert rec.print_line().startswith("*q1\t")

    def test_reverse_query_rejected(self):
        with pytest.raises(ParsingError):
            parse_alignment_line("q1\t50\t5\t100\tr1\t10\t55\t81.5\t0.001\t40\t46")

    def test_reverse_reference_allowed(self):
        rec = parse_alignment_line("q1\t5\t50\t100\tr1\t55\t10\t81.5\t0.001\t40\t46")
        assert rec.reference_start > rec.reference_stop

    def test_pid(self):
        rec = parse_alignment_line(self.LINE)
        assert rec.pid == 40 / 100.0


class TestPredictionRecord:
    def test_print_range(self, tmp_path):
        tax = make_taxonomy(tmp_path, prune=True)
        prec = PredictionRecord(tax)
        prec.initialize("contig1", 1000)
        prec.query_feature_begin = 1
        prec.query_feature_end = 500
        prec.rtax = tax.node("2111111")
        prec.interpolation_value = np.float32(0.25)
        prec.set_node_range(tax.node("2111111"), tax.node("21111"), 480)
        line = prec.print_line()
        assert line == (
            "contig1\ttaxator-tk\tsequence_feature\t1\t500\t0\t.\t.\t"
            "seqlen=1000;tax=2111111:480-21111;rtax=2111111;ival=0.25"
        )

    def test_print_point_unclassified(self, tmp_path):
        tax = make_taxonomy(tmp_path, prune=True)
        prec = PredictionRecord(tax)
        prec.initialize("c2", 300)
        prec.rtax = tax.ROOT
        prec.set_node_point(tax.ROOT, 0)
        prec.interpolation_value = -1.0
        assert (
            prec.print_line()
            == "c2\ttaxator-tk\tsequence_feature\t1\t300\t0\t.\t.\tseqlen=300;tax=1;rtax=1"
        )

    def test_rle_support_path(self, tmp_path):
        # distinct supports at intermediate depths are printed; equal ones
        # are compressed and reconstructed on parse
        tax = make_taxonomy(tmp_path, prune=True)
        prec = PredictionRecord(tax)
        prec.initialize("c3", 800)
        prec.rtax = tax.node("2111111")
        prec.set_node_range(
            tax.node("2111111"), tax.node("21"), lower_support=100, upper_support=300
        )
        prec.set_support_at(tax.node("211111"), 100)  # same as lower -> compressed
        prec.set_support_at(tax.node("21111"), 200)
        line = prec.print_line()
        assert "tax=2111111:100-21111:200-2111:300-21" in line

        rt = PredictionRecord(tax).parse(line)
        assert rt.lower_node == tax.node("2111111")
        assert rt.upper_node == tax.node("21")
        assert rt.taxon_support == prec.taxon_support
        assert rt.query_length == 800
        assert rt.interpolation_value == 1.0  # compression default

    def test_parse_ival_and_support(self, tmp_path):
        tax = make_taxonomy(tmp_path, prune=True)
        line = (
            "c4\ttaxator-tk\tsequence_feature\t3\t90\t0\t.\t.\t"
            "seqlen=100;tax=2111121:80-21111;rtax=2111121;ival=0.5"
        )
        rec = PredictionRecord(tax).parse(line)
        assert rec.interpolation_value == 0.5
        assert rec.get_support_at_node(tax.node("2111121")) == 80
        assert rec.get_support_at_node(tax.node("211112")) == 80
        assert rec.get_support_at_node(tax.node("21111")) == 80
        assert rec.get_support_at_node(tax.ROOT) == 0
        # roundtrip
        assert rec.print_line() == line


FASTA = b""">seq1 description here
ACGTACGTAC
GTACGTACGT
ACGT
>seq2
TTTTGGGGCC
AA
"""


class TestFastaStores:
    def test_fai_build_and_load(self, tmp_path):
        fa = tmp_path / "test.fna"
        fa.write_bytes(FASTA)
        idx = FaiIndex.build(str(fa))
        assert idx.names == ["seq1", "seq2"]
        assert idx.lengths == [24, 12]
        assert idx.line_bases == [10, 10]
        assert idx.line_widths == [11, 11]
        idx.save(str(fa) + ".fai")
        idx2 = FaiIndex.load(str(fa) + ".fai")
        assert idx2.names == idx.names and idx2.offsets == idx.offsets

    def test_indexed_store_regions(self, tmp_path):
        fa = tmp_path / "test.fna"
        fa.write_bytes(FASTA)
        store = IndexedFastaStore(str(fa))
        assert store.get_sequence("seq1", 1, 4) == b"ACGT"
        assert store.get_sequence("seq1", 9, 12) == b"ACGT"  # crosses a line
        assert store.get_sequence("seq1", 21, 24) == b"ACGT"
        assert store.get_sequence("seq1", 21, 99) == b"ACGT"  # stop clamped
        assert store.get_sequence("seq2", 1, 12) == b"TTTTGGGGCCAA"
        with pytest.raises(SequenceNotFound):
            store.get_sequence("nope", 1, 5)

    def test_inmemory_full_header_key(self, tmp_path):
        fa = tmp_path / "test.fna"
        fa.write_bytes(FASTA)
        store = InMemoryFastaStore(str(fa))
        # keyed by the FULL header (doc/fileformats.md:71)
        assert store.get_sequence("seq1 description here", 1, 4) == b"ACGT"
        with pytest.raises(SequenceNotFound):
            store.get_sequence("seq1", 1, 4)

    def test_whitelist(self, tmp_path):
        fa = tmp_path / "test.fna"
        fa.write_bytes(FASTA)
        store = InMemoryFastaStore(str(fa), whitelist=["seq2"])
        assert store.get_sequence("seq2", 1, 2) == b"TT"
        with pytest.raises(SequenceNotFound):
            store.get_sequence("seq1 description here", 1, 4)

    def test_encode_revcomp(self):
        codes = encode_dna("ACGTN")
        assert list(codes) == [0, 1, 2, 3, 4]
        assert decode_dna(revcomp_dna(codes)) == "NACGT"
        assert list(encode_dna("acgtx")) == [0, 1, 2, 3, 4]
