"""Companion tool tests."""

import io

import pytest

from taxtk.cli.tools import (
    strip_fasta_identifiers,
    alignments_to_blasttab,
    map_prot_dna,
)
from taxtk.utils.errors import ParsingError


def test_strip_fasta_identifiers():
    src = io.StringIO(">seq1 long description\nACGT\n>seq2 more\nTTTT\n")
    out = io.StringIO()
    n = strip_fasta_identifiers(src, out)
    assert n == 2
    assert out.getvalue() == ">seq1\nACGT\n>seq2\nTTTT\n"


def test_strip_fasta_duplicate_rejected():
    src = io.StringIO(">a x\nA\n>a y\nC\n")
    with pytest.raises(ParsingError):
        strip_fasta_identifiers(src, io.StringIO())


def test_alignments2blasttab():
    src = io.StringIO("q1\t5\t50\t100\tr1\t10\t55\t81.5\t0.001\t40\t46\n")
    out = io.StringIO()
    assert alignments_to_blasttab(src, out) == 1
    f = out.getvalue().strip().split("\t")
    assert f[0] == "q1" and f[1] == "r1"
    assert f[2] == "86.96"  # 40/46*100
    assert f[6:10] == ["5", "50", "10", "55"]
    assert f[11] == "81.5"


def test_map_prot_dna(tmp_path):
    gff = tmp_path / "genes.gff3"
    gff.write_text(
        "ctg1\tprodigal\tCDS\t101\t400\t.\t+\t0\tID=orf1\n"
        "ctg1\tprodigal\tCDS\t501\t800\t.\t-\t0\tID=orf2\n"
    )
    src = io.StringIO(
        "orf1\t1\t50\t100\trp\t1\t50\t60\t0\t45\t50\n"
        "orf2\t1\t50\t100\trp\t1\t50\t60\t0\t45\t50\n"
    )
    out = io.StringIO()
    assert map_prot_dna(src, out, str(gff)) == 2
    lines = out.getvalue().splitlines()
    f1 = lines[0].split("\t")
    assert f1[0] == "ctg1" and f1[1] == "101" and f1[2] == "250"
    f2 = lines[1].split("\t")
    # '-' strand: qe = 800 - 0*3 = 800, qs = 800 - 150 + 1 = 651
    assert f2[0] == "ctg1" and f2[1] == "651" and f2[2] == "800"
