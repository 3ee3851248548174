"""Randomized round-trip fuzz for the text formats."""

import random

import numpy as np
import pytest

from taxtk.formats.alignments import parse_alignment_line
from taxtk.formats.gff3 import PredictionRecord
from taxtk.utils.fmt import cxx_float, cxx_double
from fixture_tax import make_taxonomy


def test_alignment_roundtrip_fuzz():
    rng = random.Random(123)
    for _ in range(300):
        qs = rng.randint(1, 1000)
        qe = qs + rng.randint(0, 5000)
        qlen = qe + rng.randint(0, 100)
        rs = rng.randint(1, 100000)
        re = rs + rng.choice([-1, 1]) * rng.randint(0, 5000)
        if re < 1:
            re = 1
        score = rng.choice(["81.5", "100", "0.125", "12345.6", "3"])
        ev = rng.choice(["0", "1e-100", "0.001", "1000", "2.5e-30"])
        ident = rng.randint(0, qe - qs + 1)
        alen = rng.randint(1, 6000)
        line = (
            f"q{rng.randint(0,99)}\t{qs}\t{qe}\t{qlen}\tr{rng.randint(0,99)}"
            f"\t{rs}\t{re}\t{score}\t{ev}\t{ident}\t{alen}"
        )
        rec = parse_alignment_line(line)
        out = rec.print_line()
        # reparse the printed form: field values must be stable (fixpoint)
        rec2 = parse_alignment_line(out.rstrip("\t"))
        assert rec2.print_line() == out


def test_gff3_roundtrip_fuzz(tmp_path):
    # supports are >= 1: a zero lower-node support is compressed away by the
    # reference's RLE (predictionrecord.hh:298-307), making the encoding
    # lossy there — reproduced faithfully but outside the roundtrip domain
    tax = make_taxonomy(tmp_path, prune=True)
    rng = random.Random(77)
    nodes = list(range(tax.size))
    for _ in range(200):
        lower = rng.choice(nodes)
        chain = tax.path_up(lower)
        upper = rng.choice(chain)
        prec = PredictionRecord(tax)
        prec.initialize(f"c{rng.randint(0,9)}", rng.randint(10, 100000))
        prec.query_feature_begin = rng.randint(1, 50)
        prec.query_feature_end = prec.query_feature_begin + rng.randint(0, 2000)
        prec.rtax = rng.choice(nodes)
        prec.set_node_range(
            lower,
            upper,
            lower_support=rng.randint(1, 70000),
            upper_support=rng.randint(1, 70000),
        )
        # random supports at intermediate depths
        for node in tax.path_up(lower):
            if node == upper:
                break
            if rng.random() < 0.5:
                prec.set_support_at(node, rng.randint(1, 70000))
        iv = rng.choice([-1.0, 0.0, 0.25, 0.999, 1.0])
        prec.interpolation_value = iv
        line = prec.print_line()
        rt = PredictionRecord(tax).parse(line)
        assert rt.lower_node == prec.lower_node
        assert rt.upper_node == prec.upper_node
        assert rt.taxon_support == prec.taxon_support, line
        assert rt.print_line() == line
