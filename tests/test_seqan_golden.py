"""Committed SeqAn golden fixtures: kernel parity without needing the
reference tree or a compiler (tests/fixtures/seqan_golden.tsv was generated
once by tests/tools/seqan_oracle.cpp against the reference's vendored
SeqAn 2.4.0)."""

import pathlib

import numpy as np

from taxtk.ops import oracle
from taxtk.refpack.store import encode_dna, encode_protein

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "seqan_golden.tsv"


def _load():
    rows = []
    for line in FIXTURES.read_text().splitlines():
        if line.startswith("#"):
            continue
        t, a, b, vals = line.split("\t")
        rows.append((t, a, b, vals))
    return rows


def test_dna_golden():
    n = 0
    for t, a, b, vals in _load():
        if t != "dna":
            continue
        assert oracle.edit_distance(encode_dna(a), encode_dna(b)) == int(vals)
        n += 1
    assert n >= 100


def test_protein_golden():
    n = 0
    for t, a, b, vals in _load():
        if t != "prot":
            continue
        self_, mutual, ma, mi, ga = map(int, vals.split(","))
        ea, eb = encode_protein(a), encode_protein(b)
        r = oracle.protein_align(ea, eb)
        assert oracle.protein_selfscore(ea) + oracle.protein_selfscore(eb) == self_
        assert (r.matches, r.mismatches, r.gaps) == (ma, mi, ga), (a, b)
        n += 1
    assert n >= 200


def test_protein_golden_pallas_kernel():
    """The production Pallas protein kernel (interpret mode) directly
    against the SeqAn-generated fixtures — no oracle middleman."""
    from taxtk.ops.pallas_protein import batched_protein_align_pallas

    rows = [r for r in _load() if r[0] == "prot"]
    assert len(rows) >= 200
    ea = [encode_protein(a) for _, a, b, _ in rows]
    eb = [encode_protein(b) for _, a, b, _ in rows]
    B = len(rows)
    M = max(len(x) for x in ea)
    N = max(len(x) for x in eb)
    ac = np.zeros((B, M), np.uint8)
    bc = np.zeros((B, N), np.uint8)
    al = np.zeros(B, np.int32)
    bl = np.zeros(B, np.int32)
    for i in range(B):
        ac[i, : len(ea[i])] = ea[i]
        bc[i, : len(eb[i])] = eb[i]
        al[i], bl[i] = len(ea[i]), len(eb[i])
    got = batched_protein_align_pallas(ac, bc, al, bl, interpret=True)
    for i, (_, a, b, vals) in enumerate(rows):
        self_, mutual, ma, mi, ga = map(int, vals.split(","))
        assert int(got["selfscore"][i]) == self_, (a, b)
        assert int(got["mutual"][i]) == mutual, (a, b)
        assert (int(got["matches"][i]), int(got["mismatches"][i]),
                int(got["gaps"][i])) == (ma, mi, ga), (a, b)
