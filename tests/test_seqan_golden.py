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


# ---------------------------------------------------------------- round 2
# 3500-pair corpus (tests/tools/gen_golden.py): long DNA to 4 kbp, heavy
# length asymmetry (segment-extension shape), revcomp-structured pairs,
# N/X saturation, identical pairs, gap-dominated + long proteins.  The
# PRODUCTION batched kernels run the whole corpus (bucketed), not a sample.
FIXTURES_R2 = pathlib.Path(__file__).parent / "fixtures" / "seqan_golden_r2.tsv"


def _load_r2(kind):
    rows = []
    for line in FIXTURES_R2.read_text().splitlines():
        if line.startswith("#"):
            continue
        t, a, b, vals = line.split("\t")
        if t == kind:
            rows.append((a, b, vals))
    return rows


def test_dna_golden_r2_batched_kernel():
    """Full r2 DNA corpus through the batched Myers engine service."""
    from taxtk.engine.aligner import BatchAligner

    rows = _load_r2("dna")
    assert len(rows) >= 1500
    pairs = [(encode_dna(a), encode_dna(b)) for a, b, _ in rows]
    values = BatchAligner("dna", dna_backend="myers").align_pairs(pairs)
    for (a, b, vals), got in zip(rows, values):
        assert int(got.distance) == int(vals), (a, b)


def test_protein_golden_r2_batched_kernel():
    """Full r2 protein corpus through the batched wavefront kernel,
    including the reference's exact float32 distance normalization
    (taxonpredictionmodelsequence.hh:228-233)."""
    from taxtk.ops.protein_align import batched_protein_align

    rows = _load_r2("prot")
    assert len(rows) >= 1500
    # bucket by pow2 of max length to bound padding work
    buckets = {}
    for i, (a, b, vals) in enumerate(rows):
        L = 1
        while L < max(len(a), len(b)):
            L <<= 1
        buckets.setdefault(L, []).append(i)
    for L, idxs in buckets.items():
        B = len(idxs)
        ac = np.zeros((B, L), np.uint8)
        bc = np.zeros((B, L), np.uint8)
        al = np.zeros(B, np.int32)
        bl = np.zeros(B, np.int32)
        for r, i in enumerate(idxs):
            a, b, _ = rows[i]
            ea, eb = encode_protein(a), encode_protein(b)
            ac[r, : len(ea)] = ea
            bc[r, : len(eb)] = eb
            al[r], bl[r] = len(ea), len(eb)
        got = batched_protein_align(ac, bc, al, bl)
        for r, i in enumerate(idxs):
            a, b, vals = rows[i]
            self_, mutual, ma, mi, ga = map(int, vals.split(","))
            assert int(got["selfscore"][r]) == self_, (a, b)
            assert int(got["mutual"][r]) == mutual, (a, b)
            assert (
                int(got["matches"][r]),
                int(got["mismatches"][r]),
                int(got["gaps"][r]),
            ) == (ma, mi, ga), (a, b)
            if self_ > 0:
                # replay the reference float32 normalization bit-for-bit
                length = np.int64(ma + mi + ga)
                nf = np.float32(length) / np.float32(self_)
                exp_d = np.float32(np.int64(self_) - 2 * np.int64(mutual)) * nf
                exp_s = np.float32(2 * np.int64(mutual)) * nf
                assert np.float32(got["distance"][r]) == exp_d, (a, b)
                assert np.float32(got["similarity"][r]) == exp_s, (a, b)


def test_protein_golden_swar_kernel_full_corpus():
    """The SWAR 2x16 packed protein kernel (v6) against EVERY SeqAn golden
    protein pair from both corpora (round-5 VERDICT item 1 acceptance:
    zero mismatches on the full golden set).  Buckets whose bias bound
    exceeds the 16-bit half range are out of the SWAR domain by
    construction (_swar_fits) and run it with the guard honored."""
    from taxtk.ops.pallas_protein import (
        _shapes,
        _swar_fits,
        batched_protein_align_pallas,
    )

    rows = [(a, b, vals) for _, a, b, vals in
            (r for r in _load() if r[0] == "prot")]
    rows += _load_r2("prot")
    assert len(rows) >= 2000
    buckets = {}
    for i, (a, b, vals) in enumerate(rows):
        L = 1
        while L < max(len(a), len(b)):
            L <<= 1
        buckets.setdefault(L, []).append(i)
    checked = 0
    for L, idxs in sorted(buckets.items()):
        B = len(idxs)
        ac = np.zeros((B, L), np.uint8)
        bc = np.zeros((B, L), np.uint8)
        al = np.zeros(B, np.int32)
        bl = np.zeros(B, np.int32)
        for r, i in enumerate(idxs):
            a, b, _ = rows[i]
            ea, eb = encode_protein(a), encode_protein(b)
            ac[r, : len(ea)] = ea
            bc[r, : len(eb)] = eb
            al[r], bl[r] = len(ea), len(eb)
        Mp, steps_end, _, _ = _shapes(B, L, L, 8)
        if not _swar_fits(Mp, steps_end):
            continue  # outside the SWAR domain; v5 covers it elsewhere
        got = batched_protein_align_pallas(
            ac, bc, al, bl, sub_tile=8, interpret=True, swar=True
        )
        for r, i in enumerate(idxs):
            a, b, vals = rows[i]
            self_, mutual, ma, mi, ga = map(int, vals.split(","))
            assert int(got["selfscore"][r]) == self_, (a, b)
            assert int(got["mutual"][r]) == mutual, (a, b)
            assert (int(got["matches"][r]), int(got["mismatches"][r]),
                    int(got["gaps"][r])) == (ma, mi, ga), (a, b)
            checked += 1
    assert checked >= 2000
