"""Pallas protein wavefront kernel vs oracle (interpret mode)."""

import random

import numpy as np

from taxtk.ops import oracle
from taxtk.ops.pallas_protein import batched_protein_align_pallas
from taxtk.refpack.store import encode_protein

AA = "ACDEFGHIKLMNPQRSTVWY"


def _batch(pairs):
    B = len(pairs)
    M = max((len(a) for a, _ in pairs), default=1) or 1
    N = max((len(b) for _, b in pairs), default=1) or 1
    ac = np.zeros((B, M), np.uint8)
    bc = np.zeros((B, N), np.uint8)
    al = np.zeros(B, np.int32)
    bl = np.zeros(B, np.int32)
    for i, (a, b) in enumerate(pairs):
        ea, eb = encode_protein(a), encode_protein(b)
        ac[i, : len(ea)] = ea
        bc[i, : len(eb)] = eb
        al[i] = len(ea)
        bl[i] = len(eb)
    return ac, bc, al, bl


def test_pallas_protein_interpret_vs_oracle():
    rng = random.Random(31)
    pairs = []
    for _ in range(16):
        la, lb = rng.randint(1, 70), rng.randint(1, 70)
        pairs.append(
            (
                "".join(rng.choice(AA) for _ in range(la)),
                "".join(rng.choice(AA) for _ in range(lb)),
            )
        )
    # mutated (realistic) pairs exercise tie-heavy tracebacks
    for _ in range(8):
        l = rng.randint(20, 80)
        base = [rng.choice(AA) for _ in range(l)]
        bl_ = list(base)
        for _ in range(rng.randint(0, 6)):
            p = rng.randrange(len(bl_))
            bl_[p] = rng.choice(AA)
        pairs.append(("".join(base), "".join(bl_)))

    ac, bc, al, bl = _batch(pairs)
    got = batched_protein_align_pallas(ac, bc, al, bl, interpret=True)
    for i, (a, b) in enumerate(pairs):
        r = oracle.protein_align(encode_protein(a), encode_protein(b))
        assert got["matches"][i] == r.matches, (a, b)
        assert got["mismatches"][i] == r.mismatches, (a, b)
        assert got["gaps"][i] == r.gaps, (a, b)
        assert got["distance"][i] == r.distance, (a, b)
        assert got["similarity"][i] == r.similarity, (a, b)
