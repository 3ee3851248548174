"""Long-segment routing: pairs beyond the VMEM pattern budget fall back to
the native host Myers, mixed transparently with device-bucketed pairs."""

import random

import numpy as np

from taxtk.engine.aligner import BatchAligner
from taxtk.ops import oracle
from taxtk.refpack.store import encode_dna


def test_mixed_long_and_short_pairs():
    rng = random.Random(5)
    aligner = BatchAligner("dna", dna_backend="myers")
    aligner.long_pattern_threshold = 300  # force the long path in-test

    pairs = []
    for _ in range(6):
        la, lb = rng.randint(50, 200), rng.randint(50, 200)
        pairs.append(
            (
                encode_dna("".join(rng.choice("ACGT") for _ in range(la))),
                encode_dna("".join(rng.choice("ACGT") for _ in range(lb))),
            )
        )
    for _ in range(3):  # "long" pairs beyond the threshold
        la, lb = rng.randint(400, 700), rng.randint(400, 700)
        pairs.append(
            (
                encode_dna("".join(rng.choice("ACGT") for _ in range(la))),
                encode_dna("".join(rng.choice("ACGT") for _ in range(lb))),
            )
        )
    rng.shuffle(pairs)

    got = aligner.align_pairs(pairs)
    for (a, b), val in zip(pairs, got):
        want = oracle.dna_align(a, b)
        assert float(val.distance) == float(want.distance)
        assert float(val.similarity) == float(want.similarity)
