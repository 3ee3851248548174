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


def test_tpu_long_routing_results_match_oracle(monkeypatch):
    """Long pairs (pattern > 6144) route through the chunked pallas path
    when the backend is myers-pallas; on CPU we pin it to interpret mode
    to exercise the real kernel + finisher wiring end-to-end."""
    import numpy as np

    from taxtk.engine import aligner as almod
    from taxtk.engine.aligner import BatchAligner
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers_long

    def interp_long(a, b, al, bl, **kw):
        kw.pop("interpret", None)
        return batched_edit_distance_pallas_myers_long(
            a, b, al, bl, block_words=8, text_chunk=256, interpret=True,
            lazy=kw.get("lazy", False),
        )

    import taxtk.ops.pallas_myers as pm
    import taxtk.ops.pallas_myers_systolic as pms

    monkeypatch.setattr(
        pm, "batched_edit_distance_pallas_myers_long", interp_long
    )
    real_systolic = pms.batched_edit_distance_systolic

    def interp_systolic(a, b, al, bl, **kw):
        kw.pop("interpret", None)
        return real_systolic(
            a, b, al, bl, block_words=2, sub_tile=2, text_chunk=64,
            interpret=True, lazy=kw.get("lazy", False),
        )

    monkeypatch.setattr(
        pms, "batched_edit_distance_systolic", interp_systolic
    )

    rng = np.random.default_rng(3)
    pairs = []
    for m, n in [(600, 700), (900, 650), (1200, 1300), (80, 90), (2500, 900)]:
        pairs.append(
            (
                rng.integers(0, 4, m).astype(np.uint8),
                rng.integers(0, 4, n).astype(np.uint8),
            )
        )
    # (2500, 900): pattern 900 <= cap but min=900 > threshold -> tpu_long;
    # (80, 90) -> normal bucket path.  Run both long routes: the
    # block-systolic kernel (chunks below systolic_max_pairs) and the
    # pair-tile chunked kernel (systolic_max_pairs = 0 forces it).
    for systolic_max in (512, 0):
        al = BatchAligner(mode="dna", dna_backend="myers-pallas")
        al.long_pattern_threshold = 500  # force long routing at test sizes
        al.tpu_long_pattern_cap = 2000
        al.tpu_long_text_cap = 4000
        al.systolic_max_pairs = systolic_max
        got = al.align_pairs(pairs)
        for (a, b), v in zip(pairs, got):
            want = oracle.edit_distance(a, b)
            assert int(v.distance) == want, systolic_max
