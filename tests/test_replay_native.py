"""Native C++ RPA replay (taxtk/native/replay.cpp) vs the parity-pinned
Python replay (models/rpa.py): bit-identical state, counters and GFF3.

The Python replay is differentially pinned against the reference's own
compiled predict() (tests/test_ref_oracle.py); this suite pins the native
replay against the Python one, transitively anchoring it to the reference.
Coverage: randomized DNA corpora (segment splits, revcomp, ties), protein
corpora (fractional distances exercise the int-truncation quirk in the
outgroup tuple, reference :592), and the engine-level GFF3 byte diff.
"""

import random
from unittest import mock

import numpy as np
import pytest

from taxtk.engine.executor import RpaEngine
from taxtk.models.rpa import RpaTask, FLT_MAX
from taxtk.native import replay as native_replay

from fixture_tax import make_taxonomy
from test_rpa import (
    DictStore,
    OracleAligner,
    _aln,
    _resolve,
    _synthesize_case,
    run_engine,
)

pytestmark = pytest.mark.skipif(
    not native_replay.available(), reason="native replay library unavailable"
)


@pytest.fixture
def tax(tmp_path):
    return make_taxonomy(tmp_path, prune=True)


def _run_tasks(tax, qstore, dbstore, recordsets, native, protein=False):
    eng = RpaEngine(
        tax, qstore, dbstore, protein=protein,
        aligner=OracleAligner("protein" if protein else "dna"),
    )
    if native:
        return eng.process_batch(recordsets)
    with mock.patch.object(RpaTask, "_native_ok", lambda self: False):
        return eng.process_batch(recordsets)


def _assert_task_state_equal(a: RpaTask, b: RpaTask, label: str):
    assert a.counters == b.counters, f"{label}: counters diverged"
    assert list(a.qgroup) == list(b.qgroup), f"{label}: qgroup"
    assert list(a.outgroup) == list(b.outgroup), f"{label}: outgroup"
    qa = np.asarray(a.querydistance, np.float32)
    qb = np.asarray(b.querydistance, np.float32)
    np.testing.assert_array_equal(
        qa.view(np.uint32), qb.view(np.uint32),
        err_msg=f"{label}: querydistance bits",
    )
    sa = np.asarray(a.querysimilarity, np.float32)
    sb = np.asarray(b.querysimilarity, np.float32)
    np.testing.assert_array_equal(
        sa.view(np.uint32), sb.view(np.uint32),
        err_msg=f"{label}: querysimilarity bits",
    )
    ra, rb = a.result, b.result
    assert (ra is None) == (rb is None), f"{label}: result presence"
    if ra is not None:
        assert set(ra) == set(rb), f"{label}: result fields"
        for k in ra:
            va, vb = ra[k], rb[k]
            if isinstance(va, (np.floating, float)):
                assert np.float32(va).tobytes() == np.float32(vb).tobytes(), (
                    f"{label}: result[{k}] {va!r} != {vb!r}"
                )
            else:
                assert va == vb, f"{label}: result[{k}] {va!r} != {vb!r}"


def test_randomized_dna_state_parity(tax):
    """30 randomized record sets: full per-task replay state bit-equal."""
    rng = random.Random(9001)
    recordsets, qseqs, refseqs = [], {}, {}
    for case in range(30):
        made = _synthesize_case(rng, tax)
        if made is None:
            continue
        refs, qs, records = made
        qid = f"q{case}"
        for r in records:
            r.query_identifier = qid
            r.reference_identifier = f"c{case}_" + r.reference_identifier
        refseqs.update({f"c{case}_" + k: v for k, v in refs.items()})
        qseqs[qid] = qs["q0"]
        recordsets.append(records)

    t_native = _run_tasks(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets, native=True
    )
    t_python = _run_tasks(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets, native=False
    )
    assert len(t_native) == len(t_python)
    full = 0
    for k, (ta, tb) in enumerate(zip(t_native, t_python)):
        _assert_task_state_equal(ta, tb, f"set {k}")
        if ta.result and ta.result.get("kind") == "full":
            full += 1
    assert full >= 5  # the corpus actually exercised the full 3-pass path


def test_engine_gff3_byte_identical_dna(tax):
    rng = random.Random(4242)
    recordsets, qseqs, refseqs = [], {}, {}
    for case in range(12):
        made = _synthesize_case(rng, tax)
        if made is None:
            continue
        refs, qs, records = made
        qid = f"q{case}"
        for r in records:
            r.query_identifier = qid
            r.reference_identifier = f"c{case}_" + r.reference_identifier
        refseqs.update({f"c{case}_" + k: v for k, v in refs.items()})
        qseqs[qid] = qs["q0"]
        recordsets.append(records)
    out_native = run_engine(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets,
        aligner=OracleAligner("dna"),
    )
    with mock.patch.object(RpaTask, "_native_ok", lambda self: False):
        out_python = run_engine(
            tax, DictStore(qseqs), DictStore(refseqs), recordsets,
            aligner=OracleAligner("dna"),
        )
    assert out_native == out_python
    assert len(out_native.splitlines()) == len(recordsets) + 1


def test_protein_state_parity(tax):
    """Protein mode: fractional distances hit the int-truncation quirk in
    the pass-1 outgroup tuple (reference :592) and the float normalization
    chain; state must still be bit-equal."""
    rng = random.Random(777)
    AA = "ACDEFGHIKLMNPQRSTVWY"
    recordsets, qseqs, refseqs = [], {}, {}
    leaves = ["2111111", "2111112", "2111121", "2211111", "21121", "31"]
    for case in range(15):
        base = "".join(rng.choice(AA) for _ in range(rng.randrange(60, 150)))
        qlen = len(base)
        query = "".join(
            c if rng.random() > 0.1 else rng.choice(AA) for c in base
        )
        qid = f"pq{case}"
        qseqs[qid] = query
        records = []
        for k, taxid in enumerate(leaves):
            if rng.random() < 0.2:
                continue
            prot = "".join(
                c if rng.random() > 0.04 * (k % 4) else rng.choice(AA)
                for c in base
            )
            rid = f"c{case}_p{k}"
            refseqs[rid] = prot
            ident = sum(1 for x, y in zip(prot, query) if x == y)
            score = max(5.0, round(2.0 * ident - qlen * 0.3, 1))
            rec = _aln(qid, 1, qlen, qlen, rid, 1, qlen, score, ident, qlen)
            rec.reference_node = tax.node(taxid)
            records.append(rec)
        if len(records) >= 2:
            recordsets.append(records)

    t_native = _run_tasks(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets,
        native=True, protein=True,
    )
    t_python = _run_tasks(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets,
        native=False, protein=True,
    )
    full = 0
    for k, (ta, tb) in enumerate(zip(t_native, t_python)):
        _assert_task_state_equal(ta, tb, f"protein set {k}")
        if ta.result and ta.result.get("kind") == "full":
            full += 1
    assert full >= 5


def test_pass2_flt_max_anchor_branch(tax):
    """Force the pass-2 query<=>anchor re-alignment branch (:792-808): an
    outgroup anchor whose querydistance stayed FLT_MAX needs the deferred
    ("q", a, -1) value; native must consume it identically."""
    # low-scoring far record (below the pass-0 reeval threshold => never
    # aligned in pass 0 => FLT_MAX) that lands in the outgroup
    qlen = 60
    q = "ACGT" * 15
    refA = q  # exact-ish anchors
    refB = q[:30] + "TTTTGGGGCCAA" + q[42:]
    refC = "TTGACA" * 10
    recs = [
        _aln("q1", 1, 60, qlen, "rA", 1, 60, 100.0, 58, 60),
        _aln("q1", 1, 60, qlen, "rB", 1, 60, 80.0, 45, 60),
        _aln("q1", 1, 60, qlen, "rC", 1, 60, 30.0, 22, 60),
    ]
    mapping = {"rA": "2111111", "rB": "2111121", "rC": "31"}
    _resolve(recs, tax, mapping)
    qstore = DictStore({"q1": q})
    dbstore = DictStore({"rA": refA, "rB": refB, "rC": refC})
    t_native = _run_tasks(tax, qstore, dbstore, [recs], native=True)
    t_python = _run_tasks(tax, qstore, dbstore, [recs], native=False)
    _assert_task_state_equal(t_native[0], t_python[0], "flt-max case")
    # the scenario actually exercised the intended branch on both paths
    assert any(
        d == FLT_MAX
        for d in np.asarray(t_python[0].querydistance, np.float32)
    ) or t_python[0].result is not None
