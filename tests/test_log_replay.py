"""Log-replay differential harness (VERDICT round-1 item 7, SURVEY §7
"hard parts"): the `taxator -l` decision log records every pairwise
alignment and LCA decision (reference: taxonpredictionmodelsequence.hh:
516-534).  Two engines — the batched device path and the per-pair oracle
path — must replay the SAME decisions line by line on a randomized corpus;
any divergence pinpoints the first decision that differs, which is the key
debugging tool for decision-equivalence."""

import io
import random

import pytest

from fixture_tax import make_taxonomy
from taxtk.engine.aligner import BatchAligner
from taxtk.engine.executor import RpaEngine
from test_rpa import _synthesize_case, DictStore, OracleAligner


def _run_logged(tax, qseqs, refseqs, recordsets, aligner):
    out = io.StringIO()
    log = io.StringIO()
    eng = RpaEngine(
        tax, DictStore(qseqs), DictStore(refseqs), aligner=aligner,
        logsink=log,
    )
    eng.run(iter(recordsets), out)
    return out.getvalue(), log.getvalue()


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_decision_log_replay_batched_vs_oracle(tmp_path, seed):
    tax = make_taxonomy(tmp_path, prune=True)
    rng = random.Random(seed)
    recordsets, qseqs, refseqs = [], {}, {}
    for case in range(8):
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
    assert recordsets

    out_b, log_b = _run_logged(
        tax, qseqs, refseqs, recordsets, BatchAligner("dna", dna_backend="myers")
    )
    out_o, log_o = _run_logged(
        tax, qseqs, refseqs, recordsets, OracleAligner("dna")
    )
    assert out_b == out_o
    lines_b = log_b.splitlines()
    lines_o = log_o.splitlines()
    for i, (lb, lo) in enumerate(zip(lines_b, lines_o)):
        assert lb == lo, f"first decision divergence at log line {i}:\n" \
                         f"  batched: {lb}\n  oracle:  {lo}"
    assert len(lines_b) == len(lines_o)
    # the log actually recorded decisions (ID/PASS/ALN/RANGE/STATS lines)
    assert any(l.startswith("ID\t") for l in lines_b)
    assert any("PASS" in l for l in lines_b)
    assert any(l.startswith("STATS\t") for l in lines_b)
