"""Mesh-sharded aligner: dp-sharded batches produce byte-identical engine
output on the 8-device virtual CPU mesh."""

import io
import random

import jax
import pytest

from taxtk.engine.aligner import BatchAligner
from taxtk.engine.executor import RpaEngine
from taxtk.parallel.mesh import make_mesh
from fixture_tax import make_taxonomy
from test_rpa import _synthesize_case, DictStore, run_engine, OracleAligner


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_sharded_engine_matches_oracle(tmp_path):
    tax = make_taxonomy(tmp_path, prune=True)
    rng = random.Random(77)
    recordsets, qseqs, refseqs = [], {}, {}
    for case in range(6):
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

    mesh = make_mesh(8, tp=1)
    sharded = BatchAligner("dna", dna_backend="myers", mesh=mesh)
    out_sharded = run_engine(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets, aligner=sharded
    )
    out_oracle = run_engine(
        tax, DictStore(qseqs), DictStore(refseqs), recordsets,
        aligner=OracleAligner("dna"),
    )
    assert out_sharded == out_oracle
