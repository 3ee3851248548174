"""Macro-batch pipeline parity: RpaEngine.run() must emit byte-identical
GFF3 at every pipeline depth (single batch, many small pipelined batches)
and match the synchronous process_batch driver — the depth-2 overlap in
run() (engine/executor.py) may reorder WORK but never output.

Verified on real TPU hardware the same way (2026-08-19); this keeps the
invariant pinned on the CPU backend.
"""

import io

from taxtk.engine.executor import RpaEngine
from taxtk.engine.recordsets import iter_record_sets
from taxtk.formats.gff3 import PredictionRecord, GFF3_HEADER

from tests.test_engine_mesh import _make_corpus, DictStore


def _gff_run(tax, qseqs, refseqs, recordsets, macro_batch):
    eng = RpaEngine(
        tax, DictStore(qseqs), DictStore(refseqs), macro_batch=macro_batch
    )
    out = io.StringIO()
    eng.run(iter(recordsets), out)
    return out.getvalue()


def test_pipelined_run_matches_sync_and_single_batch(tmp_path):
    tax, qseqs, refseqs, recordsets = _make_corpus(tmp_path, n_cases=30,
                                                   seed=20260819)
    single = _gff_run(tax, qseqs, refseqs, recordsets, macro_batch=10**9)
    piped3 = _gff_run(tax, qseqs, refseqs, recordsets, macro_batch=7)
    piped1 = _gff_run(tax, qseqs, refseqs, recordsets, macro_batch=1)

    eng = RpaEngine(tax, DictStore(qseqs), DictStore(refseqs),
                    macro_batch=10**9)
    prec = PredictionRecord(tax)
    lines = [GFF3_HEADER]
    for task in eng.process_batch(list(recordsets)):
        task.fill_prediction(prec)
        lines.append(prec.print_line())
    sync = "\n".join(lines) + "\n"

    assert single == piped3 == piped1 == sync
    assert single.count("\n") == len(recordsets) + 1
