"""Worker for the real two-process jax.distributed test: joins the
process group, classifies its host shard of a deterministic workload,
and writes a per-host GFF3 part (the reference's split-run workflow,
README.md FAQ#9-10).  Driven by tests/test_distributed_procs.py."""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from taxtk.parallel.distributed import host_shard, initialize

    workdir = sys.argv[1]
    pid = initialize()  # TAXTK_COORDINATOR/NUM_PROCESSES/PROCESS_ID env
    n = int(os.environ["TAXTK_NUM_PROCESSES"])
    assert jax.process_count() == n, jax.process_count()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_refpack_shard import _mini_refpack, _run

    class _P:  # pytest tmp_path stand-in
        def __init__(self, d):
            self.d = d

        def __truediv__(self, name):
            return _P(os.path.join(self.d, name))

        def __str__(self):
            return self.d

        def __fspath__(self):
            return self.d

    n_queries = int(os.environ.get("TAXTK_TEST_NQ", "8"))
    tax, fa, mp, qf, rows, mapping = _mini_refpack(
        _P(workdir), n_queries=n_queries)

    from taxtk.engine.executor import RpaEngine
    from taxtk.engine.recordsets import iter_record_sets
    from taxtk.formats.alignments import parse_alignment_line
    from taxtk.refpack.store import IndexedFastaStore, InMemoryFastaStore

    records = []
    for ln in rows:
        r = parse_alignment_line(ln)
        r.reference_node = tax.node(mapping[r.reference_identifier])
        records.append(r)
    rsets = list(iter_record_sets(iter(records)))
    mine = list(host_shard(iter(rsets), pid, n))

    out = io.StringIO()
    eng = RpaEngine(tax, InMemoryFastaStore(qf), IndexedFastaStore(fa))
    eng.run(iter(mine), out)
    with open(os.path.join(workdir, f"part.{pid}.gff3"), "w") as f:
        f.write(out.getvalue())


if __name__ == "__main__":
    main()
