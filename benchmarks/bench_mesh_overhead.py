#!/usr/bin/env python
"""Collective-merge overhead at scale (round-4 VERDICT item 7).

Runs a FIXED workload through the engine on the 8-device virtual CPU
mesh in three configurations — single device, dp=8 (pure data
parallel), dp=4 x tp=2 (refpack-sharded columns + pass-0 collective
merge) — and reports, per configuration, the engine wall time and the
time spent in the collective merge stage (metrics "merge"), plus the
merge share of engine time.  Outputs are asserted byte-identical.

Virtual CPU devices time-share the host cores, so absolute throughput
is meaningless here; the COLLECTIVE-MERGE OVERHEAD (merge_s /
engine_s) is the measurement — it upper-bounds the merge cost on real
hardware, where the collectives ride ICI instead of shared-memory
transposes.

Usage: python benchmarks/bench_mesh_overhead.py [--contigs 200]
(sets the virtual-device env itself; run from the repo root).
"""

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=200)
    ap.add_argument("--max-len", type=int, default=8000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, "need 8 virtual devices"

    import io

    import bench_e2e

    from taxtk.constants import DEFAULT_RANKS
    from taxtk.engine.aligner import BatchAligner
    from taxtk.engine.executor import RpaEngine
    from taxtk.engine.recordsets import iter_record_sets
    from taxtk.formats.alignments import iter_alignment_records
    from taxtk.formats.mapping import load_seqid_taxid_mapping
    from taxtk.parallel.mesh import make_mesh
    from taxtk.refpack.store import IndexedFastaStore
    from taxtk.taxonomy.flat import load_taxonomy_from_environment

    with tempfile.TemporaryDirectory() as d:
        aln_path, query_fa, ref_fa, map_path, tax_dir, total_qbp = (
            bench_e2e.make_workload(d, args.contigs, max_len=args.max_len)
        )
        os.environ["TAXATORTK_TAXONOMY_NCBI"] = tax_dir
        tax = load_taxonomy_from_environment(list(DEFAULT_RANKS))
        tax = tax.prune_to_marked_ranks(list(DEFAULT_RANKS))
        seqid2taxid = load_seqid_taxid_mapping(map_path)
        recs = []
        with open(aln_path) as f:
            for _, rec in iter_alignment_records(f):
                rec.reference_node = tax.node(
                    seqid2taxid[rec.reference_identifier])
                recs.append(rec)
        rsets = [list(rs) for rs in iter_record_sets(iter(recs), True, False)]

        configs = [
            ("single", None, None),
            ("dp8", 8, 1),
            ("dp4xtp2", 8, 2),
        ]
        outputs = {}
        rows = []
        for name, n_dev, tp in configs:
            mesh = (make_mesh(n_dev, tp=tp, devices=jax.devices()[:n_dev])
                    if n_dev else None)
            best = None
            for rep in range(args.reps + 1):  # rep 0 = compile warm-up
                aligner = BatchAligner("dna", dna_backend="myers",
                                       mesh=mesh)
                eng = RpaEngine(tax, IndexedFastaStore(query_fa),
                                IndexedFastaStore(ref_fa),
                                aligner=aligner, mesh=mesh)
                sink = io.StringIO()
                t0 = time.time()
                eng.run(iter(rsets), sink)
                dt = time.time() - t0
                if rep == 0:
                    outputs[name] = sink.getvalue()
                    continue
                merge_s = eng.metrics.stage_seconds.get("merge", 0.0)
                if best is None or dt < best["engine_s"]:
                    best = {"engine_s": dt, "merge_s": merge_s}
            rows.append({
                "config": name,
                "engine_s": round(best["engine_s"], 2),
                "merge_s": round(best["merge_s"], 3),
                "merge_pct_of_engine": round(
                    100.0 * best["merge_s"] / best["engine_s"], 1),
                "record_sets": len(rsets),
                "qbp": total_qbp,
            })
        assert outputs["dp8"] == outputs["single"], "dp8 diverged"
        assert outputs["dp4xtp2"] == outputs["single"], "dp4xtp2 diverged"
        for r in rows:
            print(json.dumps(r), flush=True)
        print("outputs byte-identical across configs: OK", flush=True)


if __name__ == "__main__":
    main()
