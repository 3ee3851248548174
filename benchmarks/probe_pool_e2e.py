#!/usr/bin/env python
"""A/B the device-resident sequence pool on the DNA e2e workload.

The pool cache (ops/seqpool.py) keeps deduped packed segment columns in
HBM across align rounds, shipping only rows not yet resident — it targets
the engine's dominant cost through the tunnel link, H2D bytes (~48% of
pool bytes are re-ships without it, probe_pool_reuse.py).  This probe
measures the actual end-to-end delta: the bench_e2e config-4-style
workload run warm N times with the pool cache active vs disabled, plus
the pool's own hit/miss/shipped-bytes counters.

Usage: python benchmarks/probe_pool_e2e.py [--contigs 300] [--reps 3]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run(paths, ranks, pool: bool):
    from taxtk.engine.aligner import BatchAligner
    from taxtk.engine.executor import RpaEngine
    from taxtk.engine.recordsets import iter_record_sets
    from taxtk.formats.alignments import iter_alignment_records
    from taxtk.formats.mapping import load_seqid_taxid_mapping
    from taxtk.refpack.store import IndexedFastaStore
    from taxtk.taxonomy.flat import load_taxonomy_from_environment

    aln_path, query_fa, ref_fa, map_path, tax_dir, total_qbp = paths
    os.environ["TAXATORTK_TAXONOMY_NCBI"] = tax_dir
    tax = load_taxonomy_from_environment(ranks).prune_to_marked_ranks(ranks)
    seqid2taxid = load_seqid_taxid_mapping(map_path)
    recs = []
    with open(aln_path) as f:
        for _, rec in iter_alignment_records(f):
            rec.reference_node = tax.node(seqid2taxid[rec.reference_identifier])
            recs.append(rec)

    aligner = BatchAligner("dna", dna_backend="myers-pallas")
    if not pool:
        aligner.pool_cache = None
    engine = RpaEngine(
        tax, IndexedFastaStore(query_fa), IndexedFastaStore(ref_fa),
        aligner=aligner,
    )
    sink = io.StringIO()
    t0 = time.time()
    engine.run(iter_record_sets(iter(recs), True, False), sink)
    dt = time.time() - t0
    stats = {}
    if aligner.pool_cache is not None:
        p = aligner.pool_cache
        stats = dict(hits=p.hits, misses=p.misses, resets=p.resets,
                     shipped_mb=round(p.bytes_shipped / 1e6, 1))
    return dict(
        seconds=round(dt, 2),
        mbp_per_hour=round(total_qbp / 1e6 / (dt / 3600.0), 1),
        gff=sink.getvalue(),
        aligner_stages={k: round(v, 2) for k, v in aligner.stage_seconds.items()},
        pool=stats,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--min-len", type=int, default=1000)
    ap.add_argument("--max-len", type=int, default=20000)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (pallas interpret mode)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from taxtk.engine import aligner as _al

        _orig = _al.BatchAligner.__init__

        def _patched(self, *a, **kw):
            kw.setdefault("pallas_interpret", True)
            _orig(self, *a, **kw)
            if self.mode == "dna" and self.dna_backend == "myers-pallas":
                if self.pool_cache is None:
                    from taxtk.ops.seqpool import DevicePoolCache

                    self.pool_cache = DevicePoolCache()

        _al.BatchAligner.__init__ = _patched

    import tempfile

    import bench_e2e

    from taxtk.constants import DEFAULT_RANKS

    ranks = list(DEFAULT_RANKS)
    with tempfile.TemporaryDirectory() as d:
        paths = bench_e2e.make_workload(
            d, args.contigs, min_len=args.min_len, max_len=args.max_len
        )
        # warm-up/compile (pool on so both pool shapes compile)
        warm = run(paths, ranks, pool=True)
        print(f"warm-up: {warm['seconds']}s", file=sys.stderr, flush=True)
        golden = warm["gff"]
        out = {"on": [], "off": []}
        stages = {}
        for rep in range(args.reps):
            for mode in ("off", "on"):
                r = run(paths, ranks, pool=(mode == "on"))
                assert r["gff"] == golden, f"pool={mode} output diverged"
                out[mode].append(r["mbp_per_hour"])
                stages[mode] = r["aligner_stages"]
                if mode == "on":
                    pool_stats = r["pool"]
                print(f"rep {rep} pool={mode}: {r['seconds']}s "
                      f"{r['mbp_per_hour']} Mbp/h {r['aligner_stages']}",
                      file=sys.stderr, flush=True)
    med = lambda v: sorted(v)[len(v) // 2]
    print(json.dumps({
        "metric": "pool_cache_e2e_delta",
        "mbp_per_hour_pool_on": med(out["on"]),
        "mbp_per_hour_pool_off": med(out["off"]),
        "speedup": round(med(out["on"]) / med(out["off"]), 3),
        "all_on": out["on"], "all_off": out["off"],
        "stages_on": stages.get("on"), "stages_off": stages.get("off"),
        "pool": pool_stats,
        "outputs_identical": True,
    }))


if __name__ == "__main__":
    main()
