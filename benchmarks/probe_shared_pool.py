#!/usr/bin/env python
"""Drive the process-shared DevicePoolCache at the engine surface.

Round-5 VERDICT item 2: each bench rep built a fresh BatchAligner, so the
config-4 surrogate re-shipped the entire pool (154.5 MB) every run.  With
the process-shared cache, run 2..N of the same workload must ship ~zero
pool bytes and produce byte-identical GFF3.

Runs the config-4-style workload (long contigs) N times in ONE process,
printing per-run engine_s / device_wait / h2d; asserts GFF3 equality.

Usage: python benchmarks/probe_shared_pool.py [--contigs 80] [--reps 3]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_e2e  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=80)
    ap.add_argument("--max-len", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )
    import bench as bench_mod

    from taxtk.constants import DEFAULT_RANKS
    from taxtk.ops import seqpool

    with tempfile.TemporaryDirectory() as d:
        paths = bench_e2e.make_workload(d, args.contigs, max_len=args.max_len)
        gffs = []
        with bench_mod._H2DMeter() as meter:
            for rep in range(args.reps):
                meter.take()
                r = bench_e2e.run_once(paths, list(DEFAULT_RANKS),
                                       keep_gff=True)
                b, s = meter.take()
                cache = seqpool.shared_pool_cache()
                al = r["aligner"]
                print(json.dumps({
                    "rep": rep,
                    "engine_s": round(r["engine_s"], 2),
                    "device_wait_s": round(al.get("device_wait", 0.0), 2),
                    "device_s": round(al.get("device", 0.0), 2),
                    "h2d_mb": round(b / 1e6, 1),
                    "h2d_s": round(s, 2),
                    "pool_hits": cache.hits,
                    "pool_misses": cache.misses,
                    "pool_resets": cache.resets,
                    "mbp_per_hour": round(
                        r["total_qbp"] / 1e6 / (r["engine_s"] / 3600.0), 1),
                }), flush=True)
                gffs.append(r["gff3"])
        assert all(g == gffs[0] for g in gffs[1:]), \
            "GFF3 diverged across shared-pool runs"
        print("GFF3 byte-identical across runs: OK", flush=True)


if __name__ == "__main__":
    main()
