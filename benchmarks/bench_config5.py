#!/usr/bin/env python
"""Config-5 scale benchmark: 1M contigs through the full workflow with
bounded RSS.

BASELINE.json config 5 is "multi-host pod slice, 1M contigs, sharded
refpack"; the single-host part this script pins down is the STREAMING
contract — the ALIGN(file) => PREDICT => SORT => BIN => SUMMARIZE chain
must hold peak RSS bounded (queries served from the indexed on-disk
store, engine macro-batched, GFF3 streamed through external sort) while
processing a million-contig sample.  The reference achieves this with
on-disk .fai query access (reference: core/src/sequencestorage.hh:319-406)
and stage-to-stage pipes.

Workload shape: short contigs (150-400 bp) against a 6-genome refpack;
a configurable fraction gets multiple candidate alignments (full RPA
passes + device rounds), the rest one candidate each (the n==1
pass-through, no alignment — reference taxonpredictionmodelsequence.hh:371),
so the run exercises parse/group/stream/bin at full scale without turning
into a kernel benchmark.

Usage: python benchmarks/bench_config5.py [--contigs 1000000]
       [--multi-frac 0.03] [--keep DIR]

Prints one JSON line with stage wall times, peak RSS, and throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

BASES = np.frombuffer(b"ACGT", np.uint8)


def make_workload(outdir: str, n_contigs: int, multi_frac: float,
                  seed: int = 7):
    """Streaming generator: writes refpack + query FASTA + alignments TSV
    without holding the sample in memory.  Returns (refpack_dir, query_fa,
    aln_path, total_qbp)."""
    from fixture_tax import write_dump

    rng = np.random.RandomState(seed)
    refroot = os.path.join(outdir, "refpack")
    tax_dir = os.path.join(refroot, "ncbi-taxonomy")
    os.makedirs(tax_dir, exist_ok=True)
    write_dump(tax_dir)

    species = ["2111111", "2111112", "2111121", "2211111", "21121", "31"]
    G = 100_000
    backbone = BASES[rng.randint(0, 4, G)]
    genomes = {}
    with open(os.path.join(refroot, "refdata.fna"), "w") as f, open(
        os.path.join(refroot, "mapping.tax"), "w"
    ) as m:
        for gi, sp in enumerate(species):
            mut = rng.rand(G) < (0.02 + 0.05 * (gi % 3))
            g = backbone.copy()
            g[mut] = BASES[rng.randint(0, 4, mut.sum())]
            gid = f"genome{gi}"
            genomes[gid] = g
            f.write(f">{gid}\n{g.tobytes().decode()}\n")
            m.write(f"{gid}\t{sp}\n")

    gids = list(genomes)
    query_fa = os.path.join(outdir, "query.fna")
    aln_path = os.path.join(outdir, "sample.alignments")
    total_qbp = 0
    t0 = time.time()
    with open(query_fa, "w") as qf, open(aln_path, "w") as af:
        for q in range(n_contigs):
            L = int(rng.randint(150, 401))
            st = int(rng.randint(0, G - L))
            src = gids[int(rng.randint(0, len(gids)))]
            frag = genomes[src][st : st + L].copy()
            mut = rng.rand(L) < 0.01
            frag[mut] = BASES[rng.randint(0, 4, mut.sum())]
            qid = f"contig{q}"
            qf.write(f">{qid}\n{frag.tobytes().decode()}\n")
            total_qbp += L
            multi = rng.rand() < multi_frac
            hit_gids = gids if multi else [src]
            for gid in hit_gids:
                w = genomes[gid][st : st + L]
                ident = int((w == frag).sum())
                if ident < 0.6 * L:
                    continue
                score = max(5.0, 2.0 * ident - L)
                rs, re = st + 1, st + L
                if multi and rng.rand() < 0.3:
                    rs, re = re, rs  # reverse-strand convention
                af.write(
                    f"{qid}\t1\t{L}\t{L}\t{gid}\t{rs}\t{re}\t"
                    f"{score:.1f}\t1e-30\t{ident}\t{L}\n"
                )
    gen_s = time.time() - t0
    return refroot, query_fa, aln_path, total_qbp, gen_s


def peak_rss_mb() -> float:
    # linux ru_maxrss is KiB
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=1_000_000)
    ap.add_argument("--multi-frac", type=float, default=0.03)
    ap.add_argument("--keep", default=None, help="working dir (kept)")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--dna-backend", default="native",
                    help="aligner backend (native = C++ host batch, the "
                         "right choice for a CPU-only scale run)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    workdir = args.keep or tempfile.mkdtemp(prefix="taxtk_c5_")
    os.makedirs(workdir, exist_ok=True)

    rss0 = peak_rss_mb()
    refroot, query_fa, aln_path, total_qbp, gen_s = make_workload(
        workdir, args.contigs, args.multi_frac
    )
    print(f"workload: {args.contigs} contigs, {total_qbp/1e6:.1f} Mbp, "
          f"generated in {gen_s:.0f}s (rss after gen {peak_rss_mb():.0f} MB)",
          file=sys.stderr)

    from taxtk.engine.aligner import BatchAligner
    from taxtk.pipeline.workflows import run_binning_workflow

    outdir = os.path.join(workdir, "out")
    aligner = BatchAligner("dna", dna_backend=args.dna_backend)
    t0 = time.time()
    paths = run_binning_workflow(
        refroot, query_fa, outdir, alignments_file=aln_path, aligner=aligner
    )
    wall = time.time() - t0

    n_binned = sum(
        1 for l in open(paths["binning"])
        if l.strip() and not l.startswith(("#", "@"))
    )
    result = {
        "metric": "config5_wall_seconds",
        "value": round(wall, 1),
        "unit": "s",
        "contigs": args.contigs,
        "total_mbp": round(total_qbp / 1e6, 1),
        "mbp_per_hour": round(total_qbp / 1e6 / (wall / 3600.0), 1),
        "binned_sequences": n_binned,
        "peak_rss_mb": round(peak_rss_mb(), 1),
        "baseline_rss_mb": round(rss0, 1),
    }
    print(json.dumps(result))
    if not args.keep:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
