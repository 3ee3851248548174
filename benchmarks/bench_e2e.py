#!/usr/bin/env python
"""End-to-end engine throughput benchmark with stage breakdown.

Synthesizes a config-4-style workload (long contigs, segment splits,
revcomp hits, skewed candidate counts), writes a real refpack on disk
(FASTA + .fai + mapping + NCBI-dump taxonomy), runs the FULL taxator path
(TSV parse -> record-set grouping -> RPA engine -> GFF3) in-process, and
prints per-stage wall times: parse, fetch, replay, align{stage_batch,
device,collect}.

Usage: python benchmarks/bench_e2e.py [--contigs N] [--warm] [--cpu]
  --warm runs the engine twice and reports the second (compile-amortized).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

BASES = np.frombuffer(b"ACGT", np.uint8)
COMP = {65: 84, 84: 65, 67: 71, 71: 67}


def _revcomp(s: bytes) -> bytes:
    return bytes(COMP[c] for c in reversed(s))


def make_workload(outdir: str, n_contigs: int, seed: int = 7,
                  min_len: int = 1000, max_len: int = 20000):
    """Returns (alignments_path, query_fa, ref_fa, mapping, tax_dir, total_qbp)."""
    from fixture_tax import write_dump

    rng = np.random.RandomState(seed)
    tax_dir = os.path.join(outdir, "tax")
    os.makedirs(tax_dir, exist_ok=True)
    write_dump(tax_dir)

    # genome set: 3 clades xs several genomes, single 120kb backbone each
    species = ["2111111", "2111112", "2111121", "2211111", "21121", "31"]
    G = 120_000
    backbone = BASES[rng.randint(0, 4, G)]
    genomes = {}
    mapping = {}
    for gi, sp in enumerate(species):
        mut = rng.rand(G) < (0.02 + 0.05 * (gi % 3))
        g = backbone.copy()
        g[mut] = BASES[rng.randint(0, 4, mut.sum())]
        gid = f"genome{gi}"
        genomes[gid] = g
        mapping[gid] = sp

    ref_fa = os.path.join(outdir, "refdata.fna")
    with open(ref_fa, "w") as f:
        for gid, g in genomes.items():
            f.write(f">{gid}\n{g.tobytes().decode()}\n")
    map_path = os.path.join(outdir, "mapping.tax")
    with open(map_path, "w") as f:
        for gid, sp in mapping.items():
            f.write(f"{gid}\t{sp}\n")

    # queries: contigs 1-20kbp sampled from genome 0 w/ 1% divergence;
    # each contig gets hits from every genome over 1-3 disjoint segments,
    # ~35% of hits on the reverse strand (swapped ref coords)
    lines = []
    qfa = io.StringIO()
    total_qbp = 0
    gids = list(genomes)
    for q in range(n_contigs):
        L = int(rng.randint(min_len, max_len + 1))
        st = int(rng.randint(0, G - L))
        frag = genomes[gids[0]][st : st + L].copy()
        mut = rng.rand(L) < 0.01
        frag[mut] = BASES[rng.randint(0, 4, mut.sum())]
        qid = f"contig{q}"
        qfa.write(f">{qid}\n{frag.tobytes().decode()}\n")
        total_qbp += L
        nseg = int(rng.randint(1, 4))
        bounds = np.sort(rng.choice(np.arange(1, L - 100), nseg - 1, replace=False)) if nseg > 1 else np.array([], int)
        segs = np.split(np.arange(L), bounds)
        for seg in segs:
            qs, qe = int(seg[0]) + 1, int(seg[-1]) + 1
            if qe - qs < 150:
                continue
            for gid in gids:
                g = genomes[gid]
                w = g[st + qs - 1 : st + qe]
                fw = frag[qs - 1 : qe]
                ident = int((w == fw).sum())
                if ident < 0.6 * len(fw):
                    continue
                score = max(5.0, 2.0 * ident - len(fw))
                rs, re = st + qs, st + qe
                if rng.rand() < 0.35:
                    rs, re = re, rs  # reverse-strand convention
                lines.append(
                    f"{qid}\t{qs}\t{qe}\t{L}\t{gid}\t{rs}\t{re}\t"
                    f"{score:.1f}\t1e-30\t{ident}\t{len(fw)}"
                )
    aln_path = os.path.join(outdir, "sample.alignments")
    with open(aln_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    query_fa = os.path.join(outdir, "query.fna")
    with open(query_fa, "w") as f:
        f.write(qfa.getvalue())
    return aln_path, query_fa, ref_fa, map_path, tax_dir, total_qbp


AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)


def make_workload_protein(outdir: str, n_orfs: int, seed: int = 7,
                          min_len: int = 60, max_len: int = 400):
    """blastp-style protein workload: ORF queries vs homolog proteins
    across 6 reference proteomes (same taxonomy fixture as DNA)."""
    from fixture_tax import write_dump

    rng = np.random.RandomState(seed)
    tax_dir = os.path.join(outdir, "tax")
    os.makedirs(tax_dir, exist_ok=True)
    write_dump(tax_dir)

    species = ["2111111", "2111112", "2111121", "2211111", "21121", "31"]
    n_fams = max(8, n_orfs // 8)
    fam_len = rng.randint(min_len, max_len + 1, n_fams)
    families = [AA[rng.randint(0, 20, L)] for L in fam_len]
    mapping, refs = {}, {}
    for gi, sp in enumerate(species):
        for fi, fam in enumerate(families):
            p = fam.copy()
            mut = rng.rand(len(p)) < (0.05 + 0.06 * (gi % 3))
            p[mut] = AA[rng.randint(0, 20, mut.sum())]
            rid = f"prot{gi}_{fi}"
            refs[rid] = p
            mapping[rid] = sp
    ref_fa = os.path.join(outdir, "refdata.faa")
    with open(ref_fa, "w") as f:
        for rid, p in refs.items():
            f.write(f">{rid}\n{p.tobytes().decode()}\n")
    map_path = os.path.join(outdir, "mapping.tax")
    with open(map_path, "w") as f:
        for rid, sp in mapping.items():
            f.write(f"{rid}\t{sp}\n")

    lines = []
    qfa = io.StringIO()
    total_qaa = 0
    for q in range(n_orfs):
        fi = int(rng.randint(0, n_fams))
        fam = families[fi]
        L = int(rng.randint(min(50, len(fam)), len(fam) + 1))
        st = int(rng.randint(0, len(fam) - L + 1))
        orf = fam[st : st + L].copy()
        mut = rng.rand(L) < 0.03
        orf[mut] = AA[rng.randint(0, 20, mut.sum())]
        qid = f"contig{q}_1"  # ORF id globbing convention
        qfa.write(f">{qid}\n{orf.tobytes().decode()}\n")
        total_qaa += L
        for gi in range(len(species)):
            rid = f"prot{gi}_{fi}"
            w = refs[rid][st : st + L]
            ident = int((w == orf).sum())
            if ident < 0.5 * L:
                continue
            score = max(5.0, 2.0 * ident - L)
            lines.append(
                f"{qid}\t1\t{L}\t{L}\t{rid}\t{st+1}\t{st+L}\t"
                f"{score:.1f}\t1e-20\t{ident}\t{L}"
            )
    aln_path = os.path.join(outdir, "sample.alignments")
    with open(aln_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    query_fa = os.path.join(outdir, "query.faa")
    with open(query_fa, "w") as f:
        f.write(qfa.getvalue())
    return aln_path, query_fa, ref_fa, map_path, tax_dir, total_qaa


def run_once(paths, ranks, dna_backend=None, stats=True, protein=False,
             protein_backend=None, keep_gff=False):
    from taxtk.engine.aligner import BatchAligner
    from taxtk.engine.executor import RpaEngine
    from taxtk.engine.recordsets import iter_record_sets
    from taxtk.formats.alignments import iter_alignment_records
    from taxtk.formats.mapping import load_seqid_taxid_mapping
    from taxtk.refpack.store import IndexedFastaStore, InMemoryFastaStore
    from taxtk.taxonomy.flat import load_taxonomy_from_environment

    aln_path, query_fa, ref_fa, map_path, tax_dir, total_qbp = paths
    os.environ["TAXATORTK_TAXONOMY_NCBI"] = tax_dir
    tax = load_taxonomy_from_environment(ranks)
    tax = tax.prune_to_marked_ranks(ranks)
    seqid2taxid = load_seqid_taxid_mapping(map_path)

    t_parse = time.time()
    recs = []
    with open(aln_path) as f:
        for _, rec in iter_alignment_records(f):
            rec.reference_node = tax.node(seqid2taxid[rec.reference_identifier])
            recs.append(rec)
    t_parse = time.time() - t_parse

    query_store = IndexedFastaStore(query_fa)
    db_store = IndexedFastaStore(ref_fa)
    if protein:
        aligner = BatchAligner("protein", protein_backend=protein_backend)
        engine = RpaEngine(
            tax, query_store, db_store, aligner=aligner, protein=True
        )
    else:
        aligner = BatchAligner("dna", dna_backend=dna_backend)
        engine = RpaEngine(tax, query_store, db_store, aligner=aligner)
    sink = io.StringIO()
    t0 = time.time()
    engine.run(iter_record_sets(iter(recs), True, False), sink)
    t_engine = time.time() - t0
    return {
        "parse_s": t_parse,
        "engine_s": t_engine,
        "n_alignments": len(recs),
        "gff_lines": sink.getvalue().count("\n") - 1,
        # full text only on request: timed bench reps would otherwise
        # keep every run's GFF3 alive for the whole benchmark
        "gff3": sink.getvalue() if keep_gff else None,
        "metrics": dict(engine.metrics.stage_seconds),
        "aligner": dict(aligner.stage_seconds),
        "pairs": aligner.pairs_aligned,
        "cells": aligner.cells_computed,
        "total_qbp": total_qbp,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contigs", type=int, default=600)
    ap.add_argument("--min-len", type=int, default=1000)
    ap.add_argument("--max-len", type=int, default=20000)
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--protein", action="store_true",
                    help="blastp-style ORF workload through the protein "
                    "engine (reports Maa/hour)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tempfile

    from taxtk.constants import DEFAULT_RANKS

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        if args.protein:
            paths = make_workload_protein(d, args.contigs)
        else:
            paths = make_workload(d, args.contigs, min_len=args.min_len,
                                  max_len=args.max_len)
        print(f"workload gen: {time.time()-t0:.1f}s", file=sys.stderr)
        r = run_once(paths, list(DEFAULT_RANKS), args.backend,
                     protein=args.protein, protein_backend=args.backend
                     if args.protein else None)
        if args.warm:
            r = run_once(paths, list(DEFAULT_RANKS), args.backend,
                         protein=args.protein, protein_backend=args.backend
                         if args.protein else None)
        mbp = r["total_qbp"] / 1e6
        hours = r["engine_s"] / 3600
        unit = "maa_per_hour" if args.protein else "mbp_per_hour"
        r[unit] = mbp / hours
        r["parse_lines_per_s"] = r["n_alignments"] / r["parse_s"]
        import json

        print(json.dumps(r, indent=2, default=float))


if __name__ == "__main__":
    main()
