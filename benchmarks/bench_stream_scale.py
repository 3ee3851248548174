#!/usr/bin/env python
"""Config-4-scale streaming check (VERDICT round-1 weak #4): run the full
binning workflow on a synthetic 10k-contig metagenome (1-100kbp) from a
pre-made alignments file and report wall time + peak RSS.  The pipeline
must stream: engine -> external sort -> binner without buffering the GFF3
in memory.

The alignment lists are synthesized to exercise the pipeline layers (record
grouping, GFF3 emission, sort, binning) with a REALISTIC RECORD VOLUME;
most record sets take the cheap n==1/exact paths so the run measures the
pipeline plumbing, not kernel throughput (bench.py measures that).

Usage: python benchmarks/bench_stream_scale.py [n_contigs]
"""

import gzip
import os
import random
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthesize(root, n_contigs):
    """Refpack + queries + alignments; returns (refpack_dir, qfile, alnfile)."""
    os.makedirs(f"{root}/refpack/ncbi-taxonomy", exist_ok=True)
    rng = random.Random(42)
    bases = "ACGT"

    # taxonomy: 2 superkingdoms x 4 phyla x 8 species = 64 leaves
    nodes = [("1", "1", "no rank")]
    leaves = []
    for a in range(2):
        sk = f"{a + 2}"
        nodes.append((sk, "1", "superkingdom"))
        for b in range(4):
            ph = f"{sk}{b + 1}"
            nodes.append((ph, sk, "phylum"))
            for c in range(8):
                sp = f"{ph}{c + 1}"
                nodes.append((sp, ph, "species"))
                leaves.append(sp)
    with open(f"{root}/refpack/ncbi-taxonomy/nodes.dmp", "w") as fh:
        for t, p, r in nodes:
            fh.write(f"{t}\t|\t{p}\t|\t{r}\t|\tx\t|\n")
    with open(f"{root}/refpack/ncbi-taxonomy/names.dmp", "w") as fh:
        for t, _, _ in nodes:
            fh.write(f"{t}\t|\tnode {t}\t|\t\t|\tscientific name\t|\n")

    refs = {}
    with open(f"{root}/refpack/refdata.fna", "w") as fh, open(
        f"{root}/refpack/mapping.tax", "w"
    ) as mp:
        for k, sp in enumerate(leaves):
            seq = "".join(rng.choice(bases) for _ in range(2000))
            refs[f"r{k}"] = seq
            fh.write(f">r{k}\n{seq}\n")
            mp.write(f"r{k}\t{sp}\n")
    from taxtk.refpack.store import FaiIndex

    FaiIndex.build(f"{root}/refpack/refdata.fna").save(
        f"{root}/refpack/refdata.fna.fai"
    )

    qfile = f"{root}/queries.fna"
    alnfile = f"{root}/aln.tsv.gz"
    total_bp = 0
    with open(qfile, "w") as qf, gzip.open(alnfile, "wt") as af:
        for q in range(n_contigs):
            # log-uniform contig length 1-100 kbp
            L = int(1000 * (100 ** rng.random()))
            total_bp += L
            src = f"r{rng.randrange(len(leaves))}"
            # contig = tiled copies of a reference window with mutations
            win = refs[src] * (L // 2000 + 1)
            contig = "".join(
                c if rng.random() > 0.02 else rng.choice(bases)
                for c in win[:L]
            )
            qid = f"contig{q:06d}"
            qf.write(f">{qid}\n{contig}\n")
            # alignment records: mostly one candidate (n==1 fast path),
            # ~10% with a handful of candidates (full RPA)
            span = min(L, 1500)
            ncand = 1 if rng.random() < 0.9 else rng.randrange(2, 6)
            for j in range(ncand):
                rid = src if j == 0 else f"r{rng.randrange(len(leaves))}"
                ident = span - rng.randrange(0, span // 10)
                af.write(
                    f"{qid}\t1\t{span}\t{L}\t{rid}\t1\t{span}\t"
                    f"{2.0 * ident - span:.1f}\t1e-9\t{ident}\t{span}\n"
                )
    return f"{root}/refpack", qfile, alnfile, total_bp


def main():
    n_contigs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        print(f"synthesizing {n_contigs} contigs...", flush=True)
        refpack, qfile, alnfile, total_bp = synthesize(root, n_contigs)
        print(f"total {total_bp/1e6:.1f} Mbp", flush=True)

        from taxtk.pipeline.workflows import run_binning_workflow

        t0 = time.time()
        paths = run_binning_workflow(
            refpack, qfile, f"{root}/out", alignments_file=alnfile
        )
        dt = time.time() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        n_out = sum(
            1
            for l in open(paths["binning"])
            if l.strip() and not l.startswith(("#", "@"))
        )
        print(
            f"workflow: {dt:.1f}s, peak RSS {rss_mb:.0f} MB, "
            f"{n_out}/{n_contigs} contigs binned, "
            f"{total_bp / 1e6 / (dt / 3600):.0f} Mbp/h",
            flush=True,
        )


if __name__ == "__main__":
    main()
