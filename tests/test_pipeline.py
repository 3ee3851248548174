"""Pipeline workflow tests: refpack layout, MAF conversion, summaries, and
the full ALIGN(file) => PREDICT => BIN => SUMMARIZE chain."""

import gzip
import io
import os
import random

import numpy as np
import pytest

from fixture_tax import write_dump
from taxtk.ops import oracle
from taxtk.pipeline.maf import convert_maf, iter_maf_blocks
from taxtk.pipeline.workflows import run_binning_workflow
from taxtk.pipeline.summaries import (
    binning_to_taxpath,
    taxpath_to_taxsummary,
    taxonomy_version_hash,
)


@pytest.fixture
def refpack_dir(tmp_path):
    rng = random.Random(11)
    root = tmp_path / "refpack"
    (root / "ncbi-taxonomy").mkdir(parents=True)
    write_dump(str(root / "ncbi-taxonomy"))

    species = {
        "ref1": "2111111",
        "ref2": "2111112",
        "ref3": "2111121",
        "ref4": "2211111",
    }
    base = "".join(rng.choice("ACGT") for _ in range(700))

    def mutate(s, rate):
        return "".join(c if rng.random() > rate else rng.choice("ACGT") for c in s)

    genomes = {
        "ref1": base,
        "ref2": mutate(base, 0.06),
        "ref3": mutate(base, 0.18),
        "ref4": mutate(base, 0.40),
    }
    with open(root / "refdata.fna", "w") as fh:
        for rid, seq in genomes.items():
            fh.write(f">{rid}\n{seq}\n")
    with open(root / "mapping.tax", "w") as fh:
        for rid, taxid in species.items():
            fh.write(f"{rid}\t{taxid}\n")

    queries = {}
    for q in range(2):
        start = rng.randrange(0, 300)
        queries[f"contig{q}"] = mutate(base[start : start + 250], 0.02)
    qfile = tmp_path / "input.fna"
    with open(qfile, "w") as fh:
        for qid, seq in queries.items():
            fh.write(f">{qid}\n{seq}\n")

    rows = []
    for qid, qseq in queries.items():
        qlen = len(qseq)
        for rid, g in genomes.items():
            best = None
            for off in range(0, len(g) - qlen, 50):
                d = oracle.edit_distance(
                    np.frombuffer(qseq.encode(), np.uint8),
                    np.frombuffer(g[off : off + qlen].encode(), np.uint8),
                )
                if best is None or d < best[0]:
                    best = (d, off)
            d, off = best
            ident = qlen - d
            if ident < qlen * 0.55:
                continue
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{off+1}\t{off+qlen}\t"
                f"{2.0*ident-qlen:.1f}\t1e-9\t{ident}\t{qlen}"
            )
    aln = tmp_path / "aln.tsv.gz"
    with gzip.open(aln, "wt") as fh:
        fh.write("\n".join(rows) + "\n")
    return dict(root=str(root), qfile=str(qfile), aln=str(aln), queries=queries)


class TestWorkflow:
    def test_full_chain_from_alignments(self, refpack_dir, tmp_path, capsys):
        outdir = str(tmp_path / "out")
        paths = run_binning_workflow(
            refpack_dir["root"],
            refpack_dir["qfile"],
            outdir,
            alignments_file=refpack_dir["aln"],
        )
        for key in ("alignments", "gff3", "binning", "taxpath", "taxsummary", "vprofile", "html"):
            assert os.path.exists(paths[key]), key
        # the streamed external sort keeps the header first (reference
        # pipes `##gff-version 3` through sort -k1,1) and emits the body
        # sorted by column 1
        gff3_lines = open(paths["gff3"]).read().splitlines()
        assert gff3_lines[0] == "##gff-version 3"
        keys = [l.split("\t", 1)[0] for l in gff3_lines[1:]]
        assert keys == sorted(keys)
        binning = open(paths["binning"]).read()
        rows = [
            l for l in binning.splitlines() if l and not l.startswith(("#", "@"))
        ]
        assert len(rows) == len(refpack_dir["queries"])
        # taxonomy hash present in the bioboxes header
        assert any(l.startswith("@TaxonomyID:") for l in binning.splitlines())
        # summaries consistent: taxsummary lengths sum to contig lengths
        total_len = sum(int(r.split("\t")[3]) for r in rows)
        summary = open(paths["taxsummary"]).read().splitlines()
        assert sum(int(l.split("\t")[2]) for l in summary) == total_len
        html = open(paths["html"]).read()
        assert "<html" in html and "details" in html
        # Krona-consumable text datasets (reference: taxsummary2krona):
        # magnitude<TAB>path-fields, sorted desc by magnitude
        for key, col in (("krona_support", 1), ("krona_data", 2)):
            rows = open(paths[key]).read().splitlines()
            mags = [int(r.split("\t")[0]) for r in rows]
            assert mags == sorted(mags, reverse=True) and mags
            assert sum(mags) == sum(int(l.split("\t")[col]) for l in summary)
        # built-in zoomable sunburst (Krona-style chart, no deps): valid
        # self-contained HTML whose embedded tree totals match taxsummary
        import json as _json
        import re as _re

        sb = open(paths["krona_sunburst"]).read()
        assert "<svg" in sb or "createElementNS" in sb
        m = _re.search(r"const DATA=(\{.*?\});\n", sb, _re.S)
        assert m, "sunburst data blob missing"
        tree = _json.loads(m.group(1))
        assert tree["l"] == total_len  # root length == total contig bp
        names = set()

        def _walk(n):
            names.add(n["n"])
            for c in n["c"]:
                _walk(c)

        _walk(tree)
        # every taxsummary path component appears in the tree
        for line in summary:
            for part in line.split("\t")[0].split(";"):
                if part:
                    assert part in names, part


class TestMergeSortFallback:
    def test_matches_coreutils_sort_semantics(self, tmp_path):
        """_MergeSortWriter == `LC_ALL=C sort -k1,1` on multi-run input
        (chunk size forced tiny so several tempfile runs merge)."""
        import random as _random

        from taxtk.pipeline.workflows import _MergeSortWriter

        rng = _random.Random(5)
        lines = ["##gff-version 3"]
        for k in range(500):
            qid = f"c{rng.randrange(60)}"
            lines.append(f"{qid}\ttaxator-tk\tsequence_feature\t{k}")
        out = io.StringIO()
        w = _MergeSortWriter(out, str(tmp_path), chunk_lines=64)
        # write in ragged pieces to exercise the partial-line buffer
        text = "".join(l + "\n" for l in lines)
        pos = 0
        while pos < len(text):
            step = rng.randrange(1, 200)
            w.write(text[pos : pos + step])
            pos += step
        w.finish()
        assert len(w.runs) == 0  # all runs merged and closed
        expected = sorted(lines, key=lambda l: (l.split("\t", 1)[0], l))
        assert out.getvalue() == "".join(l + "\n" for l in expected)
        assert out.getvalue().splitlines()[0] == "##gff-version 3"

    def test_fallback_gff3_identical_to_sort_path(self, refpack_dir, tmp_path,
                                                  monkeypatch):
        """Workflow with coreutils sort vs the tempfile merge fallback:
        byte-identical sample.gff3."""
        import taxtk.pipeline.workflows as wf

        out_sort = str(tmp_path / "out_sort")
        paths_sort = run_binning_workflow(
            refpack_dir["root"], refpack_dir["qfile"], out_sort,
            alignments_file=refpack_dir["aln"],
        )
        real_which = wf._which
        monkeypatch.setattr(
            wf, "_which", lambda p: None if p == "sort" else real_which(p)
        )
        out_fb = str(tmp_path / "out_fb")
        paths_fb = run_binning_workflow(
            refpack_dir["root"], refpack_dir["qfile"], out_fb,
            alignments_file=refpack_dir["aln"],
        )
        assert open(paths_fb["gff3"]).read() == open(paths_sort["gff3"]).read()
        assert (
            open(paths_fb["binning"]).read() == open(paths_sort["binning"]).read()
        )


MAF_TEXT = """# LAST version 1170
#
# a=7 b=1 A=7 B=1 e=40
# F=-1 s=2
a score=120 expect=1e-30
s refA 10 40 + 500 ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT
s q1 5 40 + 100 ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT

a score=80 expect=1e-10
s refB 100 30 + 900 ACGTACGTACGTACGTACGTACGTACGTAC
s q2 0 30 - 60 ACGTACGTACGTACGTACGTACGTACGTAC
"""


class TestMafConversion:
    def test_blocks(self):
        blocks = list(iter_maf_blocks(io.StringIO(MAF_TEXT)))
        assert len(blocks) == 2
        assert blocks[0].score == 120.0
        assert blocks[0].names == ["refA", "q1"]

    def test_forward_strand(self):
        out = io.StringIO()
        convert_maf(io.StringIO(MAF_TEXT), out)
        lines = out.getvalue().splitlines()
        f = lines[0].split("\t")
        # query q1: start 5 size 40 -> 6..45; ref 10..(10+40)=11..50
        assert f[0] == "q1" and f[1] == "6" and f[2] == "45" and f[3] == "100"
        assert f[4] == "refA" and f[5] == "11" and f[6] == "50"
        assert f[9] == "40" and f[10] == "40"  # identities, aln len

    def test_reverse_strand_swaps_reference(self):
        out = io.StringIO()
        convert_maf(io.StringIO(MAF_TEXT), out)
        f = out.getvalue().splitlines()[1].split("\t")
        # q2 '-' strand: forward coords 60-0-30+1=31 .. 60-0=60
        assert f[0] == "q2" and f[1] == "31" and f[2] == "60"
        # reference coords swapped: 100+30=130 .. 101
        assert f[5] == "130" and f[6] == "101"


class TestSummaries:
    def test_taxonomy_hash_deterministic(self, refpack_dir):
        nodes = os.path.join(refpack_dir["root"], "ncbi-taxonomy", "nodes.dmp")
        h1 = taxonomy_version_hash(nodes)
        h2 = taxonomy_version_hash(nodes)
        assert h1 == h2 and len(h1) == 32
