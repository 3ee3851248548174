"""End-to-end CLI test: alignments TSV -> taxtk-taxator -> GFF3 ->
taxtk-binner -> bioboxes, on a synthetic mini refpack (the shape of
reference config 1: binning-blast.bash's ALIGN => PREDICT => BIN chain)."""

import io
import os
import random
import sys

import pytest

from fixture_tax import write_dump
from taxtk.cli import taxator as taxator_cli
from taxtk.cli import binner as binner_cli
from taxtk.cli import alignments_filter as filter_cli
from taxtk.cli import taxknife as taxknife_cli
from taxtk.ops import oracle
import numpy as np


@pytest.fixture
def refpack(tmp_path):
    """Mini refpack: genomes for 4 species + taxonomy dump + mapping."""
    rng = random.Random(7)
    write_dump(str(tmp_path))
    species = {
        "ref1": "2111111",
        "ref2": "2111112",
        "ref3": "2111121",
        "ref4": "2211111",
    }
    base = "".join(rng.choice("ACGT") for _ in range(800))

    def mutate(s, rate):
        return "".join(c if rng.random() > rate else rng.choice("ACGT") for c in s)

    genomes = {
        "ref1": base,
        "ref2": mutate(base, 0.05),
        "ref3": mutate(base, 0.15),
        "ref4": mutate(base, 0.40),
    }
    refdata = tmp_path / "refdata.fna"
    with open(refdata, "w") as fh:
        for rid, seq in genomes.items():
            fh.write(f">{rid}\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i : i + 60] + "\n")
    mapping = tmp_path / "mapping.tax"
    with open(mapping, "w") as fh:
        for rid, taxid in species.items():
            fh.write(f"{rid}\t{taxid}\n")

    # query contigs: fragments of ref1 with mild mutations
    queries = {}
    for q in range(3):
        start = rng.randrange(0, 400)
        length = rng.randrange(150, 350)
        queries[f"contig{q}"] = mutate(base[start : start + length], 0.02)
    qfile = tmp_path / "query.fna"
    with open(qfile, "w") as fh:
        for qid, seq in queries.items():
            fh.write(f">{qid}\n{seq}\n")

    # fabricate BLAST-like alignment rows (query vs each genome window)
    rows = []
    for qid, qseq in queries.items():
        qlen = len(qseq)
        for rid, g in genomes.items():
            # crude "hit": best window via edit distance at coarse offsets
            best = None
            for off in range(0, len(g) - qlen, 50):
                d = oracle.edit_distance(
                    np.frombuffer(qseq.encode(), np.uint8),
                    np.frombuffer(g[off : off + qlen].encode(), np.uint8),
                )
                if best is None or d < best[0]:
                    best = (d, off)
            d, off = best
            ident = max(0, qlen - d)
            if ident < qlen * 0.55:
                continue  # aligner would not report
            score = round(2.0 * ident - qlen, 1)
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{off+1}\t{off+qlen}\t"
                f"{score}\t1e-10\t{ident}\t{qlen}"
            )
    alignments = "\n".join(rows) + "\n"
    return dict(
        dir=tmp_path,
        refdata=str(refdata),
        mapping=str(mapping),
        qfile=str(qfile),
        alignments=alignments,
        queries=queries,
    )


def run_cli(main, argv, stdin_text, monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO(stdin_text))
    rc = main(argv)
    captured = capsys.readouterr()
    return rc, captured.out


class TestTaxatorBinnerChain:
    def test_full_chain(self, refpack, monkeypatch, capsys):
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(refpack["dir"]))
        rc, gff3 = run_cli(
            taxator_cli.main,
            [
                "-a", "rpa",
                "-g", refpack["mapping"],
                "-q", refpack["qfile"],
                "-f", refpack["refdata"],
                "-i", refpack["refdata"] + ".fai",
                "-x", "0.5",
                "-o", "0",
            ],
            refpack["alignments"],
            monkeypatch,
            capsys,
        )
        assert rc == 0
        lines = gff3.strip().splitlines()
        assert lines[0] == "##gff-version 3"
        assert len(lines) == 1 + len(refpack["queries"])
        for line in lines[1:]:
            cols = line.split("\t")
            assert cols[1] == "taxator-tk" and cols[2] == "sequence_feature"
            assert "tax=" in cols[8] and "rtax=" in cols[8]
        # contigs are fragments of ref1 (E. coli): expect non-root placement
        assert any("tax=1;" not in l for l in lines[1:])

        # sort -k1,1 like the pipeline, then bin
        body = sorted(lines[1:], key=lambda l: l.split("\t")[0])
        gff3_sorted = "\n".join(body) + "\n"
        rc, binning = run_cli(
            binner_cli.main,
            ["-n", "testsample", "-g", "(.+)", "-l", os.devnull],
            gff3_sorted,
            monkeypatch,
            capsys,
        )
        assert rc == 0
        blines = binning.splitlines()
        assert "@Version:0.9.1" in blines
        rows = [l for l in blines if l and not l.startswith(("#", "@"))]
        assert len(rows) == len(refpack["queries"])
        for row in rows:
            qid, taxid, support, length = row.split("\t")
            assert qid in refpack["queries"]
            assert int(support) > 0
            assert int(length) == len(refpack["queries"][qid])

    def test_lca_models(self, refpack, monkeypatch, capsys):
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(refpack["dir"]))
        for algo in ("simple-lca", "megan-lca", "n-best-lca", "dummy"):
            rc, gff3 = run_cli(
                taxator_cli.main,
                ["-a", algo, "-g", refpack["mapping"]],
                refpack["alignments"],
                monkeypatch,
                capsys,
            )
            assert rc == 0, algo
            lines = gff3.strip().splitlines()
            assert lines[0] == "##gff-version 3"
            assert len(lines) > 1


class TestAlignmentsFilterCli:
    def test_top_percent_and_mask(self, refpack, monkeypatch, capsys):
        rc, out = run_cli(
            filter_cli.main,
            ["-t", "0.1", "-z"],
            refpack["alignments"],
            monkeypatch,
            capsys,
        )
        assert rc == 0
        out_lines = out.strip().splitlines()
        in_lines = refpack["alignments"].strip().splitlines()
        assert len(out_lines) == len(in_lines)  # masked kept with -z
        assert any(l.startswith("*") for l in out_lines) or all(
            not l.startswith("*") for l in out_lines
        )
        # without -z, masked rows are dropped
        rc, out2 = run_cli(
            filter_cli.main, ["-t", "0.1"], refpack["alignments"], monkeypatch, capsys
        )
        assert len(out2.strip().splitlines()) <= len(out_lines)


class TestTaxknifeCli:
    def test_annotate_name(self, refpack, monkeypatch, capsys):
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(refpack["dir"]))
        rc, out = run_cli(
            taxknife_cli.main,
            ["--mode", "annotate", "-s", "name"],
            "2111111\n21111\n",
            monkeypatch,
            capsys,
        )
        assert rc == 0
        assert out == "Escherichia coli\t\nEnterobacteriaceae\t\n"

    def test_traverse_to_genus(self, refpack, monkeypatch, capsys):
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(refpack["dir"]))
        rc, out = run_cli(
            taxknife_cli.main,
            ["--mode", "traverse", "-r", "genus"],
            "2111111\n",
            monkeypatch,
            capsys,
        )
        assert rc == 0
        assert out == "211111\t\n"

    def test_annotate_path(self, refpack, monkeypatch, capsys):
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(refpack["dir"]))
        rc, out = run_cli(
            taxknife_cli.main,
            ["--mode", "annotate", "-s", "taxid-path"],
            "2111111\n",
            monkeypatch,
            capsys,
        )
        assert rc == 0
        assert out == "2;21;211;2111;21111;211111;2111111\t\n"

    def test_tree_mode(self, refpack, monkeypatch, capsys, tmp_path):
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(refpack["dir"]))
        outfile = str(tmp_path / "t.newick")
        rc, out = run_cli(
            taxknife_cli.main,
            ["--mode", "tree", "-q", "species", "genus", "phylum", "-o", outfile],
            "2111111\n2111112\n2211111\n",
            monkeypatch,
            capsys,
        )
        assert rc == 0
        tree = open(outfile).read()
        assert tree.startswith("(") and tree.endswith(");\n")
        assert "2111111" in tree and "2211111" in tree
