"""Protein-space CLI chain (binning-blast-protein shape): ORF queries,
BLOSUM kernel, ORF-globbing binner regex."""

import io
import os
import random
import sys

import pytest

from fixture_tax import write_dump
from taxtk.cli import taxator as taxator_cli
from taxtk.cli import binner as binner_cli


@pytest.fixture
def protein_refpack(tmp_path):
    write_dump(str(tmp_path))
    rng = random.Random(5)
    AA = "ACDEFGHIKLMNPQRSTVWY"
    base = "".join(rng.choice(AA) for _ in range(300))

    def mut(s, r):
        return "".join(c if rng.random() > r else rng.choice(AA) for c in s)

    prots = {"p1": base, "p2": mut(base, 0.1), "p3": mut(base, 0.35)}
    mapping = {"p1": "2111111", "p2": "2111112", "p3": "2211111"}
    faa = tmp_path / "refdata.faa"
    faa.write_text("".join(f">{k}\n{v}\n" for k, v in prots.items()))
    (tmp_path / "map.tax").write_text(
        "".join(f"{k}\t{v}\n" for k, v in mapping.items())
    )
    orfs = {
        "contig1_1": mut(base[50:200], 0.05),
        "contig1_2": mut(base[180:280], 0.05),
    }
    qf = tmp_path / "orfs.faa"
    qf.write_text("".join(f">{k}\n{v}\n" for k, v in orfs.items()))
    rows = []
    for qid, orf in orfs.items():
        qlen = len(orf)
        off = 51 if qid.endswith("_1") else 181
        for rid in prots:
            ident = int(qlen * (0.9 - 0.2 * rng.random()))
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{off}\t{off+qlen-1}\t"
                f"{2*ident-qlen}\t1e-20\t{ident}\t{qlen}"
            )
    return dict(
        dir=tmp_path, faa=str(faa), mapping=str(tmp_path / "map.tax"),
        qf=str(qf), alignments="\n".join(rows) + "\n", orfs=orfs,
    )


def test_protein_chain(protein_refpack, monkeypatch, capsys):
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(protein_refpack["dir"]))
    monkeypatch.setattr(sys, "stdin", io.StringIO(protein_refpack["alignments"]))
    rc = taxator_cli.main(
        [
            "-a", "rpa", "-b", "protein",
            "-g", protein_refpack["mapping"],
            "-q", protein_refpack["qf"],
            "-f", protein_refpack["faa"],
            "-i", protein_refpack["faa"] + ".fai",
        ]
    )
    gff = capsys.readouterr().out
    assert rc == 0
    lines = gff.strip().splitlines()
    assert lines[0] == "##gff-version 3"
    assert len(lines) == 1 + len(protein_refpack["orfs"])
    for line in lines[1:]:
        assert "rtax=" in line

    body = sorted(
        (l for l in lines if not l.startswith("#")),
        key=lambda l: l.split("\t")[0],
    )
    monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(body) + "\n"))
    rc = binner_cli.main(["-n", "s", "-g", "([^_]+)_.*", "-l", os.devnull])
    binning = capsys.readouterr().out
    assert rc == 0
    rows = [l for l in binning.splitlines() if l and not l.startswith(("#", "@"))]
    # both ORFs glob into one contig consensus
    assert len(rows) == 1 and rows[0].startswith("contig1\t")
    # length = sum of distinct ORF query lengths
    assert rows[0].split("\t")[3] == str(
        sum(len(v) for v in protein_refpack["orfs"].values())
    )
