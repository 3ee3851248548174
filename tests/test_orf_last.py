"""ORF-calling stage + LAST pipeline (VERDICT round-1 items 5 and 6):
DNA contigs -> ORFs -> protein classification -> bioboxes end-to-end, and
taxtk-binning --aligner last with a fake lastal stub (query sharding +
in-order merge, reference defaults -f 1 -X 3 -e 40)."""

import gzip
import io
import os
import random
import stat
import sys

import pytest

from fixture_tax import write_dump
from taxtk.pipeline.orf import call_orfs, orfs_of_sequence, _CODON


# --------------------------------------------------------------------- ORFs
AA2CODON = {}
for codon, aa in _CODON.items():
    AA2CODON.setdefault(aa, codon)


def rev_translate(prot: str) -> str:
    return "".join(AA2CODON[a] for a in prot)


def revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


class TestOrfCaller:
    def test_forward_orf_stop_to_stop(self):
        prot = "MKLVNQWERTYIPASDFGHKLCVNMQWERTYIPASDF"  # 37 aa
        dna = "TAA" + rev_translate(prot) + "TAA"
        got = list(orfs_of_sequence("c", dna, min_length=96))
        # frame 1 starts at the TAA, so the ORF is in frame 1 after the stop
        assert any(p == prot for _, p in got)
        hdr = [h for h, p in got if p == prot][0]
        assert hdr.startswith("c_")
        # start = nt 4 (1-based, after the leading stop codon), frame 1
        assert hdr.split("_")[1:3] == ["4", "1"]

    def test_reverse_frames(self):
        prot = "MKLVNQWERTYIPASDFGHKLCVNMQWERTYIPASDF"
        dna = revcomp("TAA" + rev_translate(prot) + "TAA")
        got = list(orfs_of_sequence("c", dna, min_length=96))
        hits = [(h, p) for h, p in got if p == prot]
        assert hits, got
        frame = int(hits[0][0].split("_")[2])
        assert frame in (4, 5, 6)

    def test_min_length_filter(self):
        short = "MKLVNQWERTY"  # 11 aa < 32
        dna = "TAA" + rev_translate(short) + "TAA"
        got = list(orfs_of_sequence("c", dna, min_length=96))
        assert not any(p == short for _, p in got)
        got = list(orfs_of_sequence("c", dna, min_length=33))
        assert any(p == short for _, p in got)

    def test_ambiguous_base_is_x_not_stop(self):
        prot = "K" * 40
        dna = rev_translate(prot)
        dna = dna[:60] + "NNN" + dna[63:]
        got = list(orfs_of_sequence("c", dna, min_length=96))
        assert any("X" in p and len(p) == 40 for _, p in got)

    def test_call_orfs_stream_and_prefix_contract(self):
        prot = "A" * 50
        fa = f">ctg1 desc\n{'TAA' + rev_translate(prot) + 'TAA'}\n>ctg2\nACGT\n"
        out = io.StringIO()
        n = call_orfs(io.StringIO(fa), out, min_length=96)
        assert n >= 1
        for line in out.getvalue().splitlines():
            if line.startswith(">"):
                # the binner glob regex contract: contig id before first '_'
                assert line[1:].split("_")[0] in ("ctg1", "ctg2")


# ------------------------------------------------- protein pipeline e2e
@pytest.fixture
def protein_workflow_case(tmp_path):
    """DNA contigs whose main ORF matches a protein refpack entry."""
    root = tmp_path / "refpack"
    taxdir = root / "ncbi-taxonomy"
    taxdir.mkdir(parents=True)
    write_dump(str(taxdir))

    rng = random.Random(11)
    AA = "ACDEFGHIKLMNPQRSTVWY"
    base = "".join(rng.choice(AA) for _ in range(150))

    def mut(s, r):
        return "".join(c if rng.random() > r else rng.choice(AA) for c in s)

    prots = {"p1": base, "p2": mut(base, 0.1), "p3": mut(base, 0.4)}
    mapping = {"p1": "2111111", "p2": "2111112", "p3": "2211111"}
    (root / "refdata.faa").write_text(
        "".join(f">{k}\n{v}\n" for k, v in prots.items())
    )
    from taxtk.refpack.store import FaiIndex

    FaiIndex.build(str(root / "refdata.faa")).save(
        str(root / "refdata.faa.fai")
    )
    (root / "mapping.tax").write_text(
        "".join(f"{k}\t{v}\n" for k, v in mapping.items())
    )

    # two DNA contigs, each embedding one ORF similar to base
    contigs = {}
    for i in range(2):
        orf_prot = mut(base[10:130], 0.05)
        contigs[f"contig{i}"] = "TAA" + rev_translate(orf_prot) + "TAA"
    qfile = tmp_path / "contigs.fna"
    qfile.write_text("".join(f">{k}\n{v}\n" for k, v in contigs.items()))

    # learn the ORF ids the caller will emit, then fabricate blastp rows
    faa_out = io.StringIO()
    call_orfs(open(qfile), faa_out)
    orfs = {}
    for chunk in faa_out.getvalue().split(">"):
        if chunk.strip():
            hdr, seq = chunk.split("\n", 1)
            orfs[hdr.strip()] = seq.replace("\n", "")
    rows = []
    for qid, orf in orfs.items():
        qlen = len(orf)
        if qlen < 100:
            continue  # fabricate alignments only for the main ORFs
        for rid in prots:
            ident = int(qlen * (0.92 - 0.25 * rng.random()))
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t11\t{10+qlen}\t"
                f"{2*ident-qlen}\t1e-20\t{ident}\t{qlen}"
            )
    aln = tmp_path / "aln.tsv"
    aln.write_text("\n".join(rows) + "\n")
    return dict(root=str(root), qfile=str(qfile), aln=str(aln),
                contigs=contigs)


def test_protein_pipeline_dna_to_bioboxes(protein_workflow_case, tmp_path):
    """binning-blast-protein parity: DNA in, ORF stage, contig-level
    bioboxes out (reference: binning-blast-protein.bash:84-122)."""
    from taxtk.pipeline.workflows import run_binning_workflow

    outdir = str(tmp_path / "out")
    paths = run_binning_workflow(
        protein_workflow_case["root"],
        protein_workflow_case["qfile"],
        outdir,
        alignments_file=protein_workflow_case["aln"],
        protein=True,
        orf_call=True,
    )
    assert paths["orf_tool"] in ("orfm", "builtin")
    assert os.path.exists(paths["orfs"])  # sample.faa checkpoint
    rows = [
        l.split("\t")
        for l in open(paths["binning"])
        if l.strip() and not l.startswith(("#", "@"))
    ]
    # one consensus row per CONTIG (ORFs globbed back by ([^_]+)_.*)
    assert sorted(r[0] for r in rows) == sorted(protein_workflow_case["contigs"])
    assert all(r[1] != "" for r in rows)


# ----------------------------------------------------- LAST pipeline e2e
LASTAL_STUB = r'''#!/usr/bin/env python3
"""Fake lastal: reads FASTA queries from stdin ('-'), emits one MAF block
per query against reference r0; records its argv for flag assertions."""
import sys

with open(sys.argv[0] + ".argv", "a") as fh:
    fh.write("\t".join(sys.argv[1:]) + "\n")

args = [a for a in sys.argv[1:] if a != "-"]
queries = []
name = None
chunks = []
for line in sys.stdin:
    if line.startswith(">"):
        if name:
            queries.append((name, "".join(chunks)))
        name = line[1:].split()[0]
        chunks = []
    else:
        chunks.append(line.strip())
if name:
    queries.append((name, "".join(chunks)))

print("# LAST version stub")
for name, seq in queries:
    text = seq[:40]
    print()
    print("a score=80 expect=1e-20")
    print(f"s r0 10 {len(text)} + 500 {text}")
    print(f"s {name} 0 {len(text)} + {len(seq)} {text}")
'''


@pytest.fixture
def last_case(tmp_path):
    root = tmp_path / "refpack"
    taxdir = root / "ncbi-taxonomy"
    taxdir.mkdir(parents=True)
    write_dump(str(taxdir))
    rng = random.Random(3)
    ref = "".join(rng.choice("ACGT") for _ in range(500))
    (root / "refdata.fna").write_text(f">r0\n{ref}\n")
    from taxtk.refpack.store import FaiIndex

    FaiIndex.build(str(root / "refdata.fna")).save(
        str(root / "refdata.fna.fai")
    )
    (root / "mapping.tax").write_text("r0\t2111111\n")
    (root / "aligner-index" / "last").mkdir(parents=True)

    # queries are windows of the reference so the stub's fake coordinates
    # describe real alignments
    queries = {f"q{i}": ref[10:10 + 60 + 10 * i] for i in range(4)}
    qfile = tmp_path / "q.fna"
    qfile.write_text("".join(f">{k}\n{v}\n" for k, v in queries.items()))

    stub = tmp_path / "bin" / "lastal"
    stub.parent.mkdir()
    stub.write_text(LASTAL_STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return dict(root=str(root), qfile=str(qfile), stub=str(stub),
                bindir=str(stub.parent), queries=queries)


def test_last_pipeline_with_stub(last_case, tmp_path, monkeypatch):
    monkeypatch.setenv(
        "PATH", last_case["bindir"] + os.pathsep + os.environ["PATH"]
    )
    from taxtk.pipeline.workflows import run_binning_workflow

    outdir = str(tmp_path / "out")
    paths = run_binning_workflow(
        last_case["root"], last_case["qfile"], outdir,
        aligner_kind="last", cores=2,
    )
    # reference defaults forwarded (binning-last.bash:92)
    argv = open(last_case["stub"] + ".argv").read()
    assert "-f\t1\t-X\t3\t-e\t40" in argv
    # cores=2 -> two shard invocations, outputs merged in query order
    # (the workflow's version-pin check probes `lastal --version` first,
    # pipeline/toolcheck.py — not an alignment invocation)
    align_calls = [
        l for l in argv.strip().splitlines() if not l.startswith("--version")
    ]
    assert len(align_calls) == 2
    with gzip.open(paths["alignments"], "rt") as fh:
        qids = [l.split("\t")[0] for l in fh if l.strip()]
    assert qids == sorted(last_case["queries"])  # original order preserved
    rows = [
        l.split("\t")
        for l in open(paths["binning"])
        if l.strip() and not l.startswith(("#", "@"))
    ]
    assert sorted(r[0] for r in rows) == sorted(last_case["queries"])


def test_last_requires_nucleotide(last_case, tmp_path):
    from taxtk.pipeline.workflows import run_binning_workflow
    from taxtk.utils.errors import TaxtkError

    with pytest.raises(TaxtkError):
        run_binning_workflow(
            last_case["root"], last_case["qfile"], str(tmp_path / "o2"),
            aligner_kind="last", protein=True,
        )
