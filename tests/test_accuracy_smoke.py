"""Scientific smoke test: on a synthetic community with known truth, the
RPA + binner chain must place contigs consistently with their source
lineage (genus-or-below for close references, never a wrong clade)."""

import io
import random

import pytest

from fixture_tax import make_taxonomy
from taxtk.engine.executor import RpaEngine
from taxtk.engine.recordsets import iter_record_sets
from taxtk.formats.alignments import parse_alignment_line
from taxtk.binning.binner import run_binner
from taxtk.ops import oracle
import numpy as np


class DictStore:
    def __init__(self, seqs):
        self.seqs = {k: v.encode() for k, v in seqs.items()}

    def get_sequence(self, sid, start, stop):
        s = self.seqs[sid]
        stop = min(stop, len(s))
        start = max(1, start)
        return s[start - 1 : stop] if stop >= start else b""


def test_known_truth_community(tmp_path):
    tax = make_taxonomy(tmp_path, prune=True)
    rng = random.Random(42)

    # two related Escherichia genomes + one distant Bacillus
    base = "".join(rng.choice("ACGT") for _ in range(4000))

    def mutate(s, rate):
        return "".join(c if rng.random() > rate else rng.choice("ACGT") for c in s)

    genomes = {
        "ecoli": base,
        "eferg": mutate(base, 0.04),  # congeneric neighbor
        "bsub": "".join(rng.choice("ACGT") for _ in range(4000)),  # unrelated
    }
    mapping = {"ecoli": "2111111", "eferg": "2111112", "bsub": "2211111"}

    # queries: fragments of the E. coli genome with 1% divergence
    queries = {}
    truth = {}
    records = []
    for q in range(20):
        st = rng.randrange(0, 3200)
        frag = mutate(base[st : st + 600], 0.01)
        qid = f"contig{q}"
        queries[qid] = frag
        truth[qid] = "ecoli"
        qlen = len(frag)
        for rid, g in genomes.items():
            window = g[st : st + qlen]
            d = oracle.edit_distance(
                np.frombuffer(frag.encode(), np.uint8),
                np.frombuffer(window.encode(), np.uint8),
            )
            ident = qlen - d
            if ident < qlen * 0.5:
                continue
            score = max(5.0, 2.0 * ident - qlen)
            records.append(
                parse_alignment_line(
                    f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{st+1}\t{st+qlen}\t"
                    f"{score:.1f}\t1e-20\t{ident}\t{qlen}"
                )
            )
    for r in records:
        r.reference_node = tax.node(mapping[r.reference_identifier])

    eng = RpaEngine(tax, DictStore(queries), DictStore(genomes))
    gff = io.StringIO()
    eng.run(iter_record_sets(iter(records)), gff)

    # every segment's lower node must lie inside Enterobacteriaceae
    # (never the Bacillus clade)
    fam = tax.node("21111")
    bacillaceae = tax.node("22111")
    for line in gff.getvalue().splitlines():
        if line.startswith("#"):
            continue
        taxattr = line.split("tax=")[1].split(";")[0]
        low = tax.node(taxattr.split(":")[0].split("-")[0])
        assert not (
            low == bacillaceae or tax.is_parent_of(bacillaceae, low)
        ), line
    # and the binner consensus lands at genus level or below for >= 80%
    body = sorted(
        (l for l in gff.getvalue().splitlines() if not l.startswith("#")),
        key=lambda l: l.split("\t")[0],
    )
    out = io.StringIO()
    run_binner(tax, [io.StringIO("\n".join(body) + "\n")], out, "s")
    rows = [
        l for l in out.getvalue().splitlines() if l and not l.startswith(("#", "@"))
    ]
    assert len(rows) == len(queries)
    genus = tax.node("211111")
    good = 0
    for row in rows:
        taxid = row.split("\t")[1]
        node = tax.node(taxid)
        if node == genus or tax.is_parent_of(genus, node):
            good += 1
        else:
            # anything else must at least be on the Enterobacteriaceae path
            assert node == fam or tax.is_parent_of(node, genus), row
    assert good >= 0.8 * len(rows), f"{good}/{len(rows)} at genus or below"
