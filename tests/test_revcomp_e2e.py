"""Reverse-complement end-to-end: a query that is the reverse complement of
a reference region, reported with swapped reference coordinates
(doc/fileformats.md:30), must realign at distance ~0 and classify to the
correct species — this exercises the revcomp segment fetch
(taxonpredictionmodelsequence.hh:870-880) for real, not just path parity."""

import io
import random

import pytest

from taxtk.engine.executor import RpaEngine
from taxtk.engine.recordsets import iter_record_sets
from taxtk.formats.alignments import parse_alignment_line
from fixture_tax import make_taxonomy

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s):
    return "".join(COMP[c] for c in reversed(s))


class DictStore:
    def __init__(self, seqs):
        self.seqs = {k: v.encode() for k, v in seqs.items()}

    def get_sequence(self, sid, start, stop):
        s = self.seqs[sid]
        stop = min(stop, len(s))
        start = max(1, start)
        return s[start - 1 : stop] if stop >= start else b""


def test_revcomp_alignment_classifies_correctly(tmp_path):
    tax = make_taxonomy(tmp_path, prune=True)
    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(600))
    far = "".join(rng.choice("ACGT") for _ in range(600))
    genomes = {"refE": genome, "refB": far}
    mapping = {"refE": "2111111", "refB": "2211111"}

    # query = reverse complement of genome[100:300]
    frag = genome[100:300]
    query = rc(frag)
    qlen = len(query)

    # two candidates: the true revcomp hit (swapped ref coords) and a
    # spurious weaker hit on the distant genome
    lines = [
        # swapped coords 300..101 denote the reverse complement
        f"q1\t1\t{qlen}\t{qlen}\trefE\t300\t101\t{2.0*qlen - 10:.1f}\t1e-30\t{qlen-3}\t{qlen}",
        f"q1\t1\t{qlen}\t{qlen}\trefB\t101\t300\t40.0\t1e-3\t{int(qlen*0.6)}\t{qlen}",
    ]
    records = []
    for ln in lines:
        r = parse_alignment_line(ln)
        r.reference_node = tax.node(mapping[r.reference_identifier])
        records.append(r)

    eng = RpaEngine(tax, DictStore({"q1": query}), DictStore(genomes))
    out = io.StringIO()
    eng.run(iter_record_sets(iter(records)), out)
    line = out.getvalue().strip().splitlines()[1]
    # the revcomp realignment is exact (dist 0 against the true segment):
    # lower node must be the E. coli species, support the full identity
    assert "rtax=2111111" in line
    assert "tax=2111111" in line.split("tax=")[1][:8] or "tax=2111111" in line

    # sanity: with a BROKEN revcomp (forward fetch), the realignment
    # distance would be huge; prove the engine distinguishes by checking
    # the pass-0 distance via the decision log
    log = io.StringIO()
    eng2 = RpaEngine(
        tax, DictStore({"q1": query}), DictStore(genomes), logsink=log
    )
    out2 = io.StringIO()
    for ln in lines:
        pass
    records2 = []
    for ln in lines:
        r = parse_alignment_line(ln)
        r.reference_node = tax.node(mapping[r.reference_identifier])
        records2.append(r)
    eng2.run(iter_record_sets(iter(records2)), out2)
    logtext = log.getvalue()
    # realignment against the revcomp segment: 3 substitutions were NOT
    # introduced (identities qlen-3 is only the reported search value), the
    # true sequences are identical -> dist=0.00 in the pass-0 ALN line
    assert "ALN 0 <=> query\tdist=0.00" in logtext
