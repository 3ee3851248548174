"""RPA engine tests.

Strategy:
  * hand-reasoned small scenarios (unclassified / single / exact-match
    shortcut) against the reference semantics;
  * randomized synthetic refpacks: the batched JAX alignment path must
    produce byte-identical GFF3 to an oracle-backed aligner that computes
    every pair directly with the calibrated NumPy DP (independent of the
    batching/bucketing machinery);
  * superset sufficiency: any missing pair in the replay cache raises
    KeyError, so a green run proves the 3-round pair supersets cover the
    reference's adaptive alignment pattern.
"""

import io
import random

import numpy as np
import pytest

from taxtk.engine.aligner import BatchAligner
from taxtk.engine.executor import RpaEngine
from taxtk.engine.recordsets import iter_record_sets
from taxtk.formats.alignments import AlignmentRecord, parse_alignment_line
from taxtk.models.rpa import AlignValue, f32
from taxtk.ops import oracle
from fixture_tax import make_taxonomy


class OracleAligner(BatchAligner):
    """Computes every pair directly with the NumPy oracle (no batching)."""

    def __init__(self, mode="dna"):
        super().__init__(mode)

    def align_pairs(self, pairs, shard_ids=None, deferred=False):
        if deferred:
            vals = self.align_pairs(pairs, shard_ids)
            return lambda: vals
        out = []
        for a, b in pairs:
            if self.mode == "dna":
                if len(a) == 0 or len(b) == 0:
                    out.append(self._empty_pair(len(a), len(b)))
                    continue
                r = oracle.dna_align(a, b)
            else:
                if len(a) == 0 or len(b) == 0:
                    out.append(self._empty_pair(len(a), len(b)))
                    continue
                r = oracle.protein_align(a, b)
            out.append(AlignValue(distance=f32(r.distance), similarity=f32(r.similarity)))
        return out


class DictStore:
    def __init__(self, seqs):
        self.seqs = {k: v.encode() if isinstance(v, str) else v for k, v in seqs.items()}

    def get_sequence(self, seqid, start, stop):
        seq = self.seqs[seqid]
        stop = min(stop, len(seq))
        if start < 1:
            start = 1
        if stop < start:
            return b""
        return seq[start - 1 : stop]


def _aln(qid, qs, qe, qlen, rid, rs, re, score, ident, alen, evalue="0"):
    return parse_alignment_line(
        f"{qid}\t{qs}\t{qe}\t{qlen}\t{rid}\t{rs}\t{re}\t{score}\t{evalue}\t{ident}\t{alen}"
    )


def _resolve(records, tax, mapping):
    for r in records:
        r.reference_node = tax.node(mapping[r.reference_identifier])
    return records


@pytest.fixture
def tax(tmp_path):
    return make_taxonomy(tmp_path, prune=True)


def run_engine(tax, qstore, dbstore, recordsets, aligner=None, protein=False,
               mesh=None):
    eng = RpaEngine(tax, qstore, dbstore, protein=protein, aligner=aligner,
                    mesh=mesh)
    out = io.StringIO()
    eng.run(iter(recordsets), out)
    return out.getvalue()


class TestDegenerateCases:
    def test_unclassified_all_masked(self, tax):
        rec = _aln("q1", 1, 50, 100, "r1", 1, 50, 75.0, 50, 50)
        rec.masked = True
        rec.reference_node = tax.node("2111111")
        out = run_engine(tax, DictStore({}), DictStore({}), [[rec]])
        lines = out.strip().splitlines()
        assert lines[0] == "##gff-version 3"
        assert lines[1] == (
            "q1\ttaxator-tk\tsequence_feature\t1\t100\t0\t.\t.\t"
            "seqlen=100;tax=1;rtax=1"
        )

    def test_single_alignment_passthrough(self, tax):
        # reference :371-388: range [refnode, root], support = identities
        rec = _aln("q1", 5, 60, 100, "r1", 1, 56, 80.0, 52, 56)
        rec.reference_node = tax.node("2111111")
        out = run_engine(tax, DictStore({}), DictStore({}), [[rec]])
        line = out.strip().splitlines()[1]
        assert "\t5\t60\t" in line
        assert "tax=2111111:52-1" in line
        assert "rtax=2111111" in line
        assert "ival" not in line  # ival = 1.0 not printed

    def test_exact_match_shortcut(self, tax):
        # two refs with identical best score -> lnode = LCA; third worse ->
        # upper node from next score band (reference :431-472)
        qlen = 40
        recs = [
            _aln("q1", 1, 40, qlen, "rA", 1, 40, 80.0, 40, 40),
            _aln("q1", 1, 40, qlen, "rB", 1, 40, 80.0, 40, 40),
            _aln("q1", 1, 40, qlen, "rC", 1, 40, 60.0, 35, 40),
        ]
        mapping = {"rA": "2111111", "rB": "2111112", "rC": "2111121"}
        _resolve(recs, tax, mapping)
        out = run_engine(tax, DictStore({"q1": "A" * 40}), DictStore({}), [recs])
        line = out.strip().splitlines()[1]
        # lnode = LCA(E.coli, E.fergusonii) = genus Escherichia (211111)
        # unode = LCA(lnode, S.enterica) = family (21111)
        assert "tax=211111:40-21111" in line
        assert "rtax=211111" in line
        assert "ival=0" in line

    def test_stale_ival_quirk(self, tax):
        # reference record-reuse: an unclassified record after a record that
        # set ival in [0,1) inherits and prints the stale ival
        qlen = 40
        recs1 = [
            _aln("q1", 1, 40, qlen, "rA", 1, 40, 80.0, 40, 40),
            _aln("q1", 1, 40, qlen, "rB", 1, 40, 80.0, 40, 40),
        ]
        _resolve(recs1, tax, {"rA": "2111111", "rB": "2111112"})
        rec2 = _aln("q2", 1, 50, 100, "r1", 1, 50, 75.0, 50, 50)
        rec2.masked = True
        rec2.reference_node = tax.node("2111111")
        out = run_engine(
            tax, DictStore({"q1": "A" * 40}), DictStore({}), [recs1, [rec2]]
        )
        lines = out.strip().splitlines()
        assert "ival=0" in lines[1]  # exact-match shortcut sets ival 0
        assert lines[2].endswith("tax=1;rtax=1;ival=0")  # stale ival printed


def _make_refpack(rng, tax_leaves):
    """Synthetic genomes per species leaf; returns (refseqs, mapping)."""
    bases = "ACGT"
    refseqs = {}
    mapping = {}
    for k, taxid in enumerate(tax_leaves):
        seq = "".join(rng.choice(bases) for _ in range(600))
        refseqs[f"ref{k}"] = seq
        mapping[f"ref{k}"] = taxid
    return refseqs, mapping


def _mutate(rng, s, n_mut):
    s = list(s)
    for _ in range(n_mut):
        op = rng.choice("ssssid")
        p = rng.randrange(len(s))
        if op == "s":
            s[p] = rng.choice("ACGT")
        elif op == "i":
            s.insert(p, rng.choice("ACGT"))
        elif op == "d" and len(s) > 10:
            del s[p]
    return "".join(s)


def _synthesize_case(rng, tax):
    """Build a refpack + one query + plausible alignment records."""
    leaves = ["2111111", "2111112", "2111121", "2211111", "31", "21121"]
    refseqs, mapping = _make_refpack(rng, leaves)
    # query: fragment of ref0 with mutations
    src = rng.choice(list(refseqs))
    frag_start = rng.randrange(0, 300)
    frag_len = rng.randrange(80, 250)
    query = _mutate(rng, refseqs[src][frag_start : frag_start + frag_len], rng.randrange(0, 12))
    qlen = len(query)

    records = []
    for rid, rseq in refseqs.items():
        # fabricate a local alignment: align query vs a window of the ref
        if rng.random() < 0.25:
            continue
        ws = max(0, frag_start - rng.randrange(0, 20))
        wl = min(len(rseq) - ws, qlen + rng.randrange(0, 30))
        if wl < 30:
            continue
        dist = oracle.edit_distance(
            np.frombuffer(query.encode(), np.uint8),
            np.frombuffer(rseq[ws : ws + wl].encode(), np.uint8),
        )
        ident = max(10, qlen - dist)
        score = max(5.0, 2.0 * ident - qlen * 0.5)
        qs, qe = 1, qlen
        rs, re = ws + 1, ws + wl
        if rng.random() < 0.3:  # reverse-complement convention
            rs, re = re, rs
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            refseqs[rid] = rseq  # genome unchanged; record marks revcomp
            # make the query the revcomp fragment so coordinates stay honest
        rec = _aln("q0", qs, qe, qlen, rid, rs, re, round(score, 1), ident, wl)
        rec.reference_node = None
        records.append(rec)
    if not records:
        return None
    for r in records:
        r.reference_node = tax.node(mapping[r.reference_identifier])
    rng.shuffle(records)
    return refseqs, {"q0": query}, records


class TestRpaEndToEnd:
    def test_batched_equals_oracle_path(self, tax):
        rng = random.Random(1234)
        recordsets_all = []
        refstore_seqs = {}
        qstore_seqs = {}
        for case in range(12):
            made = _synthesize_case(rng, tax)
            if made is None:
                continue
            refseqs, qseqs, records = made
            qid = f"q{case}"
            for r in records:
                r.query_identifier = qid
            prefix = f"c{case}_"
            for r in records:
                r.reference_identifier = prefix + r.reference_identifier
            refstore_seqs.update({prefix + k: v for k, v in refseqs.items()})
            qstore_seqs[qid] = qseqs["q0"]
            recordsets_all.append(records)

        qstore = DictStore(qstore_seqs)
        dbstore = DictStore(refstore_seqs)

        out_batched = run_engine(tax, qstore, dbstore, recordsets_all)
        out_oracle = run_engine(
            tax, qstore, dbstore, recordsets_all, aligner=OracleAligner("dna")
        )
        assert out_batched == out_oracle
        # sanity: none of the outputs are trivially unclassified
        body = out_batched.strip().splitlines()[1:]
        assert len(body) == len(recordsets_all)
        assert any("tax=1;" not in line for line in body)

    def test_batched_equals_oracle_protein(self, tax):
        rng = random.Random(99)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        refseqs = {}
        mapping = {}
        leaves = ["2111111", "2111112", "2111121", "2211111"]
        for k, taxid in enumerate(leaves):
            refseqs[f"p{k}"] = "".join(rng.choice(AA) for _ in range(150))
            mapping[f"p{k}"] = taxid
        base = refseqs["p0"][20:100]
        query = "".join(
            c if rng.random() > 0.08 else rng.choice(AA) for c in base
        )
        qlen = len(query)
        records = []
        for rid in refseqs:
            ident = rng.randrange(40, 75)
            rec = _aln("pq", 1, qlen, qlen, rid, 21, 100, 50 + ident, ident, 80)
            rec.reference_node = tax.node(mapping[rid])
            records.append(rec)

        qstore = DictStore({"pq": query})
        dbstore = DictStore(refseqs)
        out_batched = run_engine(
            tax, qstore, dbstore, [records], protein=True
        )
        out_oracle = run_engine(
            tax, qstore, dbstore, [records],
            aligner=OracleAligner("protein"), protein=True,
        )
        assert out_batched == out_oracle


class TestRecordSets:
    def test_unsorted_split(self):
        recs = [
            _aln("q1", 1, 100, 500, "a", 1, 100, 50, 90, 100),
            _aln("q1", 300, 400, 500, "b", 1, 101, 50, 90, 100),
            _aln("q1", 50, 120, 500, "c", 1, 71, 40, 60, 70),
            _aln("q2", 1, 60, 200, "d", 1, 60, 30, 50, 60),
        ]
        sets = list(iter_record_sets(iter(recs), split_alignments=True))
        assert [len(s) for s in sets] == [2, 1, 1]
        assert {r.reference_identifier for r in sets[0]} == {"a", "c"}
        assert sets[1][0].reference_identifier == "b"

    def test_touching_segments_merge(self):
        # start == running_stop merges; start == running_stop+1 splits
        recs = [
            _aln("q", 1, 100, 300, "a", 1, 100, 50, 90, 100),
            _aln("q", 100, 150, 300, "b", 1, 51, 20, 40, 51),
            _aln("q", 152, 200, 300, "c", 1, 49, 20, 40, 49),
        ]
        sets = list(iter_record_sets(iter(recs), split_alignments=True))
        assert [len(s) for s in sets] == [2, 1]

    def test_interleaved_queries_make_separate_runs(self):
        recs = [
            _aln("q1", 1, 50, 100, "a", 1, 50, 50, 45, 50),
            _aln("q2", 1, 50, 100, "b", 1, 50, 50, 45, 50),
            _aln("q1", 1, 50, 100, "c", 1, 50, 50, 45, 50),
        ]
        sets = list(iter_record_sets(iter(recs), split_alignments=False))
        assert len(sets) == 3

    def test_sorted_split_streaming(self):
        recs = [
            _aln("q1", 1, 100, 500, "a", 1, 100, 50, 90, 100),
            _aln("q1", 50, 120, 500, "c", 1, 71, 40, 60, 70),
            _aln("q1", 300, 400, 500, "b", 1, 101, 50, 90, 100),
        ]
        sets = list(
            iter_record_sets(iter(recs), split_alignments=True, alignments_sorted=True)
        )
        assert [len(s) for s in sets] == [2, 1]
