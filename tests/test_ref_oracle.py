"""Reference-code decision-layer oracle (round-3 VERDICT item 1).

tests/tools/rpa_ref_oracle compiles the reference's OWN
RPAPredictionModel::predict() (reference:
core/src/taxonpredictionmodelsequence.hh:326-881) — plus its record
parser, record-set generators, NCBI taxonomy loader, sequence storages,
LCA models and GFF3 writer — against the SeqAn headers the reference
vendors, behind a minimal header-only Boost shim.  These tests run that
binary and taxtk over the same randomized corpora and diff the GFF3
byte-for-byte: decision-layer parity anchored by the reference code
itself actually executing, not by a reading of it.

Corpus shapes cover every predict() branch: the n==0 (all-masked) and
n==1 early exits, the identical-sequence local-score fast path, score
ties, reverse-complement references, segment-jittered record sets (the
getSequence extension+clamp logic, taxonpredictionmodelsequence.hh:
860-880), edge-of-reference segments, multi-segment queries through the
split generator, and both sorted/unsorted generator modes.
"""

import io
import os
import random
import subprocess
import sys

import pytest

from fixture_tax import write_dump
from taxtk.cli import taxator as taxator_cli

LEAF_TAXIDS = ["2111111", "2111112", "2111121", "2211111", "21121", "31"]
DNA_COMP = str.maketrans("ACGTN", "TGCAN")


def _revcomp(s):
    return s.translate(DNA_COMP)[::-1]


def _mutate(rng, s, rate, alphabet="ACGT"):
    return "".join(
        c if rng.random() > rate else rng.choice(alphabet) for c in s
    )


def _make_corpus(tmp_path, seed=0, n_queries=40, protein=False,
                 tie_free=False):
    """Synthetic refpack + alignment rows exercising the predict()
    branch inventory; returns dict(dir, mapping, qfile, refdata, rows).

    tie_free=True drops the 'tie' kind and forces DISTINCT search scores
    within each query run: the reference sorts records by score with
    std::sort (unstable), so score ties permute record INDICES — GFF3
    output is tie-invariant but the decision LOG's per-index lines are
    not.  Log byte-parity is only defined on tie-free inputs."""
    rng = random.Random(seed)
    write_dump(str(tmp_path))
    alphabet = "ACDEFGHIKLMNPQRSTVWY" if protein else "ACGT"
    base_len = 500 if protein else 1500
    base = "".join(rng.choice(alphabet) for _ in range(base_len))
    n_refs = 8
    genomes = {
        f"ref{i}": _mutate(rng, base, 0.02 * i, alphabet)
        for i in range(n_refs)
    }
    genomes["ref_tie"] = genomes["ref1"]  # identical seq, different taxon
    mapping = {
        rid: LEAF_TAXIDS[i % len(LEAF_TAXIDS)]
        for i, rid in enumerate(genomes)
    }

    refdata = tmp_path / "refdata.fna"
    with open(refdata, "w") as fh:
        for rid, seq in genomes.items():
            fh.write(f">{rid}\n{seq}\n")
    mapfile = tmp_path / "mapping.tax"
    with open(mapfile, "w") as fh:
        for rid, tid in mapping.items():
            fh.write(f"{rid}\t{tid}\n")

    kinds = ["plain", "exact", "revcomp", "single", "two_seg", "tie",
             "edge", "masked", "allmasked"]
    if protein:  # no reverse complement in protein space
        kinds = ["plain", "exact", "single", "two_seg", "tie", "masked"]
    if tie_free:
        kinds = [k for k in kinds if k != "tie"]
    queries, rows = {}, []
    used_scores = {}  # qid -> set of scores already emitted (tie_free)

    def uniq_score(qid, ident, slen):
        """Score for a fabricated row; in tie_free mode decrement ident
        until the score is unique within the query run."""
        score = round(2.0 * ident - slen, 1)
        if tie_free:
            used = used_scores.setdefault(qid, set())
            while score in used and ident > 1:
                ident -= 1
                score = round(2.0 * ident - slen, 1)
            used.add(score)
        return ident, score

    def cand_rows(qid, qstart, qstop, qlen, seg, n_cand, jitter=0,
                  mask_frac=0.0):
        """Rows for one aligned segment: pick n_cand references, fabricate
        search scores/identities (both sides re-align the real sequences,
        so these only steer threshold branches)."""
        picks = rng.sample(sorted(genomes), min(n_cand, len(genomes)))
        off = rng.randrange(0, max(1, len(base) - len(seg) - 10))
        out = []
        for rid in picks:
            j = rng.randrange(-jitter, jitter + 1) if jitter else 0
            qs = max(1, qstart + j)
            qe = min(qlen, qstop + j)
            slen = qe - qs + 1
            ident, score = uniq_score(
                qid, int(slen * rng.uniform(0.62, 0.98)), slen)
            rs, re_ = off + 1, off + slen
            mask = "*" if rng.random() < mask_frac else ""
            out.append(
                f"{mask}{qid}\t{qs}\t{qe}\t{qlen}\t{rid}\t{rs}\t{re_}\t"
                f"{score}\t1e-10\t{ident}\t{slen}"
            )
        return out

    for q in range(n_queries):
        kind = kinds[q % len(kinds)]
        qid = f"q{q:04d}_{kind}"
        seg_len = rng.randrange(60, 120) if protein else rng.randrange(
            120, 260)
        start = rng.randrange(0, len(base) - seg_len)
        seg = base[start : start + seg_len]

        if kind == "plain":
            qseq = _mutate(rng, seg, 0.03, alphabet)
            queries[qid] = qseq
            rows += cand_rows(qid, 1, len(qseq), len(qseq), qseq,
                              rng.randrange(3, 7), jitter=4)
        elif kind == "exact":
            rid = f"ref{rng.randrange(n_refs)}"
            qseq = genomes[rid][start : start + seg_len]
            queries[qid] = qseq
            qlen = len(qseq)
            # best row: the exact hit (identities == alignment_length ==
            # query range) -> the local-score fast path
            if tie_free:  # reserve the exact row's score first
                used_scores.setdefault(qid, set()).add(
                    round(float(qlen), 1))
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{start+1}\t"
                f"{start+qlen}\t{float(2*qlen-qlen):.1f}\t1e-30\t{qlen}\t{qlen}"
            )
            rows += cand_rows(qid, 1, qlen, qlen, qseq, 3)
        elif kind == "revcomp":
            qseq = _revcomp(_mutate(rng, seg, 0.03, alphabet))
            queries[qid] = qseq
            qlen = len(qseq)
            for rid in rng.sample(sorted(genomes), 4):
                ident, score = uniq_score(
                    qid, int(qlen * rng.uniform(0.65, 0.95)), qlen)
                # swapped reference coordinates signal reverse complement
                rows.append(
                    f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{start+qlen}\t"
                    f"{start+1}\t{score}\t1e-10\t{ident}\t{qlen}"
                )
        elif kind == "single":
            qseq = _mutate(rng, seg, 0.05, alphabet)
            queries[qid] = qseq
            rows += cand_rows(qid, 1, len(qseq), len(qseq), qseq, 1)
        elif kind == "two_seg":
            gap = rng.randrange(40, 80)
            seg2_len = rng.randrange(60, 120)
            s2 = rng.randrange(0, len(base) - seg2_len)
            qseq = (_mutate(rng, seg, 0.03, alphabet)
                    + "".join(rng.choice(alphabet) for _ in range(gap))
                    + _mutate(rng, base[s2 : s2 + seg2_len], 0.03, alphabet))
            queries[qid] = qseq
            qlen = len(qseq)
            rows += cand_rows(qid, 1, seg_len, qlen, seg,
                              rng.randrange(2, 5), jitter=3)
            rows += cand_rows(qid, seg_len + gap + 1, qlen, qlen,
                              base[s2 : s2 + seg2_len],
                              rng.randrange(2, 5), jitter=3)
        elif kind == "tie":
            qseq = _mutate(rng, genomes["ref1"][start : start + seg_len],
                           0.02, alphabet)
            queries[qid] = qseq
            qlen = len(qseq)
            ident = int(qlen * 0.9)
            score = round(2.0 * ident - qlen, 1)
            for rid in ("ref1", "ref_tie", "ref2"):  # ref1 == ref_tie
                rows.append(
                    f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{start+1}\t"
                    f"{start+qlen}\t{score}\t1e-10\t{ident}\t{qlen}"
                )
        elif kind == "edge":
            # segment hugging the start of the reference: the model's
            # getSequence left/right extensions must clamp
            qseq = _mutate(rng, base[:seg_len], 0.03, alphabet)
            queries[qid] = qseq
            qlen = len(qseq)
            for rid in rng.sample(sorted(genomes), 3):
                ident, score = uniq_score(
                    qid, int(qlen * rng.uniform(0.7, 0.95)), qlen)
                rows.append(
                    f"{qid}\t3\t{qlen}\t{qlen}\t{rid}\t1\t{qlen-2}\t"
                    f"{score}\t1e-10\t{ident}\t{qlen-2}"
                )
        elif kind == "masked":
            qseq = _mutate(rng, seg, 0.04, alphabet)
            queries[qid] = qseq
            rows += cand_rows(qid, 1, len(qseq), len(qseq), qseq, 5,
                              jitter=2, mask_frac=0.4)
        elif kind == "allmasked":
            qseq = _mutate(rng, seg, 0.04, alphabet)
            queries[qid] = qseq
            qlen = len(qseq)
            ident = int(qlen * 0.8)
            for rid in rng.sample(sorted(genomes), 2):
                rows.append(
                    f"*{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{start+1}\t"
                    f"{start+qlen}\t{round(2.0*ident-qlen, 1)}\t1e-10\t"
                    f"{ident}\t{qlen}"
                )

    qfile = tmp_path / "query.fna"
    with open(qfile, "w") as fh:
        for qid, seq in queries.items():
            fh.write(f">{qid}\n{seq}\n")
    return dict(
        dir=str(tmp_path), mapping=str(mapfile), qfile=str(qfile),
        refdata=str(refdata), rows=rows,
        alignments="\n".join(rows) + "\n",
    )


def _make_lca_corpus(tmp_path, seed=0, n_queries=36):
    """Corpus for the order-sensitive LCA models: every row in a query
    run gets a UNIQUE (query_start, query_stop), because the reference's
    split generator sorts (start, stop, RECORD POINTER) tuples with
    std::sort (alignmentrecord.hh:481) — ties are broken by heap
    allocation order, which is allocator-dependent nondeterminism (same
    category as the binner's unordered_map output order, BASELINE.md).
    MeganLCA's support counter counts max-score IMPROVEMENTS in stream
    order (alignmentsfilter.hh:353-367), so tie order changes results;
    with distinct coordinates the sort is total and both sides must
    agree byte-for-byte."""
    rng = random.Random(seed)
    write_dump(str(tmp_path))
    refs = [f"ref{i}" for i in range(9)]
    mapping = {rid: LEAF_TAXIDS[i % len(LEAF_TAXIDS)]
               for i, rid in enumerate(refs)}
    seqs = {rid: "".join(rng.choice("ACGT") for _ in range(400))
            for rid in refs}
    refdata = tmp_path / "refdata.fna"
    with open(refdata, "w") as fh:
        for rid in refs:
            fh.write(f">{rid}\n{seqs[rid]}\n")
    mapfile = tmp_path / "mapping.tax"
    with open(mapfile, "w") as fh:
        for rid, tid in mapping.items():
            fh.write(f"{rid}\t{tid}\n")
    queries, rows = {}, []
    evalues = ["1e-30", "1e-10", "1e-3", "5", "2000"]  # 2000 > default max
    for q in range(n_queries):
        qid = f"lq{q:04d}"
        qlen = rng.randrange(150, 400)
        queries[qid] = "".join(rng.choice("ACGT") for _ in range(qlen))
        n_rows = rng.randrange(2, 8)
        scores = rng.sample(range(20, 400), n_rows)  # distinct scores
        for i in range(n_rows):
            qs, qe = 1 + 2 * i, qlen - 3 * i  # unique per row
            if qe <= qs:
                continue
            slen = qe - qs + 1
            ident = max(1, int(slen * rng.uniform(0.5, 0.99)))
            rs = rng.randrange(1, 200)
            rows.append(
                f"{qid}\t{qs}\t{qe}\t{qlen}\t{rng.choice(refs)}\t{rs}\t"
                f"{rs+slen-1}\t{float(scores[i]):.1f}\t"
                f"{rng.choice(evalues)}\t{ident}\t{slen}"
            )
    qfile = tmp_path / "query.fna"
    with open(qfile, "w") as fh:
        for qid, seq in queries.items():
            fh.write(f">{qid}\n{seq}\n")
    return dict(
        dir=str(tmp_path), mapping=str(mapfile), qfile=str(qfile),
        refdata=str(refdata), rows=rows,
        alignments="\n".join(rows) + "\n",
    )


def _run_oracle(binary, corpus, extra=(), alignments=None, indexed=True):
    """Run the compiled reference code.  indexed=True selects the
    reference's RandomIndexedSeqstoreRO for the reference database — the
    production configuration (extended/binning-blast.bash passes the
    index) and the one whose getSequenceReverseComplement actually
    reverse-complements; the in-memory store's is a broken stub returning
    the whole forward sequence (sequencestorage.hh:123-132 vs :364-369),
    see test_inmemory_revcomp_divergence_documented."""
    env = {**os.environ, "TAXATORTK_TAXONOMY_NCBI": corpus["dir"]}
    args = [binary, "--mapping", corpus["mapping"], "--queries",
            corpus["qfile"], "--refs", corpus["refdata"]]
    if indexed:
        # pre-build the samtools-format .fai: the reference's own
        # build-if-missing path is broken (sequencestorage.hh:322-326
        # inverts seqanmod::build's success return), its pipeline always
        # pre-builds the index (extended/index-blast.bash)
        fai = corpus["refdata"] + ".oracle.fai"
        if not os.path.exists(fai):
            from taxtk.refpack.store import FaiIndex

            FaiIndex.build(corpus["refdata"]).save(fai)
        args += ["--ref-index", fai]
    r = subprocess.run(
        args + list(extra),
        input=alignments if alignments is not None else corpus["alignments"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _run_taxtk(corpus, argv_extra, monkeypatch, capsys, alignments=None):
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", corpus["dir"])
    monkeypatch.setattr(
        sys, "stdin",
        io.StringIO(alignments if alignments is not None
                    else corpus["alignments"]))
    rc = taxator_cli.main(
        ["-g", corpus["mapping"], "-q", corpus["qfile"], "-f",
         corpus["refdata"], "-i", corpus["refdata"] + ".fai", *argv_extra])
    out = capsys.readouterr().out
    assert rc == 0
    return out


def _require(rpa_ref_oracle):
    if rpa_ref_oracle is None:
        pytest.skip("reference tree/toolchain unavailable")


def test_dna_default_params_byte_identical(rpa_ref_oracle, tmp_path,
                                           monkeypatch, capsys):
    """All corpus shapes, default parameters: the reference's compiled
    predict() and taxtk emit byte-identical GFF3."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=101, n_queries=45)
    expected = _run_oracle(rpa_ref_oracle, corpus)
    got = _run_taxtk(corpus, [], monkeypatch, capsys)
    assert got == expected


@pytest.mark.parametrize(
    "ref_args,tk_args",
    [
        ((("--toppercent", "0.3"),), ("-t", "0.3")),
        ((("--filterout", "0.0"),), ("-x", "0.0")),
        ((("--filterout", "0.9"),), ("-x", "0.9")),
        ((("--split", "0"),), ("-s", "0")),
        ((("--delete-notranks", "0"),), ("-d", "0")),
    ],
)
def test_dna_param_sweep_byte_identical(rpa_ref_oracle, tmp_path,
                                        monkeypatch, capsys, ref_args,
                                        tk_args):
    """Parameter sweep over the RPA knobs that steer pass selection."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=202, n_queries=27)
    expected = _run_oracle(
        rpa_ref_oracle, corpus,
        extra=[a for pair in ref_args for a in pair])
    got = _run_taxtk(corpus, list(tk_args), monkeypatch, capsys)
    assert got == expected


def test_dna_sorted_generator_byte_identical(rpa_ref_oracle, tmp_path,
                                             monkeypatch, capsys):
    """-o 1 (pre-sorted input) routes both sides through their sorted
    record-set generators."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=303, n_queries=27)
    expected = _run_oracle(rpa_ref_oracle, corpus, extra=["--sorted", "1"])
    got = _run_taxtk(corpus, ["-o", "1"], monkeypatch, capsys)
    assert got == expected


def test_protein_byte_identical(rpa_ref_oracle, tmp_path, monkeypatch,
                                capsys):
    """Protein decision layer: BLOSUM62 realignment + float32 selfscore
    normalization through the reference's own predict()."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=404, n_queries=24, protein=True)
    expected = _run_oracle(rpa_ref_oracle, corpus,
                           extra=["--format", "protein"])
    got = _run_taxtk(corpus, ["-b", "protein"], monkeypatch, capsys)
    assert got == expected


@pytest.mark.parametrize(
    "algo,ref_args,tk_args",
    [
        ("dummy", (), ()),
        ("simple-lca", (), ()),
        ("megan-lca", ("--toppercent", "0.2", "--minscore", "50",
                       "--minsupport", "2", "--maxevalue", "1e-5"),
         ("-t", "0.2", "-m", "50", "-c", "2", "-e", "1e-5")),
        ("ic-megan-lca", ("--ignore-unclassified",),
         ("-u",)),
        ("n-best-lca", ("--nbest", "3"), ("-n", "3")),
    ],
)
def test_lca_models_byte_identical(rpa_ref_oracle, tmp_path, monkeypatch,
                                   capsys, algo, ref_args, tk_args):
    """The non-RPA prediction models against the reference's own code
    (taxonpredictionmodel.hh:58-420).  Uses the tie-free corpus: see
    _make_lca_corpus on why (start, stop) ties are reference
    nondeterminism for the order-sensitive models."""
    _require(rpa_ref_oracle)
    corpus = _make_lca_corpus(tmp_path, seed=505, n_queries=36)
    expected = _run_oracle(rpa_ref_oracle, corpus,
                           extra=["--algorithm", algo, *ref_args])
    got = _run_taxtk(corpus, ["-a", algo, *tk_args], monkeypatch, capsys)
    assert got == expected


def _normalize_log(text):
    """Zero the STATS CPU-time fields (init/seqret/process, clock() ms
    in the reference, structural zeros in the replay) — the only
    non-deterministic content in the decision log."""
    out = []
    for line in text.splitlines():
        if line.startswith("STATS\t"):
            f = line.split("\t")
            if len(f) >= 11:
                f[7] = f[8] = f[9] = "0"
            line = "\t".join(f)
        out.append(line)
    return "\n".join(out)


def test_dna_decision_log_byte_identical(rpa_ref_oracle, tmp_path,
                                         monkeypatch, capsys):
    """The FULL decision log (-l): every ID/NUMREF/PASS/+ALN/EXT/SCORE/
    NUMALN/NUMOUTGRP/RANGE/STATS line the reference's predict() writes to
    its logsink, byte-identical modulo CPU-time fields.  Requires the
    tie-free corpus: score ties permute record indices via the
    reference's unstable std::sort (see _make_corpus)."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=808, n_queries=45, tie_free=True)
    reflog = str(tmp_path / "ref.log")
    tklog = str(tmp_path / "tk.log")
    expected = _run_oracle(rpa_ref_oracle, corpus,
                           extra=["--log", reflog])
    got = _run_taxtk(corpus, ["-l", tklog], monkeypatch, capsys)
    assert got == expected  # GFF3 parity holds too
    ref_log = _normalize_log(open(reflog).read())
    tk_log = _normalize_log(open(tklog).read())
    assert tk_log == ref_log
    # the log actually exercised the full pass structure
    assert "PASS\t2" in ref_log and "+ALN" in ref_log


STRUCTURAL_LOG_PREFIXES = (
    "ID\t", "  NUMREF", "  RANGE", "    RANGE", "STATS", "  PASS",
    "    NUMALN", "    NUMOUTGRP", "    EXT", "    SCORE", "    +ALN",
    "    *ALN", "      current", "      query:")


def test_protein_decision_log_byte_identical(rpa_ref_oracle, tmp_path,
                                             monkeypatch, capsys):
    """Protein -l log: the FULL log byte-identical to the reference's
    logsink — including the SeqAn alignment-art blocks the reference
    streams after every +ALN line (logsink << queryalignment,
    taxonpredictionmodelsequence.hh:534,:637,:783,:803; replicated by
    models/alignment_art.py with SeqAn's exact traceback preference and
    align_base.h _write layout).  STATS CPU-times normalized as in the
    DNA log test."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=77, n_queries=24, protein=True,
                          tie_free=True)
    reflog = str(tmp_path / "ref.log")
    tklog = str(tmp_path / "tk.log")
    expected = _run_oracle(rpa_ref_oracle, corpus,
                           extra=["--format", "protein", "--log", reflog])
    got = _run_taxtk(corpus, ["-b", "protein", "-l", tklog], monkeypatch,
                     capsys)
    assert got == expected
    ref_log = _normalize_log(open(reflog).read())
    tk_log = _normalize_log(open(tklog).read())
    assert tk_log == ref_log
    # the log actually contains art blocks (match-line pipes + rulers)
    assert "+ALN" in ref_log and "PASS\t2" in ref_log
    assert "    .    :" in ref_log and "|" in ref_log


def test_inmemory_revcomp_divergence_documented(rpa_ref_oracle, tmp_path,
                                                monkeypatch, capsys):
    """Adjudicated deviation (SURVEY §7 decision, docs/COMPONENTS.md):
    the reference's IN-MEMORY store ships a broken
    getSequenceReverseComplement that returns the WHOLE reference
    sequence forward (sequencestorage.hh:123-132, body commented out);
    the indexed store reverse-complements correctly
    (sequencestorage.hh:364-369).  taxtk fixes the in-memory store, so:
    oracle(indexed) == taxtk, and oracle(in-memory) must differ from
    both ONLY on reverse-complement queries — executable documentation
    that the remaining divergence is the reference's own bug."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=707, n_queries=27)
    indexed = _run_oracle(rpa_ref_oracle, corpus)
    inmem = _run_oracle(rpa_ref_oracle, corpus, indexed=False)
    got = _run_taxtk(corpus, [], monkeypatch, capsys)
    assert got == indexed
    diff_ids = {
        a.split("\t", 1)[0]
        for a, b in zip(indexed.splitlines(), inmem.splitlines())
        if a != b
    }
    assert diff_ids, "expected the reference's in-memory bug to surface"
    assert all("revcomp" in q for q in diff_ids), diff_ids


def test_dna_1k_record_sets_byte_identical(rpa_ref_oracle, tmp_path,
                                           monkeypatch, capsys):
    """Scale criterion from the round-3 verdict: >=1000 record sets with
    zero diff against the executing reference code."""
    _require(rpa_ref_oracle)
    corpus = _make_corpus(tmp_path, seed=606, n_queries=960)
    expected = _run_oracle(rpa_ref_oracle, corpus)
    got = _run_taxtk(corpus, [], monkeypatch, capsys)
    n_sets = sum(
        1 for line in expected.splitlines() if not line.startswith("#"))
    assert n_sets >= 1000, n_sets
    assert got == expected


def test_dna_long_segments_byte_identical(rpa_ref_oracle, tmp_path,
                                          monkeypatch, capsys):
    """Long-segment decision parity: 8-15 kbp queries against 20 kbp
    references — the regime the engine routes through the long-pair
    kernels on TPU (native host Myers in this CPU suite); the
    reference's SeqAn MyersBitVector runs the same pairs."""
    _require(rpa_ref_oracle)
    rng = random.Random(42)
    write_dump(str(tmp_path))
    base = "".join(rng.choice("ACGT") for _ in range(20_000))
    genomes = {f"ref{i}": _mutate(rng, base, 0.02 * i) for i in range(5)}
    mapping = {rid: LEAF_TAXIDS[i % len(LEAF_TAXIDS)]
               for i, rid in enumerate(genomes)}
    refdata = tmp_path / "refdata.fna"
    with open(refdata, "w") as fh:
        for rid, seq in genomes.items():
            fh.write(f">{rid}\n{seq}\n")
    mapfile = tmp_path / "mapping.tax"
    with open(mapfile, "w") as fh:
        for rid, tid in mapping.items():
            fh.write(f"{rid}\t{tid}\n")
    queries, rows = {}, []
    for q in range(8):
        qlen = rng.randrange(8_000, 15_000)
        start = rng.randrange(0, len(base) - qlen)
        qid = f"lq{q}"
        queries[qid] = _mutate(rng, base[start : start + qlen], 0.01)
        for i, rid in enumerate(sorted(genomes)):
            ident = int(qlen * (0.97 - 0.03 * i))
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{start+1}\t"
                f"{start+qlen}\t{round(2.0*ident-qlen, 1)}\t1e-30\t"
                f"{ident}\t{qlen}"
            )
    qfile = tmp_path / "query.fna"
    with open(qfile, "w") as fh:
        for qid, seq in queries.items():
            fh.write(f">{qid}\n{seq}\n")
    corpus = dict(
        dir=str(tmp_path), mapping=str(mapfile), qfile=str(qfile),
        refdata=str(refdata), rows=rows,
        alignments="\n".join(rows) + "\n",
    )
    expected = _run_oracle(rpa_ref_oracle, corpus)
    got = _run_taxtk(corpus, [], monkeypatch, capsys)
    assert got == expected
    assert expected.count("\n") == 9  # header + 8 records
