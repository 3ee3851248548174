"""Reference-binary differentials for the tool chain (round 4).

The reference's binner, taxknife, and alignments-filter MAINS compile
VERBATIM against the vendored SeqAn + the test-only Boost shim
(tests/conftest.py fixtures), so every decision surface of the tool
chain is diffed against the reference's own executing code:

  * alignments-filter / taxknife: stdout (and tree files) byte-identical.
  * binner: headers byte-identical; body compared under the canonical
    normalization (LC_ALL=C sort of lines) documented in BASELINE.md —
    the reference emits unordered_map hash order, which is not
    deterministic across standard-library builds.
"""

import io
import os
import subprocess
import sys

import pytest

from fixture_tax import write_dump
from taxtk.cli import alignments_filter as filter_cli
from taxtk.cli import binner as binner_cli
from taxtk.cli import taxknife as taxknife_cli

from test_ref_oracle import _make_corpus, _run_oracle


def _require(binary):
    if binary is None:
        pytest.skip("reference tree/toolchain unavailable")


def _run_ref(binary, args, stdin_text, tax_dir=None):
    env = dict(os.environ)
    if tax_dir is not None:
        env["TAXATORTK_TAXONOMY_NCBI"] = str(tax_dir)
    r = subprocess.run(
        [binary, *args], input=stdin_text, capture_output=True,
        text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _run_tk(main, argv, stdin_text, monkeypatch, capsys, tax_dir=None):
    if tax_dir is not None:
        monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tax_dir))
    monkeypatch.setattr(sys, "stdin", io.StringIO(stdin_text))
    rc = main(argv)
    out = capsys.readouterr().out
    assert rc == 0
    return out


# --------------------------------------------------------------- binner

def _binner_gff3(rpa_ref_oracle, tmp_path, seed=909, n_queries=54):
    """GFF3 produced by the reference's own predict() over the rich
    corpus — realistic multi-segment prediction records for binning."""
    corpus = _make_corpus(tmp_path, seed=seed, n_queries=n_queries)
    return corpus, _run_oracle(rpa_ref_oracle, corpus)


def _split_bioboxes(text):
    head, body = [], []
    for line in text.splitlines():
        (body if line and not line.startswith(("#", "@")) else head).append(
            line)
    return head, sorted(body)


@pytest.mark.parametrize(
    "args",
    [
        [],
        ["-s", "5"],
        ["-s", "500"],          # per-sequence fallback path
        ["-j", "0.51"],
        ["-j", "0.95"],
        ["-m", "100"],          # sample-min-support, absolute
        ["-m", "0.3"],          # sample-min-support, fraction form
        ["-i", "species:0.9", "-i", "genus:0.5"],
        ["-g", "(q[0-9]{2}).*"],  # glob many queries per consensus group
    ],
)
def test_binner_matches_reference_binary(rpa_ref_oracle, ref_binner,
                                         tmp_path, monkeypatch, capsys,
                                         args):
    """taxtk-binner vs the reference binner binary over the reference-
    generated GFF3, across the support/majority/constraint/glob knobs.
    Headers byte-identical; body equal under the canonical sort."""
    _require(rpa_ref_oracle)
    _require(ref_binner)
    corpus, gff3 = _binner_gff3(rpa_ref_oracle, tmp_path)
    ref_log = str(tmp_path / "ref-binning.log")
    tk_log = str(tmp_path / "tk-binning.log")
    expected = _run_ref(ref_binner,
                        ["-n", "SAMPLE", "-l", ref_log, *args], gff3,
                        tax_dir=corpus["dir"])
    got = _run_tk(binner_cli.main, ["-n", "SAMPLE", "-l", tk_log, *args],
                  gff3, monkeypatch, capsys, tax_dir=corpus["dir"])
    ref_head, ref_body = _split_bioboxes(expected)
    tk_head, tk_body = _split_bioboxes(got)
    assert tk_head == ref_head
    assert tk_body == ref_body
    assert len(ref_body) > 0


def test_binner_consensus_groups_match_reference(rpa_ref_oracle,
                                                 ref_binner, tmp_path,
                                                 monkeypatch, capsys):
    """Globbing many segments per group routes every group through
    combinePredictionRanges (predictionranges.hh) on both sides; the
    per-group (taxid, support, length) triples must agree exactly."""
    _require(rpa_ref_oracle)
    _require(ref_binner)
    corpus, gff3 = _binner_gff3(rpa_ref_oracle, tmp_path, seed=910,
                                n_queries=72)
    glob = "(q[0-9]{2}).*"  # 8 groups of ~9 records
    expected = _run_ref(
        ref_binner,
        ["-n", "S", "-g", glob, "-l", str(tmp_path / "r.log")],
        gff3, tax_dir=corpus["dir"])
    got = _run_tk(
        binner_cli.main,
        ["-n", "S", "-g", glob, "-l", str(tmp_path / "t.log")],
        gff3, monkeypatch, capsys, tax_dir=corpus["dir"])
    _, ref_body = _split_bioboxes(expected)
    _, tk_body = _split_bioboxes(got)
    assert tk_body == ref_body
    # multi-record groups actually exercised
    assert len(ref_body) < gff3.count("\n") - 1

    # the combinePredictionRanges decision-table log
    # (predictionranges.hh:204-211) matches block-for-block; blocks are
    # keyed by query since the reference emits groups in unordered_map
    # hash order
    def log_blocks(path):
        blocks, cur, key = {}, [], None
        for line in open(path).read().splitlines():
            if line.startswith("combining "):
                if key:
                    blocks[key] = cur
                key, cur = line, [line]
            elif key:
                cur.append(line)
        if key:
            blocks[key] = cur
        return blocks

    ref_blocks = log_blocks(str(tmp_path / "r.log"))
    tk_blocks = log_blocks(str(tmp_path / "t.log"))
    assert ref_blocks and tk_blocks == ref_blocks


# -------------------------------------------------------------- taxknife

TAXID_INPUT = "\n".join(
    ["2111111", "21111111", "2111121", "21121", "31", "999", "2", "1",
     "badtoken", "2211111"]) + "\n"


@pytest.mark.parametrize(
    "args",
    [
        ["-m", "annotate", "-s", "name"],
        ["-m", "annotate", "-s", "rank"],
        ["-m", "annotate", "-s", "path"],
        ["-m", "annotate", "-s", "taxid-path"],
        ["-m", "annotate", "-s", "name", "-c", "INVALID"],
        ["-m", "annotate", "-s", "name", "-a"],
        ["-m", "traverse", "-r", "genus"],
        ["-m", "traverse", "-r", "family", "phylum"],
        ["-m", "traverse", "-r", "genus", "-k"],
        ["-m", "traverse", "-r", "genus", "-t"],
        ["-m", "traverse", "-r", "genus", "-b", "0"],
    ],
)
def test_taxknife_matches_reference_binary(ref_taxknife, tmp_path,
                                           monkeypatch, capsys, args):
    """taxknife stdout byte-identical to the reference binary across
    annotate/traverse modes, invalid-taxid handling included."""
    _require(ref_taxknife)
    write_dump(str(tmp_path))
    expected = _run_ref(ref_taxknife, args, TAXID_INPUT,
                        tax_dir=tmp_path)
    got = _run_tk(taxknife_cli.main, list(args), TAXID_INPUT,
                  monkeypatch, capsys, tax_dir=tmp_path)
    assert got == expected


def test_taxknife_field_column_matches_reference(ref_taxknife, tmp_path,
                                                 monkeypatch, capsys):
    """-f selects the taxid column; other columns pass through with the
    reference's exact re-tokenization quirks."""
    _require(ref_taxknife)
    write_dump(str(tmp_path))
    stdin = ("x1\t2111111\textra\nx2\t31\ty\nx3\t999\tz\n")
    args = ["-m", "annotate", "-s", "name", "-f", "2"]
    expected = _run_ref(ref_taxknife, args, stdin, tax_dir=tmp_path)
    got = _run_tk(taxknife_cli.main, args, stdin, monkeypatch, capsys,
                  tax_dir=tmp_path)
    assert got == expected


def _canon_newick(text):
    """Parse a newick string into a canonical nested tuple (children
    sorted): the reference's SIBLING order is heap-pointer order — its
    NewickTaxonFilter keys a std::map<const TaxonNode*, ...> and
    front-splices child lists (taxonfilter.hh:88-101), so byte order is
    an allocator artifact; topology + labels are the defined output."""
    text = text.strip().rstrip(";")
    pos = [0]

    def parse():
        children = []
        if pos[0] < len(text) and text[pos[0]] == "(":
            pos[0] += 1
            while True:
                children.append(parse())
                if text[pos[0]] == ",":
                    pos[0] += 1
                    continue
                assert text[pos[0]] == ")"
                pos[0] += 1
                break
        start = pos[0]
        while pos[0] < len(text) and text[pos[0]] not in "(),;":
            pos[0] += 1
        return (text[start:pos[0]], tuple(sorted(children)))

    return parse()


def test_taxknife_tree_mode_matches_reference(ref_taxknife, tmp_path,
                                              monkeypatch, capsys):
    """tree mode: newick trees identical as labeled topologies (sibling
    order normalized, see _canon_newick), stdout passthrough
    byte-identical."""
    _require(ref_taxknife)
    write_dump(str(tmp_path))
    ref_out = str(tmp_path / "ref.newick")
    tk_out = str(tmp_path / "tk.newick")
    stdin = "2111111\n2111121\n2211111\n31\n21121\n"
    base = ["-m", "tree", "-q", "species", "family", "phylum"]
    for extra in ([], ["-i"], ["-v"], ["-i", "-v"]):
        expected = _run_ref(ref_taxknife, base + ["-o", ref_out, *extra],
                            stdin, tax_dir=tmp_path)
        got = _run_tk(taxknife_cli.main, base + ["-o", tk_out, *extra],
                      stdin, monkeypatch, capsys, tax_dir=tmp_path)
        assert got == expected, extra  # stdout passthrough
        assert _canon_newick(open(tk_out).read()) == _canon_newick(
            open(ref_out).read()), extra
    # NOTE: the reference binary CRASHES on empty stdin (begin() on an
    # empty vector, taxonfilter.hh:105); taxtk handles it — that edge is
    # covered by taxtk's own CLI tests, no differential is possible.


# ------------------------------------------------------ alignments-filter

@pytest.mark.parametrize(
    "args",
    [
        [],
        ["-m", "50"],
        ["-p", "0.8"],
        ["-t", "0.3"],
        ["-e", "1e-20"],
        ["-b", "2"],
        ["-c", "3"],
        ["-s"],
        ["-k"],
        ["-z", "-t", "0.5"],
        ["-t", "0.2", "-b", "1", "-c", "2", "-z"],
    ],
)
def test_alignments_filter_matches_reference_binary(
        ref_alignments_filter, tmp_path, monkeypatch, capsys, args):
    """alignments-filter stdout byte-identical to the reference binary
    across the filter chain flags (chain order alignments-filter.cpp:
    131-164)."""
    _require(ref_alignments_filter)
    corpus = _make_corpus(tmp_path, seed=911, n_queries=36)
    expected = _run_ref(ref_alignments_filter, args,
                        corpus["alignments"])
    got = _run_tk(filter_cli.main, list(args), corpus["alignments"],
                  monkeypatch, capsys)
    assert got == expected
    assert expected.strip()
