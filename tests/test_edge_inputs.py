"""Edge inputs: empty stdin, comment-only input, malformed lines."""

import io
import sys

import pytest

from fixture_tax import write_dump
from taxtk.cli import taxator as taxator_cli
from taxtk.cli import binner as binner_cli
from taxtk.cli import alignments_filter as filter_cli


@pytest.fixture
def env(tmp_path, monkeypatch):
    write_dump(str(tmp_path))
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))
    (tmp_path / "map.tax").write_text("r1\t2111111\n")
    (tmp_path / "q.fna").write_text(">q1\nACGT\n")
    (tmp_path / "ref.fna").write_text(">r1\nACGT\n")
    return tmp_path


def _argv(tmp_path):
    return [
        "-a", "rpa", "-g", str(tmp_path / "map.tax"),
        "-q", str(tmp_path / "q.fna"), "-f", str(tmp_path / "ref.fna"),
    ]


def test_empty_stdin(env, monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO(""))
    assert taxator_cli.main(_argv(env)) == 0
    assert capsys.readouterr().out == "##gff-version 3\n"


def test_comment_only_stdin(env, monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO("# nothing\n\n# more\n"))
    assert taxator_cli.main(_argv(env)) == 0
    assert capsys.readouterr().out == "##gff-version 3\n"


def test_malformed_line_is_fatal(env, monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO("not a record\n"))
    assert taxator_cli.main(_argv(env)) == 1
    assert "unrecoverable" in capsys.readouterr().err


def test_unknown_mapping_is_fatal(env, monkeypatch, capsys):
    monkeypatch.setattr(
        sys, "stdin", io.StringIO("q1\t1\t4\t4\tUNKNOWN\t1\t4\t8\t0\t4\t4\n")
    )
    assert taxator_cli.main(_argv(env)) == 1
    err = capsys.readouterr().err
    assert "bad taxon mapping" in err


def test_filter_empty_stdin(monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO(""))
    assert filter_cli.main([]) == 0
    assert capsys.readouterr().out == ""


def test_binner_empty_stdin(env, monkeypatch, capsys):
    monkeypatch.setattr(sys, "stdin", io.StringIO(""))
    assert binner_cli.main(["-n", "s", "-l", "/dev/null"]) == 0
    out = capsys.readouterr().out
    # header only, no body rows
    assert "@Version:0.9.1" in out
    assert not [l for l in out.splitlines() if l and not l.startswith(("#", "@"))]
