"""CLI surface details: version flags, whitelist, indexed query store,
module entry points."""

import io
import subprocess
import sys

import pytest

from taxtk.cli import taxator as taxator_cli
from taxtk.cli import binner as binner_cli
from taxtk.cli import alignments_filter as filter_cli
from taxtk.cli import taxknife as taxknife_cli
from taxtk.cli import tools as tools_cli
from taxtk.constants import PROGRAM_VERSION


@pytest.mark.parametrize(
    "main", [taxator_cli.main, binner_cli.main, filter_cli.main, taxknife_cli.main]
)
def test_version_flags(main, capsys):
    assert main(["-V"]) == 0
    assert capsys.readouterr().out.strip() == PROGRAM_VERSION


def test_citation(capsys):
    assert taxator_cli.main(["--citation"]) == 0
    assert "Bioinformatics" in capsys.readouterr().out


def test_missing_mapping_is_error(capsys):
    assert taxator_cli.main(["-a", "rpa"]) == 1
    assert "taxonomy mapping" in capsys.readouterr().out


def test_module_entry_points():
    for mod in (
        "taxtk.cli.taxator",
        "taxtk.cli.binner",
        "taxtk.cli.alignments_filter",
        "taxtk.cli.taxknife",
        "taxtk.cli.tools",
        "taxtk.cli.pipeline",
        "taxtk.cli.index",
    ):
        r = subprocess.run(
            [sys.executable, "-m", mod, "--help"],
            capture_output=True,
            text=True,
            timeout=300,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, (mod, r.stderr[-500:])


def test_whitelist_limits_db_store(tmp_path, monkeypatch, capsys):
    from fixture_tax import write_dump

    write_dump(str(tmp_path))
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))
    fa = tmp_path / "ref.fna"
    fa.write_text(">r1\nACGTACGTACGT\n>r2\nTTTTTTTTTTTT\n")
    (tmp_path / "map.tax").write_text("r1\t2111111\nr2\t2111112\n")
    wl = tmp_path / "wl.txt"
    wl.write_text("r1\n")
    qf = tmp_path / "q.fna"
    qf.write_text(">q1\nACGTACGTACGT\n")
    # r2 alignment resolves its taxon fine and lies inside the re-eval
    # band (pass-0 fetch), but the whitelist-restricted in-memory store
    # cannot serve the r2 segment -> fatal error path.  identities <
    # qrlength so the exact-match shortcut does not skip the fetches.
    aln = (
        "q1\t1\t12\t12\tr1\t1\t12\t20\t0\t11\t12\n"
        "q1\t1\t12\t12\tr2\t1\t12\t19.5\t0\t10\t12\n"
    )
    monkeypatch.setattr(sys, "stdin", io.StringIO(aln))
    rc = taxator_cli.main(
        ["-a", "rpa", "-g", str(tmp_path / "map.tax"), "-q", str(qf),
         "-f", str(fa), "-w", str(wl)]
    )
    err = capsys.readouterr().err
    assert rc == 1
    assert "unrecoverable" in err


def test_indexed_query_store(tmp_path, monkeypatch, capsys):
    from fixture_tax import write_dump

    write_dump(str(tmp_path))
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))
    fa = tmp_path / "ref.fna"
    fa.write_text(">r1\nACGTACGTACGTACGTACGT\n")
    (tmp_path / "map.tax").write_text("r1\t2111111\n")
    qf = tmp_path / "q.fna"
    qf.write_text(">q1 some description\nACGTACGTACGTACGTACGT\n")
    aln = "q1\t1\t20\t20\tr1\t1\t20\t30\t0\t20\t20\n"
    monkeypatch.setattr(sys, "stdin", io.StringIO(aln))
    # -v: indexed query store -> identifiers are FIRST TOKENS, so 'q1' works
    rc = taxator_cli.main(
        ["-a", "rpa", "-g", str(tmp_path / "map.tax"), "-q", str(qf),
         "-v", str(qf) + ".fai", "-f", str(fa), "-i", str(fa) + ".fai"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "rtax=2111111" in out


def test_taxknife_traverse_keep_flags(tmp_path, monkeypatch, capsys):
    import io
    from fixture_tax import write_dump
    from taxtk.cli import taxknife as tk

    write_dump(str(tmp_path))
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))

    # unknown taxid skipped by default
    monkeypatch.setattr(sys, "stdin", io.StringIO("99999\n2111111\n"))
    assert tk.main(["--mode", "traverse", "-r", "genus"]) == 0
    out = capsys.readouterr().out
    assert out == "211111\t\n"

    # -t keeps unknown taxids; -b replaces them
    monkeypatch.setattr(sys, "stdin", io.StringIO("99999\n"))
    assert tk.main(["--mode", "traverse", "-r", "genus", "-t", "-b", "NA"]) == 0
    assert capsys.readouterr().out == "NA\t\n"

    # -k keeps taxa with no matching rank (root fallthrough) as original id
    monkeypatch.setattr(sys, "stdin", io.StringIO("2\n"))  # superkingdom
    assert tk.main(["--mode", "traverse", "-r", "genus", "-k"]) == 0
    assert capsys.readouterr().out == "2\t\n"


def test_taxknife_annotate_rank(tmp_path, monkeypatch, capsys):
    import io
    from fixture_tax import write_dump
    from taxtk.cli import taxknife as tk

    write_dump(str(tmp_path))
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))
    monkeypatch.setattr(sys, "stdin", io.StringIO("2111111\n21111\n"))
    assert tk.main(["--mode", "annotate", "-s", "rank"]) == 0
    assert capsys.readouterr().out == "species\t\nfamily\t\n"
