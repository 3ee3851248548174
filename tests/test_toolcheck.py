"""External-tool version pinning (taxtk/pipeline/toolcheck.py).

Reference analog: contrib/download.tsv:1-6 + contrib/download-verify.sh
pin BLAST 2.11.0+, LAST 1170, OrfM 0.7.1, KronaTools 2.7.1 with sha256
verification.  taxtk verifies PATH tools against the refpack's
index-time record (preferred) or the reference-pinned manifest.
"""

import json
import os
import stat

import pytest

from taxtk.pipeline import toolcheck
from taxtk.utils.errors import TaxtkError


def _fake_tool(dirpath, name, version_line):
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        f.write(f"#!/bin/sh\necho '{version_line}'\n")
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


@pytest.fixture
def fake_path(tmp_path, monkeypatch):
    d = tmp_path / "bin"
    d.mkdir()
    monkeypatch.setenv("PATH", str(d))
    return str(d)


def test_manifest_matches_reference_pins():
    # versions embedded in the reference's pinned artifact names
    assert toolcheck.MANIFEST["blastn"].version == "2.11.0"
    assert toolcheck.MANIFEST["lastal"].version == "1170"
    assert toolcheck.MANIFEST["orfm"].version == "0.7.1"
    assert toolcheck.MANIFEST["ktImportText"].version == "2.7.1"
    # provenance sha256 of the pinned artifacts (contrib/download.tsv)
    assert toolcheck.MANIFEST["blastn"].artifact_sha256.startswith("93454c")
    assert toolcheck.MANIFEST["lastal"].artifact_sha256.startswith("841b86")


def test_probe_and_verify_matching_version(fake_path):
    _fake_tool(fake_path, "blastn", "blastn: 2.11.0+")
    assert toolcheck.probe_tool_version("blastn") == "2.11.0+"
    warnings = toolcheck.verify_external_tools(["blastn"], warn=lambda m: None)
    assert warnings == []


def test_verify_warns_on_mismatch(fake_path):
    _fake_tool(fake_path, "blastn", "blastn: 2.16.0+")
    got = []
    warnings = toolcheck.verify_external_tools(["blastn"], warn=got.append)
    assert len(warnings) == 1 and "2.16.0+" in warnings[0]
    assert "2.11.0" in warnings[0]
    assert got == warnings


def test_verify_warns_on_missing_tool(fake_path):
    warnings = toolcheck.verify_external_tools(
        ["lastal"], warn=lambda m: None
    )
    assert len(warnings) == 1 and "not found" in warnings[0]


def test_strict_mode_raises(fake_path):
    _fake_tool(fake_path, "orfm", "OrfM v0.6.0")
    with pytest.raises(TaxtkError, match="0.6.0"):
        toolcheck.verify_external_tools(["orfm"], strict=True)


def test_refpack_record_beats_manifest(fake_path, tmp_path):
    """A refpack indexed with a specific version pins THAT version, even
    when it differs from the reference manifest."""
    _fake_tool(fake_path, "blastn", "blastn: 2.16.0+")
    rp = tmp_path / "refpack"
    rp.mkdir()
    recorded = toolcheck.record_tool_versions(str(rp), ["blastn"])
    assert recorded == {"blastn": "2.16.0+"}
    assert json.load(open(rp / "tool_versions.json")) == recorded
    # same version installed: no warning despite the manifest saying 2.11.0
    assert toolcheck.verify_external_tools(
        ["blastn"], refpack_dir=str(rp), warn=lambda m: None
    ) == []
    # now the installed tool changes: the refpack record flags it
    _fake_tool(fake_path, "blastn", "blastn: 2.11.0+")
    warnings = toolcheck.verify_external_tools(
        ["blastn"], refpack_dir=str(rp), warn=lambda m: None
    )
    assert len(warnings) == 1 and "index time" in warnings[0]
