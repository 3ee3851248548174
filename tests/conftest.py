"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (the driver separately dry-runs multi-chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms; reclaim the CPU backend before any jax computation runs.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import warnings

import pytest

# seqpool donates its pool buffers (in-place appends on TPU); the CPU
# backend does not implement donation and warns — expected here
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable"
)

TOOLS_DIR = pathlib.Path(__file__).parent / "tools"
FIXTURES_DIR = pathlib.Path(__file__).parent / "fixtures"


def _build_ref_tool(binary_name, main_src, extra_srcs):
    """Compile a reference-code oracle binary against the vendored SeqAn
    + the minimal Boost shim (tests/tools/boost_shim); returns the
    binary path or None when the reference tree/toolchain is missing."""
    ref = pathlib.Path("/root/reference/core")
    binary = TOOLS_DIR / binary_name
    if binary.exists():
        # staleness: rebuild when the harness source, any reference
        # source, or any boost-shim header is newer than the binary
        deps = [main_src if os.path.isabs(main_src)
                else str(ref / main_src)]
        deps += [str(ref / "src" / f) for f in extra_srcs]
        deps += [str(p) for p in (TOOLS_DIR / "boost_shim").rglob("*.hpp")]
        bin_mtime = binary.stat().st_mtime
        if all(os.path.getmtime(d) <= bin_mtime
               for d in deps if os.path.exists(d)):
            return str(binary)
        binary.unlink()
    if not ref.exists():
        return None
    cmd = [
        "g++", "-std=c++14", "-O2", "-w",
        "-I", str(TOOLS_DIR / "boost_shim"),
        "-I", str(ref / "includes-external"),
        "-I", str(ref),
        main_src if os.path.isabs(main_src) else str(ref / main_src),
    ] + [
        str(ref / "src" / f) for f in extra_srcs
    ] + ["-o", str(binary), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=900)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None
    return str(binary)


@pytest.fixture(scope="session")
def rpa_ref_oracle():
    """The reference-code decision oracle: the reference's OWN
    RPAPredictionModel::predict() + LCA models behind a thin harness
    main (tests/tools/rpa_ref_oracle.cpp)."""
    return _build_ref_tool(
        "rpa_ref_oracle", str(TOOLS_DIR / "rpa_ref_oracle.cpp"),
        ("taxontree.cpp", "taxonomyinterface.cpp", "ncbidata.cpp",
         "accessconv.cpp", "predictionrecord.cpp"))


@pytest.fixture(scope="session")
def ref_binner():
    """The reference's binner binary compiled VERBATIM (its own main +
    program_options via the shim)."""
    return _build_ref_tool(
        "ref_binner", "binner.cpp",
        ("taxontree.cpp", "taxonomyinterface.cpp", "ncbidata.cpp",
         "predictionrecord.cpp", "bioboxes.cpp"))


@pytest.fixture(scope="session")
def ref_taxknife():
    """The reference's taxknife binary compiled verbatim."""
    return _build_ref_tool(
        "ref_taxknife", "taxknife.cpp",
        ("taxontree.cpp", "taxonomyinterface.cpp", "ncbidata.cpp"))


@pytest.fixture(scope="session")
def ref_alignments_filter():
    """The reference's alignments-filter binary compiled verbatim."""
    return _build_ref_tool(
        "ref_alignments_filter", "alignments-filter.cpp",
        ("taxontree.cpp", "taxonomyinterface.cpp", "ncbidata.cpp",
         "accessconv.cpp", "alignmentrecord.cpp"))


@pytest.fixture(scope="session")
def seqan_oracle():
    """Path to the SeqAn golden-oracle binary, building it if necessary.
    Returns None when it cannot be built (tests fall back to committed
    fixtures)."""
    binary = TOOLS_DIR / "seqan_oracle"
    if binary.exists():
        return str(binary)
    src = TOOLS_DIR / "seqan_oracle.cpp"
    include = "/root/reference/core/includes-external"
    if not pathlib.Path(include).exists():
        return None
    try:
        subprocess.run(
            ["g++", "-std=c++14", "-O2", "-I", include, str(src), "-o", str(binary), "-lz"],
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return str(binary)
