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


@pytest.fixture(scope="session")
def rpa_ref_oracle():
    """Path to the reference-code decision oracle (the reference's OWN
    RPAPredictionModel::predict() + LCA models compiled against its
    vendored SeqAn, with a minimal Boost shim), building it if necessary.
    Returns None when the reference tree or toolchain is unavailable."""
    binary = TOOLS_DIR / "rpa_ref_oracle"
    if binary.exists():
        return str(binary)
    ref = pathlib.Path("/root/reference/core")
    if not ref.exists():
        return None
    cmd = [
        "g++", "-std=c++14", "-O2", "-w",
        "-I", str(TOOLS_DIR / "boost_shim"),
        "-I", str(ref / "includes-external"),
        "-I", str(ref),
        str(TOOLS_DIR / "rpa_ref_oracle.cpp"),
    ] + [
        str(ref / "src" / f)
        for f in ("taxontree.cpp", "taxonomyinterface.cpp", "ncbidata.cpp",
                  "accessconv.cpp", "predictionrecord.cpp")
    ] + ["-o", str(binary), "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=900)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None
    return str(binary)


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
