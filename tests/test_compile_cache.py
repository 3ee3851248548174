"""Persistent compilation cache across processes.

taxtk/ops/__init__.py points JAX's persistent compilation cache at
TAXTK_JAX_CACHE (default ~/.cache/taxtk-jax) so the expensive TPU kernel
compiles (30-600 s per shape through the remote tunnel, BASELINE.md) are
paid once per machine, not once per process.  This test proves the
contract end-to-end: a fresh process compiling the production Myers
kernel MISSES and populates the cache; a second fresh process with the
same cache dir HITS (observed via JAX's monitoring events), i.e. no
recompile."""

import json
import os
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import taxtk.ops  # installs the persistent cache config
    import jax
    jax.config.update("jax_platforms", "cpu")
    # test kernels compile in <1s on CPU; persist them anyway
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from jax._src import monitoring
    events = []
    monitoring.register_event_listener(lambda event, **kw: events.append(event))

    import numpy as np
    from taxtk.ops.myers_batch import batched_edit_distance_myers

    rng = np.random.RandomState(0)
    a = rng.randint(0, 4, (8, 96)).astype(np.uint8)
    b = rng.randint(0, 4, (8, 96)).astype(np.uint8)
    L = np.full(8, 96, np.int32)
    d = batched_edit_distance_myers(a, b, L, L)
    print(json.dumps({
        "hit": "/jax/compilation_cache/cache_hits" in events,
        "miss": "/jax/compilation_cache/cache_misses" in events,
        "checksum": int(np.asarray(d).sum()),
    }))
    """
)


def _run(cache_dir):
    env = {**os.environ, "TAXTK_JAX_CACHE": str(cache_dir),
           "JAX_PLATFORMS": "cpu"}
    # this test is CPU-only: keep the axon sitecustomize from registering
    # the remote TPU backend in the child, whose device-claim handshake can
    # block behind the parent's tunnel session
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", WORKER], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_persistent_cache_hit_across_processes(tmp_path):
    cache = tmp_path / "jaxcache"
    first = _run(cache)
    assert first["miss"] and not first["hit"]
    assert len(os.listdir(cache)) > 0  # executables persisted

    second = _run(cache)
    assert second["hit"], "second process should hit the persistent cache"
    assert second["checksum"] == first["checksum"]
