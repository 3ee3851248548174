#!/usr/bin/env python
"""Where does the e2e 'device' tick go?  Wraps the two pallas entry points
with wall-time + byte accounting (host pack, jnp ship, kernel dispatch) and
runs the bench_e2e workload once warm.

The e2e engine extracts ~300 GCUPS effective vs the kernel's ~2500; the
device tick (1.0-1.1 s at 300 contigs) is the gap.  This probe splits it.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

ACC = {"calls": 0, "rows": 0, "ship_bytes": 0, "ship_s": 0.0}


def _instrument():
    import jax.numpy as jnp
    from taxtk.ops import pallas_myers as pm

    orig_asarray = jnp.asarray

    def timed_asarray(x, *a, **kw):
        t0 = time.time()
        out = orig_asarray(x, *a, **kw)
        if hasattr(x, "nbytes"):
            ACC["ship_bytes"] += x.nbytes
        ACC["ship_s"] += time.time() - t0
        return out

    pm.jnp.asarray = timed_asarray
    return pm


def main():
    import tempfile

    import bench_e2e
    from taxtk.constants import DEFAULT_RANKS

    pm = _instrument()

    with tempfile.TemporaryDirectory() as d:
        paths = bench_e2e.make_workload(d, 300)
        # warm-up (compile) then measured
        bench_e2e.run_once(paths, list(DEFAULT_RANKS), None)
        for k in ACC:
            ACC[k] = 0 if isinstance(ACC[k], int) else 0.0
        t0 = time.time()
        r = bench_e2e.run_once(paths, list(DEFAULT_RANKS), None)
        wall = time.time() - t0
    print("engine_s", round(r["engine_s"], 3), "wall", round(wall, 3))
    print("aligner ticks:", {k: round(v, 3) for k, v in r["aligner"].items()})
    print("metrics:", {k: round(v, 3) for k, v in r["metrics"].items()})
    print(
        "jnp.asarray ships:",
        ACC["ship_bytes"] / 1e6,
        "MB in",
        round(ACC["ship_s"], 3),
        "s ->",
        round(ACC["ship_bytes"] / 1e6 / max(ACC["ship_s"], 1e-9), 1),
        "MB/s",
    )
    print("pairs", r["pairs"], "cells", f"{r['cells']:.3e}",
          "eff GCUPS", round(r["cells"] / r["engine_s"] / 1e9, 1))


if __name__ == "__main__":
    main()
