#!/usr/bin/env python
"""Round-4 probe: where do the config-4 surrogate's device seconds go?

BENCH r4 run 1: the 350-contig 1-100 kbp surrogate spent 10.9 s in
device_wait for 8.24e12 DP cells — an effective ~630 GCUPS/chip against
the canonical kernel's 4,123 the same session.  Candidate explanations:
  (a) the pattern-block-chunked long kernel is slower per cell,
  (b) per-bucket launch/sync overheads (the engine runs many bucket
      classes per round; each finish is a tunnel round trip),
  (c) queueing behind the macro-batch structure.

This probe measures (a) directly: chained one-sync GCUPS of
batched_edit_distance_pallas_myers_long at the surrogate's dominant
shapes, and the canonical single-launch kernel as the same-session
reference point.  If the long kernel sustains ~canonical rate, the gap
is (b)/(c) — launch structure, not kernel.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from taxtk.ops.pallas_myers import (
    batched_edit_distance_pallas_myers,
    batched_edit_distance_pallas_myers_long,
)


def time_shape(name, fn, B, L, reps=5, chain=4):
    rng = np.random.RandomState(0)
    a = rng.randint(0, 4, (B, L)).astype(np.uint8)
    b = rng.randint(0, 4, (B, L)).astype(np.uint8)
    al = np.full(B, L, np.int32)
    bl = np.full(B, L, np.int32)
    fin = fn(a, b, al, bl, lazy=True)
    fin()  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        fins = [fn(a, b, al, bl, lazy=True) for _ in range(chain)]
        for f in fins:
            f()
        times.append((time.time() - t0) / chain)
    times.sort()
    med = times[len(times) // 2]
    cells = float(B) * L * L
    return {
        "shape": name,
        "ms_per_launch": round(med * 1e3, 1),
        "gcups": round(cells / med / 1e9, 1),
    }


def main():
    out = []
    # canonical single-launch reference point (engine's short-bucket path)
    out.append(time_shape(
        "canonical 8192x2048", batched_edit_distance_pallas_myers,
        8192, 2048))
    # the surrogate's long-bucket ladder
    for B, L in ((256, 12288), (64, 25000), (16, 50000), (4, 98000)):
        out.append(time_shape(
            f"long {B}x{L}", batched_edit_distance_pallas_myers_long,
            B, L, chain=2))
    print(json.dumps(out, indent=1))


if __name__ == "__main__" and "--systolic" not in sys.argv:
    main()


def main_systolic():
    """Systolic-vs-chunked at the small-B long shapes (run with
    --systolic); plus a correctness cross-check per shape."""
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )

    out = []
    for B, L in ((256, 12288), (64, 25000), (16, 50000), (4, 98000)):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 4, (B, L)).astype(np.uint8)
        b = rng.randint(0, 4, (B, L)).astype(np.uint8)
        al = np.full(B, L, np.int32)
        bl = np.full(B, L, np.int32)
        fn = lambda *args, lazy=False: batched_edit_distance_systolic(
            *args, lazy=lazy)
        r = time_shape(f"systolic {B}x{L}", fn, B, L, chain=2)
        got = batched_edit_distance_systolic(a, b, al, bl)
        exp = [oracle.edit_distance(a[i], b[i]) for i in range(min(B, 3))]
        r["parity"] = bool(all(int(got[i]) == exp[i]
                               for i in range(len(exp))))
        out.append(r)
        print(json.dumps(r))
    print(json.dumps(out, indent=1))


if __name__ == "__main__" and "--systolic" in sys.argv:
    main_systolic()
    sys.exit(0)
