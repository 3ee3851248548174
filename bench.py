#!/usr/bin/env python
"""Driver benchmark: RPA DNA alignment throughput on the accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured quantity is the hot-path kernel of the whole framework — exact
batched global edit distance (the RPA realignment kernel) — in giga DP-cell
updates per second (GCUPS) on one chip, at a production-shaped workload
(thousands of pairs, ~0.5-1 kbp segments).

vs_baseline compares against the reference implementation's algorithm on
the host CPU: our native single-thread Myers bit-vector (taxtk/native),
the same published algorithm SeqAn's MyersBitVector implements
(reference: taxonpredictionmodelsequence.hh:133-171), measured on the same
workload on this machine.  The reference publishes no absolute numbers
(BASELINE.md), so the self-measured CPU baseline is the comparison point.
"""

import json
import sys
import time

import numpy as np


def measure_device(a, b, al, bl, cells):
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        from taxtk.ops.myers_batch import batched_edit_distance_myers as fn

        kwargs = {}
    else:
        from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers as fn

        kwargs = dict(sub_tile=64, text_chunk=512)

    result = fn(a, b, al, bl, **kwargs)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.time()
        result = fn(a, b, al, bl, **kwargs)
        times.append(time.time() - t0)
    return cells / min(times) / 1e9, result, platform


def measure_cpu_baseline(a, b, al, bl, cells, budget_pairs=512):
    """Single-thread native Myers on a subsample, scaled to GCUPS."""
    from taxtk.native import myers_batch, load

    if load() is None:
        return None, None
    n = min(budget_pairs, len(al))
    pairs = [(a[i, : al[i]], b[i, : bl[i]]) for i in range(n)]
    sub_cells = int(sum(int(al[i]) * int(bl[i]) for i in range(n)))
    t0 = time.time()
    out = myers_batch(pairs)
    dt = time.time() - t0
    return sub_cells / dt / 1e9, out


def main():
    B, L = 8192, 512
    rng = np.random.RandomState(0)
    a = rng.randint(0, 4, (B, L)).astype(np.uint8)
    b = rng.randint(0, 4, (B, L)).astype(np.uint8)
    al = np.full(B, L, np.int32)
    bl = np.full(B, L, np.int32)
    cells = float(B) * L * L

    device_gcups, device_result, platform = measure_device(a, b, al, bl, cells)

    cpu_gcups, cpu_result = measure_cpu_baseline(a, b, al, bl, cells)
    vs_baseline = device_gcups / cpu_gcups if cpu_gcups else 0.0

    # cross-check correctness between device kernel and native baseline
    if cpu_result is not None:
        n = len(cpu_result)
        assert (np.asarray(device_result[:n]) == cpu_result).all(), "kernel mismatch"

    print(
        json.dumps(
            {
                "metric": f"rpa_dna_alignment_throughput_{platform}",
                "value": round(device_gcups, 2),
                "unit": "GCUPS/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
