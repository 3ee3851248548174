#!/usr/bin/env python
"""Is the single-launch Myers kernel spilling at large K?  Compare it
against the chunked kernel (Kb=64) on the same 6kbp-pattern workload."""

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


def main():
    rng = np.random.RandomState(0)
    B, M, N = 512, 6100, 8192  # K=191 -> quantized 192 single-launch
    a = rng.randint(0, 4, (B, M)).astype(np.uint8)
    b = rng.randint(0, 4, (B, N)).astype(np.uint8)
    al = np.full(B, M, np.int32)
    bl = np.full(B, N, np.int32)
    cells = float(B) * M * N

    variants = [
        ("single K=192", lambda: batched_edit_distance_pallas_myers(
            a, b, al, bl, lazy="device")),
        ("chunked Kb=64", lambda: batched_edit_distance_pallas_myers_long(
            a, b, al, bl, block_words=64, lazy="device")),
    ]
    ref = None
    for name, f in variants:
        dev, post = f()
        out = post(np.asarray(dev))  # warm + flush + correctness
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref, out), "kernel disagreement"
        t0 = time.time()
        outs = [f()[0] for _ in range(3)]
        _ = float(jnp.stack([jnp.sum(jnp.asarray(o)) for o in outs]).sum())
        dt = (time.time() - t0) / 3
        print(f"{name:16s}: {dt*1000:8.1f} ms = {cells/dt/1e9:7.1f} GCUPS",
              flush=True)


if __name__ == "__main__":
    main()
