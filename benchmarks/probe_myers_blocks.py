#!/usr/bin/env python
"""Chunked-Myers block-size sweep: per-cell cost vs block_words.  If
smaller blocks are disproportionately faster, the K-word unroll is
spilling registers (same cliff the protein kernel hit)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers_long


def main():
    rng = np.random.RandomState(0)
    B, M, N = 256, 12288, 16384  # 2-3 pattern blocks at Kb=128
    a = rng.randint(0, 4, (B, M)).astype(np.uint8)
    b = rng.randint(0, 4, (B, N)).astype(np.uint8)
    al = np.full(B, M, np.int32)
    bl = np.full(B, N, np.int32)
    cells = float(B) * M * N

    for bw in (128, 64, 32):
        f = lambda: batched_edit_distance_pallas_myers_long(
            a, b, al, bl, block_words=bw, lazy="device"
        )
        dev, post = f()
        _ = float(jnp.sum(dev))  # warm + flush
        t0 = time.time()
        outs = [f()[0] for _ in range(3)]
        _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = (time.time() - t0) / 3
        print(f"block_words={bw:4d}: {dt*1000:8.1f} ms = {cells/dt/1e9:7.1f} GCUPS",
              flush=True)


if __name__ == "__main__":
    main()
