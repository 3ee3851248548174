#!/usr/bin/env python
"""Sustained-throughput sanity: does GCUPS stay flat as rounds grow (real
compute scales linearly) and what does it cost with H2D staging included?
Validates the bench.py v2 protocol."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from probe_memoization import stage
from taxtk.ops import pallas_myers as pm


def main():
    B, L, S = 8192, 2048, 4
    sets = [stage(B, L, seed) for seed in range(S)]
    statics = sets[0][1]
    cells = sets[0][2]
    run = lambda args: pm._call(*args, *statics)
    warm_args, _, _ = stage(B, L, 999)
    for _ in range(4):
        _ = float(jnp.asarray(run(warm_args)).sum())

    for R in (8, 16, 32, 64):
        for rep in range(3):
            t0 = time.time()
            outs = [run(sets[i % S][0]) for i in range(R)]
            _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
            dt = time.time() - t0
            print(
                f"R={R:3d} rep{rep}: {dt:7.3f}s = {R*cells/dt/1e9:8.1f} GCUPS",
                flush=True,
            )

    # H2D-inclusive: restage one set from host each round
    host_sets = []
    for seed in range(S):
        d_args, _, _ = stage(B, L, 100 + seed)
        host_sets.append([np.asarray(x) for x in d_args])
    for rep in range(3):
        R = 8
        t0 = time.time()
        outs = [
            run([jnp.asarray(x) for x in host_sets[i % S]]) for i in range(R)
        ]
        _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = time.time() - t0
        print(
            f"h2d R={R} rep{rep}: {dt:7.3f}s = {R*cells/dt/1e9:8.1f} GCUPS",
            flush=True,
        )


if __name__ == "__main__":
    main()
