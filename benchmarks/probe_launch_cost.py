#!/usr/bin/env python
"""Separate fixed dispatch/sync cost from true per-launch kernel time on
the axon remote backend: time R chained launches with ONE tiny forced
readback, for R in {1, 5, 20}; the slope is the real per-launch cost."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from taxtk.ops import pallas_protein as pp
from bench_protein import make_pairs


def main():
    B, M, N = 512, 256, 256
    a, b, al, bl = make_pairs(B, M, N)
    SUB = 256
    Mp1 = pp._round_up(M + 1, pp.LANE)
    Npad = pp._round_up(max(N, 1), pp.LANE)
    steps = Mp1 + Npad
    fwd_w = pp._round_up(steps, 128)
    n_tiles = max(1, -(-B // SUB))
    Bp = n_tiles * SUB
    prof_g = np.zeros((pp._NWORDS, Bp, Mp1), np.int32)
    prof_g[:, :B, 1:M + 1] = pp._PACKED[:, np.minimum(a, pp._AA_N - 1)]
    acode = np.full((Bp, Mp1), 255, np.int32)
    acode[:B, 1:M + 1] = a
    fwd = np.full((Bp, fwd_w), 255, np.int32)
    fwd[:B, :N] = b
    tgt = np.ones((Bp, Mp1), np.int32)
    tgt[:B] = (al + bl)[:, None]
    dev = [jnp.asarray(v) for v in (prof_g, acode, fwd, tgt)]

    @jax.jit
    def chained(p_, a_, f_, t_, r):
        # r is a traced scalar mixed into the input so each launch differs
        s, madc = pp._raw_call(
            p_ + r * 0, a_, f_, t_, SUB, Mp1, steps, fwd_w, n_tiles
        )
        return jnp.sum(s) + jnp.sum(madc)

    # warm
    float(chained(*dev, jnp.int32(0)))
    cells = int(al.astype(np.int64) @ bl.astype(np.int64))

    for R in (1, 2, 5, 10, 25, 50, 100):
        t0 = time.time()
        acc = []
        for i in range(R):
            acc.append(chained(*dev, jnp.int32(i)))
        total = float(jnp.stack(acc).sum())  # one tiny D2H forces all
        dt = time.time() - t0
        print(f"R={R:3d}: {dt*1000:8.1f} ms total, {dt/R*1000:7.1f} ms/launch, "
              f"{cells*R/dt/1e9:6.2f} GCUPS  (chk {total})", flush=True)


if __name__ == "__main__":
    main()
