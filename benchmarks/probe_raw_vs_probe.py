#!/usr/bin/env python
"""Interleaved timing of pp._raw_call vs the ablation probe's identical
kernel, same inputs, same process; checks output equality."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from taxtk.ops import pallas_protein as pp
from bench_protein import make_pairs
import probe_protein_ablate as pa


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
    jax.block_until_ready(dev)

    real = jax.jit(
        lambda p_, a_, f_, t_: pp._raw_call(
            p_, a_, f_, t_, SUB, Mp1, steps, fwd_w, n_tiles
        )
    )
    probe = lambda: pa.run(*dev, SUB, Mp1, steps, fwd_w, n_tiles, ())

    r1 = jax.block_until_ready(real(*dev))
    r2 = jax.block_until_ready(probe())
    print("s equal:", np.array_equal(np.asarray(r1[0]), np.asarray(r2[0])))
    print("madc equal:", np.array_equal(np.asarray(r1[1]), np.asarray(r2[1])))

    for name, fn in [("real", lambda: real(*dev)), ("probe", probe)] * 2:
        t0 = time.time()
        for _ in range(5):
            out = jax.block_until_ready(fn())
        print(f"{name}: {(time.time()-t0)/5*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
