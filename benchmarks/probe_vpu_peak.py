#!/usr/bin/env python
"""Empirical VPU int32 issue-rate ceiling for the Myers roofline.

The analytic model (8x128 lanes x 4 ALUs x 0.94 GHz = 3.85e12 int32
op/s) was EXCEEDED by the unrolled production kernel (4.3e3 GCUPS at
~1.03 ops/cell = 4.4e12 op/s), so the model under-counts the hardware.
This probe measures the sustained rate directly: S independent
dependency-free streams of the kernel's own op mix (and/or/xor/add/
shift/compare-free), each a [8, 128] u32 register, T trips per grid
step.  The best rate over stream counts is the empirical speed of light
the bench divides by.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
OPS_PER_STREAM_TRIP = 8  # ops applied to each stream per loop trip


def _make_kernel(S, T):
    def kernel(x_ref, o_ref):
        base = [x_ref[s] for s in range(S)]

        def step(i, regs):
            out = []
            iv = i.astype(jnp.uint32)
            for s, r in enumerate(regs):
                # the Myers op mix: and/or/xor/add/shl/shr, data-dependent
                # so nothing folds; each line = 1 VPU op, 8 per trip
                r = r ^ (r << 1)
                r = r | (r >> 3)
                r = r + jnp.uint32(s + 1)
                r = r & (r >> 1)
                r = r ^ jnp.uint32(0x9E3779B9)
                r = r + (r << 2)
                r = r | jnp.uint32(1) + iv
                r = r ^ (r >> 5)
                out.append(r)
            return out

        regs = jax.lax.fori_loop(0, T, step, base)
        for s in range(S):
            o_ref[s] = regs[s]

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "T", "G"))
def _call(x, S, T, G):
    kernel = _make_kernel(S, T)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, SUB, LANE), jnp.uint32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((S, SUB, LANE), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((S, SUB, LANE), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def main():
    rng = np.random.RandomState(0)
    T, G = 4096, 64
    best = 0.0
    for S in (4, 8, 16, 32):
        x = jnp.asarray(
            rng.randint(0, 2**32, (S, SUB, LANE), dtype=np.uint64).astype(
                np.uint32
            )
        )
        _ = float(jnp.asarray(_call(x, S, T, G)).ravel()[0])  # warm
        rate = 0.0
        for _rep in range(4):
            t0 = time.time()
            out = _call(x, S, T, G)
            _ = float(jnp.asarray(out).ravel()[0])
            dt = time.time() - t0
            ops = float(S) * OPS_PER_STREAM_TRIP * T * G * SUB * LANE
            rate = max(rate, ops / dt)
        print(f"S={S:3d}: {rate/1e12:6.2f} Tops/s (u32 lane-ops)")
        best = max(best, rate)
    print(f"best sustained: {best/1e12:.2f} Tops/s "
          f"-> Myers SOL ~{best/1.03/1e9/32*32:.0f} GCUPS at 1.03 ops/cell")


if __name__ == "__main__":
    main()
