#!/usr/bin/env python
"""Measure pltpu.roll cost per step in a carried loop: lane-axis rolls of
various counts, sublane-axis rolls, and a no-roll baseline.  Honest
timing: data-dependent launch chains, one np.asarray sync, min of R runs.
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

SUB = int(os.environ.get("PSUB", "256"))
MP = int(os.environ.get("PMP", "256"))
STEPS = int(os.environ.get("PSTEPS", "512"))


def make(which):
    def kernel(x_ref, o_ref, scratch):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, MP), 1)
        scratch[:] = x_ref[:]
        x0 = scratch[:]

        def body(d, carry):
            s, t = carry
            if which == "none":
                a = jnp.where(col == 0, d, s + 1)
            elif which == "roll1":
                a = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
            elif which == "roll2":
                a = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
                a = a + pltpu.roll(t, 1, axis=1)
            elif which == "roll4":
                a = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
                a = a + pltpu.roll(t, 1, axis=1)
                a = jnp.maximum(a, pltpu.roll(s + 1, 1, axis=1))
                a = a + pltpu.roll(t + 1, 1, axis=1)
            elif which == "subroll1":
                a = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=0))
            elif which == "subroll4":
                a = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=0))
                a = a + pltpu.roll(t, 1, axis=0)
                a = jnp.maximum(a, pltpu.roll(s + 1, 1, axis=0))
                a = a + pltpu.roll(t + 1, 1, axis=0)
            elif which == "roll128":
                a = jnp.where(col == 0, d, pltpu.roll(s, 127, axis=1))
            new = jnp.maximum(a, s - 1)
            return (new, jnp.minimum(a, s))

        out = jax.lax.fori_loop(2, STEPS + 1, body, (x0, x0))
        o_ref[:] = out[0] + out[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("which", "tiles"))
def run(x, which, tiles):
    return pl.pallas_call(
        make(which),
        out_shape=jax.ShapeDtypeStruct((tiles * SUB, MP), jnp.int32),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((SUB, MP), lambda p: (p, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, MP), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB, MP), jnp.int32)],
    )(x)


def main():
    tiles = 2
    L = 40
    x = jnp.asarray(np.random.randint(0, 100, (tiles * SUB, MP), np.int32))

    def ch(which, Lc):
        out = x
        for _ in range(Lc):
            out = run(out & 31, which, tiles)
        return out

    for which in ("none", "roll1", "roll2", "roll4", "subroll1", "subroll4",
                  "roll128"):
        np.asarray(ch(which, 2)[0, 0])
        best = 1e9
        for _ in range(3):
            t0 = time.time(); np.asarray(ch(which, 1)[0, 0])
            base = time.time() - t0
            t0 = time.time(); np.asarray(ch(which, L)[0, 0])
            dt = time.time() - t0
            best = min(best, (dt - base) / (L - 1))
        per_step = best / (tiles * (STEPS - 1)) * 1e6
        print(f"{which:9s}: {best*1000:7.2f} ms/launch  "
              f"({per_step:.3f} us/step/tile)", flush=True)


if __name__ == "__main__":
    main()
