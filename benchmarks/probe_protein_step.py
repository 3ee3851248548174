#!/usr/bin/env python
"""Probe: what dominates the protein wavefront step on TPU?

Times stripped kernel variants (results intentionally wrong) to attribute
per-step cost: full v2, no-lane-rolls, rolls-only, sublane-roll layout.
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

SUB, MP1, STEPS = 256, 384, 640


def make_variant(which):
    def kernel(x_ref, o_ref, scratch):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, MP1), 1)
        scratch[:] = x_ref[:]
        x0 = scratch[:]

        def alu(s, sh, s_sh, s_sh2, res, d):
            widx = jax.lax.shift_right_logical(s_sh, 3)
            w = jnp.where(widx == 1, s_sh2, s)
            w = jnp.where(widx == 2, sh, w)
            nib = jnp.bitwise_and(
                jax.lax.shift_right_logical(w, jnp.bitwise_and(s, 7)), 15
            )
            d_val = s_sh + nib
            v_val = s_sh2 - 1
            h_val = s - 1
            best = jnp.maximum(jnp.maximum(d_val, v_val), h_val)
            take_d = d_val == best
            take_h = (~take_d) & (h_val == best)
            new = jnp.where(take_d, best + 1, jnp.where(take_h, s, sh))
            new = jnp.where((col == 0) | (col == d), -d, new)
            return new, jnp.where(d == col, new, res)

        if which in ("full", "norolls", "rolls"):
            def body(d, carry):
                s, sh, res = carry
                if which in ("full", "rolls"):
                    s_sh = jnp.where(col == 0, -99, pltpu.roll(s, 1, axis=1))
                    s_sh2 = jnp.where(col == 0, 0, pltpu.roll(sh, 1, axis=1))
                else:
                    s_sh = s + 1
                    s_sh2 = sh + 2
                if which in ("full", "norolls"):
                    new, res = alu(s, sh, s_sh, s_sh2, res, d)
                else:
                    new = s_sh + s_sh2
                    res = res + new
                return (new, s_sh, res)

            out = jax.lax.fori_loop(1, STEPS, body, (x0, x0, x0))
            o_ref[:] = out[2]
        elif which == "window":
            # full + the sliding-window refill machinery of the real kernel
            def body(d, carry):
                s, sh, res, bx, buf = carry
                k = d - 1
                base = pl.multiple_of((k // 128) * 128, 128)
                window = x_ref[:, pl.ds(base, 128)]
                buf = jnp.where(
                    (k % 128) == 0, window, pltpu.roll(buf, 127, axis=1)
                )
                newval = buf[:, 0:1]
                bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))
                s_sh = jnp.where(col == 0, -99, pltpu.roll(s, 1, axis=1))
                s_sh2 = jnp.where(col == 0, 0, pltpu.roll(sh, 1, axis=1))
                new, res = alu(s + bx, sh, s_sh, s_sh2, res, d)
                return (new, s_sh, res, bx, buf)

            out = jax.lax.fori_loop(
                1, STEPS, body, (x0, x0, x0, x0, x0[:, 0:128])
            )
            o_ref[:] = out[2]
        elif which == "carries8":
            # full + 5 extra passive carries (register-pressure probe)
            def body(d, carry):
                s, sh, res, c4, c5, c6, c7, c8 = carry
                s_sh = jnp.where(col == 0, -99, pltpu.roll(s, 1, axis=1))
                s_sh2 = jnp.where(col == 0, 0, pltpu.roll(sh, 1, axis=1))
                new, res = alu(s, sh, s_sh, s_sh2, res, d)
                c4, c5, c6, c7, c8 = c5, c6, c7, c8, c4 + new
                return (new, s_sh, res, c4, c5, c6, c7, c8)

            out = jax.lax.fori_loop(
                1, STEPS, body, (x0, x0, x0, x0, x0, x0, x0, x0)
            )
            o_ref[:] = out[2] + out[7]

    return kernel


@functools.partial(jax.jit, static_argnames=("which", "tiles"))
def run(x, which, tiles):
    return pl.pallas_call(
        make_variant(which),
        out_shape=jax.ShapeDtypeStruct((tiles * SUB, MP1), jnp.int32),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((SUB, MP1), lambda p: (p, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, MP1), lambda p: (p, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB, MP1), jnp.int32)],
    )(x)


def main():
    tiles = 2
    x = jnp.asarray(np.random.randint(0, 100, (tiles * SUB, MP1), np.int32))
    for which in ("full", "norolls", "rolls", "window", "carries8"):
        out = jax.block_until_ready(run(x, which, tiles))
        t0 = time.time()
        for _ in range(5):
            out = jax.block_until_ready(run(x, which, tiles))
        dt = (time.time() - t0) / 5
        per_step = dt / (tiles * STEPS) * 1e6
        print(f"{which:8s}: {dt*1000:7.1f} ms  ({per_step:.2f} us/step)", flush=True)


if __name__ == "__main__":
    main()
