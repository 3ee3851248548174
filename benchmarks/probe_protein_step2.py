#!/usr/bin/env python
"""Honest per-step attribution for the protein wavefront kernel.

probe_protein_step.py timed with block_until_ready, which does NOT
synchronize on the axon backend — its numbers were dispatch times.  This
probe chains data-dependent launches and syncs once via np.asarray.

Variants (results intentionally wrong):
  minimal : 2 carries, 1 roll, 3 adds + max      (the step floor)
  rolls4  : minimal + 3 more lane rotates
  alu     : rolls4 + profile extract (variable shift) + tie logic
  window  : alu + sliding-window refill machinery
  full    : the real v4 kernel body
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


def make_variant(which):
    def kernel(x_ref, o_ref, scratch):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, MP), 1)
        scratch[:] = x_ref[:, :MP]
        x0 = scratch[:]

        def body(d, carry):
            s, sh, bx, buf = carry
            if which in ("window", "full"):
                k = d - 2
                base = pl.multiple_of((k // 128) * 128, 128)
                window = x_ref[:, pl.ds(base, 128)]
                buf = jnp.where((k % 128) == 0, window,
                                pltpu.roll(buf, 127, axis=1))
                newval = buf[:, 0:1]
                bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))
            s_sh = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
            if which == "minimal":
                new = jnp.maximum(s_sh + 1, s - 1)
                return (new, s_sh, bx, buf)
            sh_sh = jnp.where(col == 0, 0, pltpu.roll(sh, 1, axis=1))
            bx2 = pltpu.roll(bx, 1, axis=1)
            if which == "rolls4":
                b2 = pltpu.roll(buf, 127, axis=1)
                new = jnp.maximum(jnp.maximum(s_sh + 1, sh_sh - 1), s + bx2[:, :1])
                return (new, s_sh, bx, jnp.where((d % 2) == 0, b2, buf))
            # alu / window / full: profile extract + tie logic
            widx = jax.lax.shift_right_logical(bx, 3)
            w = jnp.where(widx == 1, s, x0)
            w = jnp.where(widx == 2, sh, w)
            w = jnp.where(widx == 3, s_sh, w)
            nshift = jax.lax.shift_left(jnp.bitwise_and(bx, 7), 2)
            nib = jnp.bitwise_and(jax.lax.shift_right_logical(w, nshift), 15)
            sub = jnp.where(bx < 27, nib - 4, -99)
            is_match = ((x0 == bx) & (bx < 27)).astype(jnp.int32)
            d_val = sh_sh + sub
            v_val = s_sh - 1
            h_val = s - 1
            best = jnp.maximum(jnp.maximum(d_val, v_val), h_val)
            take_d = d_val == best
            take_h = (~take_d) & (h_val == best)
            new_madc = jnp.where(take_d, sh + is_match,
                                 jnp.where(take_h, s, s_sh))
            new = jnp.where(col == (d - 1), -d, best + new_madc * 0)
            if which == "full":
                live = d <= x0
                new = jnp.where(live, new, s)
            return (new, s_sh, bx, buf)

        init = (x0, x0, x0, x0[:, 0:128])
        out = jax.lax.fori_loop(2, STEPS + 1, body, init)
        o_ref[:] = out[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("which", "tiles"))
def run(x, which, tiles):
    return pl.pallas_call(
        make_variant(which),
        out_shape=jax.ShapeDtypeStruct((tiles * SUB, MP), jnp.int32),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((SUB, 2 * MP), lambda p: (p, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, MP), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB, MP), jnp.int32)],
    )(x)


def chain(x, which, tiles, L):
    out = x[:, :MP]
    for _ in range(L):
        y = run(jnp.concatenate([out & 31, x[:, MP:]], axis=1), which, tiles)
        out = y
    return out


def main():
    tiles = 2
    L = 20
    x = jnp.asarray(np.random.randint(0, 100, (tiles * SUB, 2 * MP), np.int32))
    for which in ("minimal", "rolls4", "alu", "window", "full"):
        np.asarray(chain(x, which, tiles, 2)[0, 0])  # compile+warm
        t0 = time.time()
        np.asarray(chain(x, which, tiles, 1)[0, 0])
        base = time.time() - t0
        t0 = time.time()
        np.asarray(chain(x, which, tiles, L)[0, 0])
        dt = time.time() - t0
        per_launch = (dt - base) / (L - 1)
        per_step = per_launch / (tiles * (STEPS - 1)) * 1e6
        print(f"{which:8s}: {per_launch*1000:7.2f} ms/launch  "
              f"({per_step:.3f} us/step/tile)", flush=True)


if __name__ == "__main__":
    main()

# --- appended: latency-vs-throughput variants -------------------------------


def make_variant2(which):
    def kernel(x_ref, o_ref, scratch):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, MP), 1)
        scratch[:] = x_ref[:, :MP]
        x0 = scratch[:]

        if which == "dual":
            # two independent 5-op chains interleaved: if the single chain is
            # latency-bound, this runs in the same wall time (2x throughput)
            def body(d, carry):
                s, sh, t, th = carry
                s_sh = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
                t_sh = jnp.where(col == 0, d, pltpu.roll(t, 1, axis=1))
                return (jnp.maximum(s_sh + 1, s - 1), s_sh,
                        jnp.maximum(t_sh + 1, t - 1), t_sh)

            out = jax.lax.fori_loop(2, STEPS + 1, body, (x0, x0, x0 + 1, x0))
            o_ref[:] = out[0] + out[2]
        elif which == "ops10":
            # 10-op single chain: latency-bound => ~2x minimal; else flat
            def body(d, carry):
                s, sh = carry
                s_sh = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
                a = s_sh + 1
                b = s - 1
                c = jnp.maximum(a, b)
                e = c + 2
                f = jnp.maximum(e, a)
                g = f - 3
                h = jnp.maximum(g, c)
                return (h, s_sh)

            out = jax.lax.fori_loop(2, STEPS + 1, body, (x0, x0))
            o_ref[:] = out[0]
        elif which == "noroll":
            # minimal without the lane rotate
            def body(d, carry):
                s, sh = carry
                s_sh = jnp.where(col == 0, d, s + sh)
                return (jnp.maximum(s_sh + 1, s - 1), s_sh)

            out = jax.lax.fori_loop(2, STEPS + 1, body, (x0, x0))
            o_ref[:] = out[0]
        elif which == "step2":
            # two DP steps fused per loop iteration (same total step count)
            def body(d, carry):
                s, sh = carry
                for dd in (2 * d, 2 * d + 1):
                    s_sh = jnp.where(col == 0, dd, pltpu.roll(s, 1, axis=1))
                    s, sh = jnp.maximum(s_sh + 1, s - 1), s_sh
                return (s, sh)

            out = jax.lax.fori_loop(1, STEPS // 2 + 1, body, (x0, x0))
            o_ref[:] = out[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("which", "tiles"))
def run2(x, which, tiles):
    return pl.pallas_call(
        make_variant2(which),
        out_shape=jax.ShapeDtypeStruct((tiles * SUB, MP), jnp.int32),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((SUB, 2 * MP), lambda p: (p, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, MP), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUB, MP), jnp.int32)],
    )(x)


def main2():
    tiles = 2
    L = 20
    x = jnp.asarray(np.random.randint(0, 100, (tiles * SUB, 2 * MP), np.int32))
    for which in ("dual", "ops10", "noroll", "step2"):
        def ch(Lc):
            out = x[:, :MP]
            for _ in range(Lc):
                out = run2(jnp.concatenate([out & 31, x[:, MP:]], axis=1),
                           which, tiles)
            return out
        np.asarray(ch(2)[0, 0])
        t0 = time.time(); np.asarray(ch(1)[0, 0]); base = time.time() - t0
        t0 = time.time(); np.asarray(ch(L)[0, 0]); dt = time.time() - t0
        per_launch = (dt - base) / (L - 1)
        per_step = per_launch / (tiles * (STEPS - 1)) * 1e6
        print(f"{which:8s}: {per_launch*1000:7.2f} ms/launch  "
              f"({per_step:.3f} us/step/tile)", flush=True)


if __name__ == "__main__" and os.environ.get("PART2"):
    main2()
