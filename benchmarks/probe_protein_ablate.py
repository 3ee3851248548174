#!/usr/bin/env python
"""Ablation bisect of the REAL pallas protein kernel: which feature costs
26ms/launch?  Each variant is the production kernel with one piece removed
(results intentionally wrong for ablated variants)."""

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

from taxtk.ops import pallas_protein as pp
from bench_protein import make_pairs

_NEG = pp._NEG
_AA_N = pp._AA_N
_BIAS = pp._BIAS
_NWORDS = pp._NWORDS
_DC_ONE = pp._DC_ONE
GAP = -1


def make_kernel(SUB, Mp1, steps, ablate):
    no_window = "window" in ablate
    no_extract = "extract" in ablate
    no_harvest = "harvest" in ablate
    no_rolls = "rolls" in ablate
    no_edge = "edge" in ablate

    def kernel(prof_ref, acode_ref, fwd_ref, tgt_ref, s_out, madc_out,
               i0_ref, i1_ref, i2_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, Mp1), 1)
        target_d = tgt_ref[:]

        def shift_right(x, fill):
            if no_rolls:
                return x + fill
            r = pltpu.roll(x, 1, axis=1)
            return jnp.where(col == 0, fill, r)

        i0_ref[:] = jnp.where(col == 0, 0, _NEG)
        i1_ref[:] = jnp.zeros((SUB, Mp1), jnp.int32)
        i2_ref[:] = jnp.int32(GAP) * target_d
        s0 = i0_ref[:]
        zero = i1_ref[:]
        res_s0 = i2_ref[:]
        acode = acode_ref[:]
        pw = [prof_ref[w] for w in range(_NWORDS)]

        def body(d, carry):
            (s_prev, madc_prev, sh_s, sh_madc,
             res_s, res_madc, bx, buf) = carry
            k = d - 1
            if no_window:
                bx = jnp.where(col == 0, acode[:, 0:1], bx)
            else:
                base = pl.multiple_of((k // 128) * 128, 128)
                window = fwd_ref[:, pl.ds(base, 128)]
                buf = jnp.where((k % 128) == 0, window,
                                pltpu.roll(buf, 127, axis=1))
                newval = buf[:, 0:1]
                bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))

            if no_extract:
                sub = bx
                is_match = (acode == bx).astype(jnp.int32)
            else:
                widx = jax.lax.shift_right_logical(bx, 3)
                word = jnp.where(widx == 1, pw[1], pw[0])
                word = jnp.where(widx == 2, pw[2], word)
                word = jnp.where(widx == 3, pw[3], word)
                nshift = jax.lax.shift_left(jnp.bitwise_and(bx, 7), 2)
                nib = jnp.bitwise_and(
                    jax.lax.shift_right_logical(word, nshift), 15)
                valid = bx < _AA_N
                sub = jnp.where(valid, nib - _BIAS, _NEG)
                is_match = ((acode == bx) & valid).astype(jnp.int32)

            s_pp_s = sh_s
            madc_pp_s = sh_madc
            s_prev_s = shift_right(s_prev, _NEG)
            madc_prev_s = shift_right(madc_prev, 0)

            d_val = s_pp_s + sub
            v_val = s_prev_s + GAP
            h_val = s_prev + GAP
            best = jnp.maximum(jnp.maximum(d_val, v_val), h_val)
            take_d = d_val == best
            take_h = (~take_d) & (h_val == best)

            new_s = best
            new_madc = jnp.where(
                take_d, madc_pp_s + is_match + _DC_ONE,
                jnp.where(take_h, madc_prev, madc_prev_s))

            if not no_edge:
                on_edge = (col == 0) | (col == d)
                new_s = jnp.where(on_edge, GAP * d, new_s)
                new_madc = jnp.where(on_edge, 0, new_madc)

            if no_harvest:
                res_s = res_s + new_s
                res_madc = res_madc + new_madc
            else:
                done = d == target_d
                res_s = jnp.where(done, new_s, res_s)
                res_madc = jnp.where(done, new_madc, res_madc)
            return (new_s, new_madc, s_prev_s, madc_prev_s,
                    res_s, res_madc, bx, buf)

        init = (s0, zero, zero, zero, res_s0, zero,
                zero + 255, zero[:, 0:128] + 255)
        out = jax.lax.fori_loop(1, steps, body, init)
        s_out[:] = out[4]
        madc_out[:] = out[5]

    return kernel


@functools.partial(jax.jit, static_argnames=("SUB", "Mp1", "steps", "fwd_w",
                                             "n_tiles", "ablate"))
def run(prof, acode, fwd, tgt, SUB, Mp1, steps, fwd_w, n_tiles, ablate):
    kernel = make_kernel(SUB, Mp1, steps, ablate)
    shape = jax.ShapeDtypeStruct((n_tiles * SUB, Mp1), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_NWORDS, SUB, Mp1), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, fwd_w), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, Mp1), jnp.int32),
            pltpu.VMEM((SUB, Mp1), jnp.int32),
            pltpu.VMEM((SUB, Mp1), jnp.int32),
        ],
    )(prof, acode, fwd, tgt)


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
    prof_g = np.zeros((_NWORDS, Bp, Mp1), np.int32)
    prof_g[:, :B, 1:M + 1] = pp._PACKED[:, np.minimum(a, _AA_N - 1)]
    acode = np.full((Bp, Mp1), 255, np.int32)
    acode[:B, 1:M + 1] = a
    fwd = np.full((Bp, fwd_w), 255, np.int32)
    fwd[:B, :N] = b
    tgt = np.ones((Bp, Mp1), np.int32)
    tgt[:B] = (al + bl)[:, None]
    dev = [jnp.asarray(v) for v in (prof_g, acode, fwd, tgt)]
    jax.block_until_ready(dev)

    variants = [
        (),
        ("window",),
        ("extract",),
        ("harvest",),
        ("rolls",),
        ("edge",),
        ("window", "extract"),
        ("window", "rolls"),
        ("window", "extract", "rolls", "edge", "harvest"),
    ]
    R = 10
    for ab in variants:
        f = lambda: run(*dev, SUB, Mp1, steps, fwd_w, n_tiles, ab)
        s, m = f()
        _ = float(jnp.sum(s) + jnp.sum(m))  # warm + flush
        t0 = time.time()
        outs = [f() for _ in range(R)]
        _ = float(jnp.stack([jnp.sum(o[0]) for o in outs]).sum())
        dt = (time.time() - t0) / R
        name = "+".join(ab) if ab else "FULL"
        print(f"{name:40s}: {dt*1000:7.1f} ms/launch", flush=True)


if __name__ == "__main__":
    main()
