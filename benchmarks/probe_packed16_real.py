#!/usr/bin/env python
"""Round-5 probe: REALISTIC SWAR 2x16 protein wavefront mix.

probe_packed16.py measured the core DP mix at 2.16x per pair — but it
omitted the two port blockers the STATUS notes called out: the per-half
variable-shift profile extraction (the 4-bit packed profile lookup needs
each half's own word-select + variable shift, so it does NOT halve) and
the packed stats (dc<<16|match per pair cannot share a half; the port
needs TWO packed stat carries: match16x2 + dc16x2).

This probe times the FULL per-step op mix of the v5 kernel
(ops/pallas_protein.py _make_kernel) against its SWAR 2x16 equivalent,
including: window refill + bx roll, per-half profile extraction,
is_match, boundary fills, core DP with emulated packed max/select,
split packed stat carries, text-boundary write and per-half freeze.
Decision gate (VERDICT round-5 item 1): port the kernel only if this
measures a real per-pair win.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_LO = 0x0000FFFF
MASK_HI = -65536  # 0xFFFF0000
GAP = -1
BIAS = 600  # score bias so biased halves stay in [0, 2^14)


def make_single(SUB, LANES, STEPS):
    """The v5 kernel's actual per-step mix, one pair per int32 lane."""

    def kernel(p0_ref, p1_ref, p2_ref, p3_ref, acode_ref, fwd_ref, tgt_ref,
               s_out, madc_out):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        acode = acode_ref[:]
        target_d = tgt_ref[:]
        pw = [p0_ref[:], p1_ref[:], p2_ref[:], p3_ref[:]]

        def body(d, carry):
            (s_prev, madc_prev, sh_s, sh_madc, bx, buf) = carry
            k = d - 2
            base = pl.multiple_of((k // 128) * 128, 128)
            window = fwd_ref[:, pl.ds(base, 128)]
            buf = jnp.where((k % 128) == 0, window,
                            pltpu.roll(buf, 127, axis=1))
            newval = buf[:, 0:1]
            bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))

            widx = jax.lax.shift_right_logical(bx, 3)
            word = jnp.where(widx == 1, pw[1], pw[0])
            word = jnp.where(widx == 2, pw[2], word)
            word = jnp.where(widx == 3, pw[3], word)
            nshift = jax.lax.shift_left(jnp.bitwise_and(bx, 7), 2)
            nib = jnp.bitwise_and(
                jax.lax.shift_right_logical(word, nshift), 15)
            sub = nib - 4
            is_match = (acode == bx).astype(jnp.int32)

            s_prev_s = jnp.where(col == 0, GAP * (d - 1),
                                 pltpu.roll(s_prev, 1, axis=1))
            madc_prev_s = jnp.where(col == 0, 0,
                                    pltpu.roll(madc_prev, 1, axis=1))

            d_val = sh_s + sub
            best = jnp.maximum(d_val, jnp.maximum(s_prev, s_prev_s) + GAP)
            take_d = d_val == best
            take_h = (~take_d) & (s_prev >= s_prev_s)
            new_s = best
            new_madc = jnp.where(
                take_d, sh_madc + is_match + (1 << 16),
                jnp.where(take_h, madc_prev, madc_prev_s))

            on_tb = col == (d - 1)
            new_s = jnp.where(on_tb, GAP * d, new_s)
            new_madc = jnp.where(on_tb, 0, new_madc)
            live = d <= target_d
            new_s = jnp.where(live, new_s, s_prev)
            new_madc = jnp.where(live, new_madc, madc_prev)
            return (new_s, new_madc, s_prev_s, madc_prev_s, bx, buf)

        z = jnp.zeros((SUB, LANES), jnp.int32)
        init = (z + GAP, z, z, z, z + 31, z[:, 0:128] + 31)
        out = jax.lax.fori_loop(2, STEPS, body, init)
        s_out[:] = out[0]
        madc_out[:] = out[1]

    return kernel


def _ge_mask(a, b):
    """Packed per-half (a >= b) masks, biased non-negative halves."""
    d_lo = (a & MASK_LO) - (b & MASK_LO)
    lo_m = jnp.int32(MASK_LO) & ~(d_lo >> 31)
    d_hi = (a >> 16) - (b >> 16)
    hi_m = jnp.int32(MASK_HI) & ~(d_hi >> 31)
    return hi_m | lo_m


def make_swar(SUB, LANES, STEPS):
    """Two pairs per lane: hi/lo 16-bit halves, split packed stat carries,
    per-half profile extraction, per-half freeze."""
    one2 = (1 << 16) | 1
    gap2 = ((-GAP) << 16) | (-GAP)  # subtract per half (python literals:
    #                                 jnp scalars would become captured
    #                                 consts the pallas tracer rejects)

    def pmax(a, b):
        m = _ge_mask(a, b)
        return (a & m) | (b & ~m)

    def psel(m, t, f):
        return (t & m) | (f & ~m)

    def kernel(p0l, p1l, p2l, p3l, p0h, p1h, p2h, p3h, acode_ref, fwd_ref,
               tgt_ref, s_out, ma_out, dc_out):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        acode = acode_ref[:]  # packed: hi char <<16 | lo char
        target2 = tgt_ref[:]  # packed per-half target diagonals
        pwl = [p0l[:], p1l[:], p2l[:], p3l[:]]
        pwh = [p0h[:], p1h[:], p2h[:], p3h[:]]

        def body(d, carry):
            (s_prev, ma_prev, dc_prev, sh_s, sh_ma, sh_dc, bx, buf) = carry
            k = d - 2
            base = pl.multiple_of((k // 128) * 128, 128)
            window = fwd_ref[:, pl.ds(base, 128)]
            buf = jnp.where((k % 128) == 0, window,
                            pltpu.roll(buf, 127, axis=1))
            newval = buf[:, 0:1]
            bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))

            # per-half profile extraction (the port blocker: each half
            # needs its own word select + variable shift)
            bx_lo = bx & MASK_LO
            bx_hi = jax.lax.shift_right_logical(bx, 16)
            wl = jax.lax.shift_right_logical(bx_lo, 3)
            word_l = jnp.where(wl == 1, pwl[1], pwl[0])
            word_l = jnp.where(wl == 2, pwl[2], word_l)
            word_l = jnp.where(wl == 3, pwl[3], word_l)
            nib_l = jnp.bitwise_and(
                jax.lax.shift_right_logical(
                    word_l,
                    jax.lax.shift_left(jnp.bitwise_and(bx_lo, 7), 2)), 15)
            wh = jax.lax.shift_right_logical(bx_hi, 3)
            word_h = jnp.where(wh == 1, pwh[1], pwh[0])
            word_h = jnp.where(wh == 2, pwh[2], word_h)
            word_h = jnp.where(wh == 3, pwh[3], word_h)
            nib_h = jnp.bitwise_and(
                jax.lax.shift_right_logical(
                    word_h,
                    jax.lax.shift_left(jnp.bitwise_and(bx_hi, 7), 2)), 15)
            sub2 = (jax.lax.shift_left(nib_h, 16) | nib_l) - jnp.int32(
                (4 << 16) | 4)

            # per-half match increments (packed 0/1 per half)
            x = acode ^ bx
            m_lo = (x & MASK_LO) == 0
            m_hi = (x & MASK_HI) == 0
            is_match2 = (jnp.where(m_hi, 1 << 16, 0)
                         | jnp.where(m_lo, 1, 0))

            fill_s = (BIAS + GAP * (d - 1)) * 0x10001
            s_prev_s = jnp.where(col == 0, fill_s,
                                 pltpu.roll(s_prev, 1, axis=1))
            ma_prev_s = jnp.where(col == 0, 0,
                                  pltpu.roll(ma_prev, 1, axis=1))
            dc_prev_s = jnp.where(col == 0, 0,
                                  pltpu.roll(dc_prev, 1, axis=1))

            d_val = sh_s + sub2
            best = pmax(d_val, pmax(s_prev, s_prev_s) - gap2)
            # equality per half via xor (cheaper than 2x ge)
            xe = d_val ^ best
            eq_d = (jnp.where((xe & MASK_HI) == 0, MASK_HI, 0)
                    | jnp.where((xe & MASK_LO) == 0, MASK_LO, 0))
            take_h = _ge_mask(s_prev, s_prev_s) & ~eq_d
            new_s = best
            new_ma = psel(eq_d, sh_ma + is_match2,
                          psel(take_h, ma_prev, ma_prev_s))
            new_dc = psel(eq_d, sh_dc + one2,
                          psel(take_h, dc_prev, dc_prev_s))

            on_tb = col == (d - 1)
            tbv = (BIAS + GAP * d) * 0x10001
            new_s = jnp.where(on_tb, tbv, new_s)
            new_ma = jnp.where(on_tb, 0, new_ma)
            new_dc = jnp.where(on_tb, 0, new_dc)

            # per-half freeze: live iff d <= target(half)
            d2 = d * one2
            live = _ge_mask(target2, d2)
            new_s = psel(live, new_s, s_prev)
            new_ma = psel(live, new_ma, ma_prev)
            new_dc = psel(live, new_dc, dc_prev)
            return (new_s, new_ma, new_dc, s_prev_s, ma_prev_s, dc_prev_s,
                    bx, buf)

        z = jnp.zeros((SUB, LANES), jnp.int32)
        init = (z + (BIAS + GAP) * 0x10001, z, z, z + BIAS * 0x10001, z, z,
                z + ((31 << 16) | 31), z[:, 0:128] + ((31 << 16) | 31))
        out = jax.lax.fori_loop(2, STEPS, body, init)
        s_out[:] = out[0]
        ma_out[:] = out[1]
        dc_out[:] = out[2]

    return kernel


def build(kernel, n_in, SUB, LANES, n_out, fwd_w):
    shape = jax.ShapeDtypeStruct((SUB, LANES), jnp.int32)

    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kernel,
            out_shape=tuple([shape] * n_out),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=tuple(
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out),
        )(*args)

    return run


def time_variant(name, run, args, SUB, LANES, STEPS, pairs_per_lane,
                 reps=6, chain=16):
    _ = float(jnp.sum(run(*args)[0]))
    times = []
    for _ in range(reps):
        t0 = time.time()
        outs = [run(*args) for _ in range(chain)]
        _ = float(jnp.stack([jnp.sum(o[0]) for o in outs]).sum())
        times.append((time.time() - t0) / chain)
    times.sort()
    med = times[len(times) // 2]
    pair_cells = SUB * LANES * pairs_per_lane * (STEPS - 2)
    return {
        "variant": name,
        "ms_per_launch": round(med * 1e3, 3),
        "pair_gcells_per_s": round(pair_cells / med / 1e9, 2),
    }


def main():
    SUB, LANES, STEPS = 256, 256, 512  # canonical 512x256x256-equivalent
    fwd_w = ((STEPS + 127) // 128) * 128
    rng = np.random.RandomState(0)

    def arr(shape, hi):
        return jnp.asarray(rng.randint(0, hi, shape), jnp.int32)

    prof = [arr((SUB, LANES), 1 << 30) for _ in range(4)]
    acode = arr((SUB, LANES), 27)
    fwd = arr((SUB, fwd_w), 27)
    tgt = jnp.full((SUB, LANES), STEPS - 8, jnp.int32)
    single = build(make_single(SUB, LANES, STEPS), 7, SUB, LANES, 2, fwd_w)
    r1 = time_variant("single_v5_mix", single,
                      prof + [acode, fwd, tgt], SUB, LANES, STEPS, 1)

    prof2 = [arr((SUB, LANES), 1 << 30) for _ in range(8)]
    acode2 = arr((SUB, LANES), (27 << 16) | 27)
    fwd2 = arr((SUB, fwd_w), (27 << 16) | 27)
    tgt2 = jnp.full((SUB, LANES), ((STEPS - 8) << 16) | (STEPS - 8),
                    jnp.int32)
    swar = build(make_swar(SUB, LANES, STEPS), 11, SUB, LANES, 3, fwd_w)
    r2 = time_variant("swar2x16_real", swar,
                      prof2 + [acode2, fwd2, tgt2], SUB, LANES, STEPS, 2)

    out = [r1, r2]
    base = r1["pair_gcells_per_s"]
    for o in out:
        o["per_pair_vs_base"] = round(o["pair_gcells_per_s"] / base, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
