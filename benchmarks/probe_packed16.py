#!/usr/bin/env python
"""Round-4 probe: manual 2x16-bit SWAR packing inside int32 lanes for
the protein wavefront (the round-3 VERDICT's last suggested >=1.5x
door, sidestepping Mosaic's int16 legalization wall that killed native
int16 vectors — benchmarks/probe_int16_step.py).

Packing two pairs' DP scores per 32-bit lane halves the lane count, but
the wavefront mix is dominated by max/compare/select, none of which are
SWAR-native on a 32-bit ALU:

  * packed add IS cheap (1 op for 2 pairs) given guard-bit discipline
    (biased non-negative halves, headroom so the low half never carries
    into the high half);
  * packed max must be EMULATED: d = a - b (halves independent under
    guard bits), extract per-half sign masks (d>>31 for the high half,
    (d<<16)>>31 for the low), blend — ~7 ops for 2 pairs vs 2 unpacked;
  * packed select (where) likewise needs per-half masks.

Op count for the v5 wavefront mix (per 2 pairs per step):
  unpacked int32: 2 rolls + 2 boundary sel + 3 adds + 2 max + 2 cmp +
  3 sel + 1 freeze ~= 2x17 = 34 source ops
  SWAR packed:    2 rolls + 2 boundary sel + 3 adds + 2x~7 (max) +
  2x~6 (cmp+sel pairs) + ~4 freeze ~= 37-40 ops -> analytically >= 1x,
  i.e. NO win; this probe measures it to close the question with
  numbers (the same chained one-sync protocol as probe_int16_step).

Variants:
  int32_base   — the wavefront op mix, one pair per lane (reference)
  swar_packed  — same mix, two pairs per lane, SWAR-emulated max/select
  swar_addonly — hypothetical lower bound: packed adds/rolls, but max/
                 select done as if free (UNSOUND, measures the ceiling
                 the packing could ever reach if max were native)
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
MASK_HI = -65536  # 0xFFFF0000 as int32


def make_base(SUB, LANES, STEPS):
    """One pair per int32 lane: the v5 wavefront op mix (see
    probe_int16_step.make_step)."""

    def kernel(x_ref, out_ref):
        x = x_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)

        def body(d, carry):
            s, sh, m = carry
            s_s = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
            m_s = jnp.where(col == 0, 0, pltpu.roll(m, 1, axis=1))
            d_val = sh + 1
            v_val = s_s - 11
            h_val = s - 11
            best = jnp.maximum(jnp.maximum(d_val, v_val), h_val)
            take_d = d_val == best
            take_h = (~take_d) & (h_val == best)
            new_m = jnp.where(take_d, m + 1, jnp.where(take_h, m_s, m))
            live = d < STEPS - 8
            new_s = jnp.where(live, best, s)
            return (new_s, s_s, new_m)

        out = jax.lax.fori_loop(2, STEPS, body, (x, x, x * 0))
        out_ref[:] = out[0]

    return kernel


def _swar_ge_mask(a, b):
    """Per-half (a >= b) masks for biased non-negative 16-bit halves:
    returns an int32 with each half all-ones where its a-half >= b-half.
    Guard-bit requirement: halves in [0, 2^14) so subtraction cannot
    borrow across the boundary once the low halves are isolated."""
    d_lo = (a & MASK_LO) - (b & MASK_LO)          # exact low difference
    lo_m = jnp.int32(MASK_LO) & ~(d_lo >> 31)     # lo: a>=b
    d_hi = (a >> 16) - (b >> 16)                  # exact high difference
    hi_m = jnp.int32(MASK_HI) & ~(d_hi >> 31)     # hi: a>=b (sign fills)
    return hi_m | lo_m


def make_swar(SUB, LANES, STEPS, addonly=False):
    """Two pairs per int32 lane (hi/lo 16-bit halves, biased
    non-negative).  addonly=True cheats max/select down to whole-lane
    ops (numerically wrong across halves) to measure the ceiling."""

    def kernel(x_ref, out_ref):
        x = x_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        one2 = jnp.int32((1 << 16) | 1)       # +1 to both halves
        neg11 = jnp.int32((11 << 16) | 11)    # -11 to both (subtract)

        def pmax(a, b):
            if addonly:
                return jnp.maximum(a, b)
            m = _swar_ge_mask(a, b)
            return (a & m) | (b & ~m)

        def psel(mask_full, t, f):
            if addonly:
                return jnp.where(mask_full != 0, t, f)
            return (t & mask_full) | (f & ~mask_full)

        def body(d, carry):
            s, sh, m = carry
            s_s = jnp.where(col == 0, d, pltpu.roll(s, 1, axis=1))
            m_s = jnp.where(col == 0, 0, pltpu.roll(m, 1, axis=1))
            d_val = sh + one2
            v_val = s_s - neg11
            h_val = s - neg11
            best = pmax(pmax(d_val, v_val), h_val)
            if addonly:
                take_d = d_val == best
                take_h = (~take_d) & (h_val == best)
                new_m = jnp.where(take_d, m + one2,
                                  jnp.where(take_h, m_s, m))
            else:
                eq_d = _swar_ge_mask(d_val, best) & _swar_ge_mask(
                    best, d_val)
                eq_h = _swar_ge_mask(h_val, best) & _swar_ge_mask(
                    best, h_val) & ~eq_d
                new_m = psel(eq_d, m + one2, psel(eq_h, m_s, m))
            live = d < STEPS - 8
            new_s = jnp.where(live, best, s)  # scalar cond: whole lane ok
            return (new_s, s_s, new_m)

        out = jax.lax.fori_loop(2, STEPS, body, (x, x, x * 0))
        out_ref[:] = out[0]

    return kernel


def build(kernel, SUB, LANES, interpret=False):
    shape = jax.ShapeDtypeStruct((SUB, LANES), jnp.int32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=shape,
            interpret=interpret,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


def time_variant(name, kernel, SUB, LANES, STEPS, pairs_per_lane,
                 reps=6, chain=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 100, (SUB, LANES)), jnp.int32)
    run = build(kernel, SUB, LANES)
    _ = float(jnp.sum(run(x)))  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        outs = [run(x) for _ in range(chain)]
        _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        times.append((time.time() - t0) / chain)
    times.sort()
    med = times[len(times) // 2]
    pair_cells = SUB * LANES * pairs_per_lane * (STEPS - 2)
    return {
        "variant": name,
        "ms_per_launch": round(med * 1e3, 3),
        "pair_cells_per_s_g": round(pair_cells / med / 1e9, 2),
    }


def main():
    SUB, LANES, STEPS = 256, 128, 512
    out = [
        time_variant("int32_base", make_base(SUB, LANES, STEPS),
                     SUB, LANES, STEPS, 1),
        time_variant("swar_packed", make_swar(SUB, LANES, STEPS),
                     SUB, LANES, STEPS, 2),
        time_variant("swar_addonly_ceiling",
                     make_swar(SUB, LANES, STEPS, addonly=True),
                     SUB, LANES, STEPS, 2),
    ]
    base = out[0]["pair_cells_per_s_g"]
    for o in out:
        o["per_pair_vs_base"] = round(o["pair_cells_per_s_g"] / base, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
