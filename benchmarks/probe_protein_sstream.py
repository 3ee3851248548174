#!/usr/bin/env python
"""Decision probe for the MXU/precompute attack on the protein kernel.

The wavefront step is VPU-issue-bound; ~10 of its ~28 vector ops are the
packed-profile extraction (word select chain + variable nibble shift) and
the match compare.  If the substitution scores arrived PRECOMPUTED in
skewed (anti-diagonal) layout — S_skew[p, d, j] = BLOSUM[a_j, b_{d-2-j}]
with the match bit packed in — the kernel step would shrink to the DP
core.  The VERDICT's "one-hot x BLOSUM62 matmul" idea lands here too: on
TPU the profile gather is cheap either way; the irreducible cost is the
SHEAR (antidiagonal gather), because MXU matmuls cannot contract into a
skewed output layout.

This probe measures the two sides of the trade separately:

(a) XLA production of S_skew int8 [B, steps, Mp] for the canonical
    512x256x256 launch (flat 1024-entry table gather with the match bit
    packed: S8 = ((BLOSUM+4) << 1) | is_match).
(b) the kernel with the extraction REPLACED by a 2-op stand-in
    (sub = bx - 4, match = compare) — an upper bound on the DP-core-only
    rate (the real S-stream version would add a VMEM block load +
    carry spill/reload at step-block boundaries).

Decision rule: the attack wins only if (a)'s cost + the streamed
kernel's overhead is clearly below (b)'s measured savings.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_protein import make_pairs  # noqa: E402


def time_sskew(a, b, reps=6):
    import jax
    import jax.numpy as jnp
    from taxtk.ops.blosum import BLOSUM62

    B, M = a.shape
    N = b.shape[1]
    steps = 2 * M  # canonical square launch: Mp + N
    Mp = M

    flat = np.zeros((32 * 32,), np.int8)
    for ai in range(27):
        for c in range(27):
            flat[ai * 32 + c] = ((int(BLOSUM62[ai, c]) + 4) << 1) | (ai == c)
    tflat = jnp.asarray(flat)

    d_idx = np.arange(2, steps + 2)[:, None]
    j_idx = np.arange(Mp)[None, :]
    t_idx = np.clip(d_idx - 2 - j_idx, 0, N - 1).astype(np.int32)
    t_idx_d = jnp.asarray(t_idx)

    a_d = jnp.asarray(a.astype(np.int32))
    b_d = jnp.asarray(b.astype(np.int32))

    @jax.jit
    def produce(a_c, b_c):
        fwd_skew = b_c[:, t_idx_d]              # [B, steps, Mp] gather
        idx = a_c[:, None, :] * 32 + fwd_skew   # [B, steps, Mp]
        return jnp.take(tflat, idx)             # int8 S_skew

    out = produce(a_d, b_d)
    np.asarray(out[0, 0, 0])  # warm + sync
    times = []
    for _ in range(reps):
        t0 = time.time()
        outs = [produce(a_d, b_d + 0 * i) for i in range(4)]
        np.asarray(jnp.stack([o[0, 0, 0] for o in outs]).sum())
        times.append((time.time() - t0) / 4)
    times.sort()
    bytes_out = B * steps * Mp
    return {
        "s_skew_ms": round(min(times) * 1e3, 3),
        "s_skew_med_ms": round(times[len(times) // 2] * 1e3, 3),
        "s_skew_bytes_mb": round(bytes_out / 1e6, 1),
    }


def time_kernel(variant, args, reps):
    """variant: 'full' = production kernel; 'noextract' = extraction
    replaced by a 2-op stand-in (NOT semantically correct — timing only)."""
    import jax
    import jax.numpy as jnp
    from taxtk.ops import pallas_protein as pp

    a, b, al, bl = make_pairs(args.b, args.m, args.n)
    cells = int(al.astype(np.int64) @ bl.astype(np.int64))

    if variant == "noextract":
        import unittest.mock as mock
        import jax.experimental.pallas as pl  # noqa: F401

        orig = pp._make_kernel

        def patched(SUB, Mp, steps_end):
            kern = orig(SUB, Mp, steps_end)
            return kern

        # monkeypatch the extraction by shadowing the module-level table
        # lookup is awkward; instead rebuild the kernel body here mirroring
        # pallas_protein._make_kernel with the extraction stubbed
        from jax.experimental import pallas as plx
        from jax.experimental.pallas import tpu as pltpu

        gap = -1 * 1  # placeholder; real gap read below
        from taxtk.ops.blosum import GAP_SCORE
        gap = int(GAP_SCORE)
        _NEG = pp._NEG
        _DC_ONE = pp._DC_ONE

        def make_kernel(SUB, Mp, steps_end):
            def kernel(prof_ref, acode_ref, fwd_ref, tgt_ref, s_out,
                       madc_out, i0_ref, i1_ref, i2_ref):
                col = jax.lax.broadcasted_iota(jnp.int32, (SUB, Mp), 1)
                target_d = tgt_ref[:]
                i0_ref[:] = jnp.where(col == 0, gap, _NEG)
                i1_ref[:] = jnp.zeros((SUB, Mp), jnp.int32)
                i2_ref[:] = jnp.where(col == 0, 0, _NEG)
                s0, zero, sh0 = i0_ref[:], i1_ref[:], i2_ref[:]
                acode = acode_ref[:]

                def body(d, carry):
                    (s_prev, madc_prev, sh_s, sh_madc, bx, buf) = carry
                    k = d - 2
                    base = plx.multiple_of((k // 128) * 128, 128)
                    window = fwd_ref[:, plx.ds(base, 128)]
                    buf = jnp.where((k % 128) == 0, window,
                                    pltpu.roll(buf, 127, axis=1))
                    newval = buf[:, 0:1]
                    bx = jnp.where(col == 0, newval,
                                   pltpu.roll(bx, 1, axis=1))
                    # === extraction stand-in: S-stream world (2 ops) ===
                    sub = bx - 4
                    is_match = (acode == bx).astype(jnp.int32)
                    # === DP core (identical to production v5) ===
                    s_prev_s = jnp.where(col == 0, gap * (d - 1),
                                         pltpu.roll(s_prev, 1, axis=1))
                    madc_prev_s = jnp.where(col == 0, 0,
                                            pltpu.roll(madc_prev, 1, axis=1))
                    d_val = sh_s + sub
                    best = jnp.maximum(
                        d_val, jnp.maximum(s_prev, s_prev_s) + gap)
                    take_d = d_val == best
                    take_h = (~take_d) & (s_prev >= s_prev_s)
                    new_s = best
                    new_madc = jnp.where(
                        take_d, sh_madc + is_match + _DC_ONE,
                        jnp.where(take_h, madc_prev, madc_prev_s))
                    on_tb = col == (d - 1)
                    new_s = jnp.where(on_tb, gap * d, new_s)
                    new_madc = jnp.where(on_tb, 0, new_madc)
                    live = d <= target_d
                    new_s = jnp.where(live, new_s, s_prev)
                    new_madc = jnp.where(live, new_madc, madc_prev)
                    return (new_s, new_madc, s_prev_s, madc_prev_s, bx, buf)

                init = (s0, zero, sh0, zero, zero + 31,
                        zero[:, 0:128] + 31)
                out = jax.lax.fori_loop(2, steps_end + 1, body, init)
                s_out[:] = out[0]
                madc_out[:] = out[1]

            return kernel

        pp_make_orig = pp._make_kernel
        pp._make_kernel = make_kernel
        pp._call.clear_cache()

    B, M = a.shape
    N = b.shape[1]
    SUB = args.sub
    Mp, steps_end, fwd_w, n_tiles = pp._shapes(B, M, N, SUB)
    Bp = n_tiles * SUB
    acode = np.full((Bp, Mp), 255, np.uint8)
    acode[:B, 0:M] = a
    fwd = np.full((Bp, fwd_w), 255, np.uint8)
    fwd[:B, :N] = b
    ablen = np.ones(Bp, np.int32)
    ablen[:B] = al + bl
    alen_p = np.zeros(Bp, np.int32)
    alen_p[:B] = al
    dev = [jnp.asarray(v) for v in (acode, fwd, ablen, alen_p)]

    def chain(L):
        ab = dev[2]
        out = None
        for _ in range(L):
            out = pp._call(dev[0], dev[1], ab, dev[3], SUB, Mp, steps_end,
                           fwd_w, n_tiles)
            ab = dev[2] + (out[0, :1].astype(jnp.int32) & 0)
        return out

    np.asarray(chain(2)[0, 0])
    best = None
    for _ in range(reps):
        t0 = time.time()
        np.asarray(chain(1)[0, 0])
        base = time.time() - t0
        t0 = time.time()
        np.asarray(chain(args.chain)[0, 0])
        tot = time.time() - t0
        per = (tot - base) / (args.chain - 1)
        best = per if best is None else min(best, per)

    if variant == "noextract":
        pp._make_kernel = pp_make_orig
        pp._call.clear_cache()

    return {
        "variant": variant,
        "per_launch_ms": round(best * 1e3, 3),
        "gcups": round(cells / best / 1e9, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=512)
    p.add_argument("--m", type=int, default=256)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--chain", type=int, default=20)
    p.add_argument("--sub", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import json

    a, b, _, _ = make_pairs(args.b, args.m, args.n)
    out = {"sskew": time_sskew(a, b)}
    out["full"] = time_kernel("full", args, args.reps)
    out["noextract"] = time_kernel("noextract", args, args.reps)
    f, n = out["full"]["per_launch_ms"], out["noextract"]["per_launch_ms"]
    out["extraction_ms_saved"] = round(f - n, 3)
    out["projected_net_ms"] = round(n + out["sskew"]["s_skew_ms"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
