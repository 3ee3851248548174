#!/usr/bin/env python
"""Attribute the Myers roofline gap by ABLATING the real kernel.

Round-4 VERDICT item 5.  Synthetic-probe SOLs failed twice (the swar
probe predicted 2.16x where the real kernel measured 1.0x; the
dependency-broken issue probe ran 2x SLOWER than the real kernel — its
hoisted streams spilled to VMEM), so attribution comes from the real
kernel itself: time the PRODUCTION kernel body with specific op groups
removed (results wrong, timing valid), identical launch plumbing:

  full        — the production body (sanity: matches the bench headline)
  no_harvest  — drop hmask load + hit-ors + score/res update
                (~6 ops/word-step + 4/char)
  no_peqsel   — drop the peq select chain (eq0 = plane 0 only;
                ~3 selects + 3 cmps/word-step)
  essential   — both removed: the ~20-op core recurrence the bench
                roofline charges (ROOFLINE_GCUPS assumes exactly this)

The deltas attribute the gap between the headline and the essential-op
roofline to concrete op groups; `essential` vs ROOFLINE_GCUPS says how
much of the remaining gap is carry-chain/issue reality vs model error.

Run on chip: python benchmarks/probe_kernel_ablate.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taxtk.ops import pallas_myers as pm
from taxtk.ops.pallas_myers import ALPHA, LANE

B, L = 8192, 2048  # the bench's canonical shape
ROOFLINE_GCUPS = 6160.0  # bench.py essential-op bound


def _make_ablated(K, Tc, n_chunks, SUB, harvest=True, peqsel=True):
    """pallas_myers._make_kernel with op-group switches; bits=4 path
    (the bench staging), body otherwise IDENTICAL."""
    UNROLL = 4 if Tc % 4 == 0 else 1

    def kernel(peq_ref, text_ref, nlen_ref, mlen_ref, out_ref,
               pv_ref, mv_ref, score_ref, res_ref, hmask_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            pv_ref[:] = jnp.full((K, SUB, LANE), 0xFFFFFFFF, jnp.uint32)
            mv_ref[:] = jnp.zeros((K, SUB, LANE), jnp.uint32)
            score_ref[:] = mlen_ref[:]
            res_ref[:] = jnp.maximum(mlen_ref[:], nlen_ref[:])
            mm = mlen_ref[:] - 1
            kk = mm >> 5
            one = jnp.full((SUB, LANE), 1, jnp.uint32)
            bit = one << (mm & 31).astype(jnp.uint32)
            for k in range(K):
                hmask_ref[k] = jnp.where(kk == k, bit, jnp.uint32(0))

        n_len = nlen_ref[:]
        base_j = t * Tc

        def one_char(jj, pvs, mvs, score, res):
            packed = text_ref[jj >> 1].astype(jnp.int32)
            tc = (packed >> ((jj & 1) * 4)) & 15
            ph_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            mh_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            carry_ph = jnp.ones((SUB, LANE), jnp.uint32)
            carry_mh = jnp.zeros((SUB, LANE), jnp.uint32)
            new_pvs = []
            new_mvs = []
            for k in range(K):
                if peqsel:
                    eq0 = peq_ref[k, 0]
                    for c in range(1, ALPHA):
                        eq0 = jnp.where(tc == c, peq_ref[k, c], eq0)
                    eq0 = jnp.where(tc >= ALPHA, jnp.uint32(0), eq0)
                else:
                    eq0 = peq_ref[k, 0]
                pv_k = pvs[k]
                mv_k = mvs[k]
                eq = eq0 | carry_mh
                xv = eq | mv_k
                add = (eq & pv_k) + pv_k
                xh = (add ^ pv_k) | eq
                ph = mv_k | ~(xh | pv_k)
                mh = pv_k & xh
                if harvest:
                    hm = hmask_ref[k]
                    ph_hit = ph_hit | (ph & hm)
                    mh_hit = mh_hit | (mh & hm)
                ph_shift = (ph << 1) | carry_ph
                mh_shift = (mh << 1) | carry_mh
                carry_ph = ph >> 31
                carry_mh = mh >> 31
                new_pvs.append(mh_shift | ~(xv | ph_shift))
                new_mvs.append(ph_shift & xv)
            if harvest:
                score = (
                    score
                    + (ph_hit != 0).astype(jnp.int32)
                    - (mh_hit != 0).astype(jnp.int32)
                )
                j = base_j + jj + 1
                res = jnp.where(j == n_len, score, res)
            else:
                # keep the carries live at negligible cost
                score = score + carry_ph[0, 0].astype(jnp.int32)
                res = res
            return tuple(new_pvs), tuple(new_mvs), score, res

        def stepj(jj, carry):
            pvs, mvs, score, res = carry
            for u in range(UNROLL):
                pvs, mvs, score, res = one_char(
                    jj * UNROLL + u, pvs, mvs, score, res
                )
            return (pvs, mvs, score, res)

        carry0 = (
            tuple(pv_ref[k] for k in range(K)),
            tuple(mv_ref[k] for k in range(K)),
            score_ref[:],
            res_ref[:],
        )
        pvs, mvs, score, res = jax.lax.fori_loop(
            0, Tc // UNROLL, stepj, carry0
        )
        for k in range(K):
            pv_ref[k] = pvs[k]
            mv_ref[k] = mvs[k]
        score_ref[:] = score
        res_ref[:] = res

        @pl.when(t == n_chunks - 1)
        def _emit():
            out_ref[:] = res

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("K", "Tc", "n_chunks", "n_tiles", "SUB", "harvest",
                     "peqsel"),
)
def _call_ablated(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB,
                  harvest=True, peqsel=True):
    kernel = _make_ablated(K, Tc, n_chunks, SUB, harvest, peqsel)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32),
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((K, ALPHA, SUB, LANE), lambda p, t: (0, 0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc * 4 // 8, SUB, LANE), lambda p, t: (t, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, SUB, LANE), jnp.uint32),
            pltpu.VMEM((K, SUB, LANE), jnp.uint32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((K, SUB, LANE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(peq, text, nlen, mlen)


def main():
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )
    import bench

    d_args, statics, _raw = bench._stage_tpu(0)
    K, Tc, n_chunks, n_tiles, SUB = statics
    cells = float(B) * L * L

    variants = [
        ("full", True, True),
        ("no_harvest", False, True),
        ("no_peqsel", True, False),
        ("essential", False, False),
    ]
    runs = {}
    for name, harvest, peqsel in variants:
        out = _call_ablated(*d_args, K, Tc, n_chunks, n_tiles, SUB,
                            harvest, peqsel)
        _ = float(jnp.asarray(out).sum())
        runs[name] = (harvest, peqsel)

    CHAIN = 8
    acc = {}
    for rep in range(5):
        for name, (harvest, peqsel) in runs.items():
            t0 = time.time()
            outs = [
                _call_ablated(*d_args, K, Tc, n_chunks, n_tiles, SUB,
                              harvest, peqsel)
                for _ in range(CHAIN)
            ]
            _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
            acc.setdefault(name, []).append((time.time() - t0) / CHAIN)
    results = {}
    for name, ts in acc.items():
        best = min(ts)
        results[name] = round(cells / best / 1e9, 1)
        print(json.dumps({
            "variant": name,
            "ms_min": round(best * 1e3, 2),
            "gcups_min": results[name],
        }), flush=True)
    full = results["full"]
    ess = results["essential"]
    print(json.dumps({
        "harvest_cost_pct": round(
            100 * (1 - full / results["no_harvest"]), 1),
        "peqsel_cost_pct": round(
            100 * (1 - full / results["no_peqsel"]), 1),
        "essential_vs_model_roofline_pct": round(
            100 * ess / ROOFLINE_GCUPS, 1),
        "full_vs_essential_pct": round(100 * full / ess, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
