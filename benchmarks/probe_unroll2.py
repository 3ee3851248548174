#!/usr/bin/env python
"""Probe: unroll TWO text chars per fori_loop iteration in the Myers
kernel.

Hypothesis: the kernel is limited by the serial ph/mh carry chain across
pattern words (~7 dependent ops x K words per char), not by issue count —
at K=64 the chain is ~86% of the issue-bound time, so Mosaic has little
slack to fill 4 ALUs.  Unrolling 2 chars per loop body lets the scheduler
interleave char j+1's word-k step (depends on char j's word-k state,
available 64 steps earlier in program order) with char j's chain —
doubling usable ILP if the chain is the wall.

A/B protocol: interleaved min-of-reps on device-resident inputs (tunnel
contention makes disjoint A/B runs incomparable), canonical 8192x2048
bench shape, one forced scalar readback per round.
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

from taxtk.ops import pallas_myers as pm
from taxtk.ops.myers_batch import _precompute, ALPHA

LANE = pm.LANE


def _make_kernel_unroll(K, Tc, n_chunks, SUB, bits, UNROLL):
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
            if bits == 2:
                packed = text_ref[jj >> 2].astype(jnp.int32)
                tc = (packed >> ((jj & 3) * 2)) & 3
            else:
                packed = text_ref[jj >> 1].astype(jnp.int32)
                tc = (packed >> ((jj & 1) * 4)) & 15
            ph_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            mh_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            carry_ph = jnp.ones((SUB, LANE), jnp.uint32)
            carry_mh = jnp.zeros((SUB, LANE), jnp.uint32)
            new_pvs = []
            new_mvs = []
            for k in range(K):
                eq0 = peq_ref[k, 0]
                for c in range(1, 4 if bits == 2 else ALPHA):
                    eq0 = jnp.where(tc == c, peq_ref[k, c], eq0)
                if bits != 2:
                    eq0 = jnp.where(tc >= ALPHA, jnp.uint32(0), eq0)
                pv_k = pvs[k]
                mv_k = mvs[k]
                eq = eq0 | carry_mh
                xv = eq | mv_k
                add = (eq & pv_k) + pv_k
                xh = (add ^ pv_k) | eq
                ph = mv_k | ~(xh | pv_k)
                mh = pv_k & xh
                hm = hmask_ref[k]
                ph_hit = ph_hit | (ph & hm)
                mh_hit = mh_hit | (mh & hm)
                ph_shift = (ph << 1) | carry_ph
                mh_shift = (mh << 1) | carry_mh
                carry_ph = ph >> 31
                carry_mh = mh >> 31
                new_pvs.append(mh_shift | ~(xv | ph_shift))
                new_mvs.append(ph_shift & xv)
            score = (
                score
                + (ph_hit != 0).astype(jnp.int32)
                - (mh_hit != 0).astype(jnp.int32)
            )
            j = base_j + jj + 1
            res = jnp.where(j == n_len, score, res)
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


def _pallas_unroll(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB,
                   bits, UNROLL):
    kernel = _make_kernel_unroll(K, Tc, n_chunks, SUB, bits, UNROLL)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32),
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((K, ALPHA, SUB, LANE), lambda p, t: (0, 0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc * bits // 8, SUB, LANE), lambda p, t: (t, p, 0),
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


@functools.partial(jax.jit, static_argnames=("K", "Tc", "n_chunks",
                                             "n_tiles", "SUB", "bits",
                                             "UNROLL"))
def _call_unroll(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB,
                 bits, UNROLL):
    return _pallas_unroll(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles,
                          SUB, bits, UNROLL)


def main():
    B, L = 8192, 2048
    rng = np.random.RandomState(0)
    a = rng.randint(0, 4, (B, L)).astype(np.uint8)
    b = rng.randint(0, 4, (B, L)).astype(np.uint8)
    al = np.full(B, L, np.int32)
    bl = np.full(B, L, np.int32)
    peq, text, hmask, m_len, n_len, K = _precompute(a, b, al, bl)
    K = pm._quantize_K(K)
    SUB = 8
    TILE = SUB * LANE
    n_tiles = -(-B // TILE)
    Bp = n_tiles * TILE
    Tc = 512
    n_chunks = pm._pow2(-(-text.shape[0] // Tc))

    def tile_pairs(arr, fill, dtype):
        out = np.full(arr.shape[:-1] + (Bp,), fill, dtype)
        out[..., :B] = arr
        return out.reshape(arr.shape[:-1] + (n_tiles * SUB, LANE))

    if K > peq.shape[0]:
        peq = np.concatenate(
            [peq, np.zeros((K - peq.shape[0],) + peq.shape[1:], np.uint32)]
        )
    peq_t = jnp.asarray(tile_pairs(peq, 0, np.uint32))
    mlen_t = jnp.asarray(tile_pairs(m_len[None, :], 1, np.int32)[0])
    nlen_t = jnp.asarray(tile_pairs(n_len[None, :], 1, np.int32)[0])
    bits = 2
    Np = n_chunks * Tc
    text_t = jnp.asarray(
        pm._pack_text(text, text.shape[0], B, Np, Bp, n_tiles, SUB, bits)
    )
    cells = float(B) * L * L

    variants = {
        "baseline(prod)": lambda: pm._call(
            peq_t, text_t, nlen_t, mlen_t, K, Tc, n_chunks, n_tiles, SUB,
            bits
        ),
        "unroll2": lambda: _call_unroll(
            peq_t, text_t, nlen_t, mlen_t, K, Tc, n_chunks, n_tiles, SUB,
            bits, 2
        ),
        "unroll4": lambda: _call_unroll(
            peq_t, text_t, nlen_t, mlen_t, K, Tc, n_chunks, n_tiles, SUB,
            bits, 4
        ),
    }
    # warm + correctness
    ref = None
    for name, fn in variants.items():
        out = np.asarray(fn()).reshape(-1)[:B]
        if ref is None:
            ref = out
        else:
            assert (out == ref).all(), f"{name} mismatch"
    # interleaved min-of-reps
    best = {name: float("inf") for name in variants}
    for rep in range(6):
        for name, fn in variants.items():
            t0 = time.time()
            outs = [fn() for _ in range(4)]
            _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
            best[name] = min(best[name], (time.time() - t0) / 4)
    for name, dt in best.items():
        print(f"{name}: {dt*1e3:8.2f} ms  {cells/dt/1e9:7.0f} GCUPS")


if __name__ == "__main__":
    main()
