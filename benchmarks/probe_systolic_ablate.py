#!/usr/bin/env python
"""Locate the systolic kernel's ~3x padded-rate deficit vs chunked.

Three hypotheses measured flat (stagger chain, KC register state beyond
32, per-char rolls — see docs/STATUS.md round 4/5); this probe ablates
the REAL systolic body (the methodology that worked for the Myers
roofline, probe_kernel_ablate.py): each variant removes one op group,
timing-only (results wrong where noted), same launch plumbing at the
canonical 16x50 kbp systolic shape.

  full        — production body
  no_enter    — drop the per-word enter re-seed selects (2 x KC/char)
  no_headsel  — feed the FIFO char directly (no roll, no head select)
  no_harvest  — drop hmask ors + live/score/res updates
  bare        — all of the above: the chunked kernel's core op stream
                in the systolic dataflow

If `bare` still runs ~3x below the chunked kernel's padded rate, the
deficit is structural (scheduling/layout of this dataflow), not op
groups.
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

from taxtk.ops.pallas_myers import ALPHA, LANE
from taxtk.ops import pallas_myers_systolic as ms

STAG = ms.STAG


def _make_ablated(KC, Tc, n_chunks, SUB, bits, enter_sel=True,
                  head_sel=True, harvest=True):
    UNROLL = STAG

    def kernel(peq_ref, text_ref, head_ref, lanek_ref, nlen_ref,
               mword_ref, mbit_ref, mlen_ref, out_ref, pv_ref, mv_ref,
               fifo_ref, score_ref, res_ref, hmask_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            pv_ref[:] = jnp.full((KC, SUB, LANE), 0xFFFFFFFF, jnp.uint32)
            mv_ref[:] = jnp.zeros((KC, SUB, LANE), jnp.uint32)
            fifo_ref[:] = jnp.zeros((STAG, SUB, LANE), jnp.int32)
            score_ref[:] = mlen_ref[:]
            res_ref[:] = jnp.maximum(mlen_ref[:], nlen_ref[:])
            kk = mword_ref[:]
            one = jnp.full((SUB, LANE), 1, jnp.uint32)
            bit = one << mbit_ref[:].astype(jnp.uint32)
            for k in range(KC):
                hmask_ref[k] = jnp.where(kk == k, bit, jnp.uint32(0))

        head = head_ref[:] == 1
        lanek = lanek_ref[:]
        n_len = nlen_ref[:]
        base_j = t * Tc

        def one_char(jj, u, pvs, mvs, fifo, score, res):
            if bits == 2:
                packed = text_ref[jj >> 2].astype(jnp.int32)
                fresh = (packed >> ((jj & 3) * 2)) & 3
            else:
                packed = text_ref[jj >> 1].astype(jnp.int32)
                fresh = (packed >> ((jj & 1) * 4)) & 15
            if head_sel:
                slot_in = jnp.where(head, fresh | 256,
                                    pltpu.roll(fifo[u], 1, axis=1))
            else:
                slot_in = fresh | 256  # timing-only: no roll/select
            j = base_j + jj
            jeff1 = (j + 1) - lanek
            enter = jeff1 == 1
            tc = slot_in & 255
            carry_ph = ((slot_in >> 8) & 1).astype(jnp.uint32)
            carry_mh = (slot_in >> 9).astype(jnp.uint32)
            ph_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            mh_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            new_pvs = []
            new_mvs = []
            for k in range(KC):
                eq0 = peq_ref[k, 0]
                for c in range(1, 4 if bits == 2 else ALPHA):
                    eq0 = jnp.where(tc == c, peq_ref[k, c], eq0)
                if bits != 2:
                    eq0 = jnp.where(tc >= ALPHA, jnp.uint32(0), eq0)
                if enter_sel:
                    pv_k = jnp.where(enter, jnp.uint32(0xFFFFFFFF), pvs[k])
                    mv_k = jnp.where(enter, jnp.uint32(0), mvs[k])
                else:
                    pv_k = pvs[k]  # timing-only
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
                delta = (ph_hit != 0).astype(jnp.int32) - (
                    mh_hit != 0).astype(jnp.int32)
                live = (jeff1 >= 1) & (jeff1 <= n_len)
                score = score + jnp.where(live, delta, 0)
                res = jnp.where(jeff1 == n_len, score, res)
            else:
                score = score + carry_ph[0, 0].astype(jnp.int32)
            slot = (tc
                    | jax.lax.shift_left(carry_ph.astype(jnp.int32), 8)
                    | jax.lax.shift_left(carry_mh.astype(jnp.int32), 9))
            return tuple(new_pvs), tuple(new_mvs), slot, score, res

        def stepj(jj, carry):
            pvs, mvs, fifo, score, res = carry
            new_fifo = list(fifo)
            for u in range(UNROLL):
                pvs, mvs, slot, score, res = one_char(
                    jj * UNROLL + u, u, pvs, mvs, fifo, score, res)
                new_fifo[u] = slot
            return (pvs, mvs, tuple(new_fifo), score, res)

        carry0 = (
            tuple(pv_ref[k] for k in range(KC)),
            tuple(mv_ref[k] for k in range(KC)),
            tuple(fifo_ref[u] for u in range(STAG)),
            score_ref[:],
            res_ref[:],
        )
        pvs, mvs, fifo, score, res = jax.lax.fori_loop(
            0, Tc // UNROLL, stepj, carry0)
        for k in range(KC):
            pv_ref[k] = pvs[k]
            mv_ref[k] = mvs[k]
        for u in range(STAG):
            fifo_ref[u] = fifo[u]
        score_ref[:] = score
        res_ref[:] = res

        @pl.when(t == n_chunks - 1)
        def _emit():
            out_ref[:] = res

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("KC", "Tc", "n_chunks", "n_tiles", "SUB", "bits",
                     "enter_sel", "head_sel", "harvest"),
)
def _call_ablated(peq, text, head, lanek, nlen, mword, mbit, mlen,
                  KC, Tc, n_chunks, n_tiles, SUB, bits,
                  enter_sel, head_sel, harvest):
    kernel = _make_ablated(KC, Tc, n_chunks, SUB, bits, enter_sel,
                           head_sel, harvest)
    B2 = jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32)
    bspec = pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=B2,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((KC, ALPHA, SUB, LANE), lambda p, t: (0, 0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc * bits // 8, SUB, LANE),
                         lambda p, t: (t, p, 0), memory_space=pltpu.VMEM),
            bspec, bspec, bspec, bspec, bspec, bspec,
        ],
        out_specs=bspec,
        scratch_shapes=[
            pltpu.VMEM((KC, SUB, LANE), jnp.uint32),
            pltpu.VMEM((KC, SUB, LANE), jnp.uint32),
            pltpu.VMEM((STAG, SUB, LANE), jnp.int32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((KC, SUB, LANE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(peq, text, head, lanek, nlen, mword, mbit, mlen)


def main():
    B, L = 16, 50000
    rng = np.random.RandomState(1)
    a = rng.randint(0, 4, (B, L)).astype(np.uint8)
    b = rng.randint(0, 4, (B, L)).astype(np.uint8)
    al = np.full(B, L, np.int32)
    bl = np.full(B, L, np.int32)
    KC, SUB, Tc = ms.DEFAULT_KC, ms.DEFAULT_SUB, 512
    inputs, last_slot, (n_tiles, n_chunks, Np, nbmax) = ms._pack_systolic(
        a, b, al, bl, KC, SUB, Tc, False, build_pools=True, bits=2)
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )

    fin = batched_edit_distance_systolic(a, b, al, bl, lazy=True)
    fin()
    cells = float(B) * L * L
    t0 = time.time()
    fins = [batched_edit_distance_systolic(a, b, al, bl, lazy=True)
            for _ in range(2)]
    for f in fins:
        f()
    full_rate = 2 * cells / (time.time() - t0) / 1e9
    print(json.dumps({"variant": "full_production",
                      "gcups": round(full_rate, 1)}), flush=True)

    # ablations: reproduce _stage_core's gather EXACTLY, then call the
    # ablated kernel with the pre-gathered arrays (pure kernel timing)
    from taxtk.ops.pallas_myers import _peq_from_codes

    bits = 2
    B1 = ms._pow2(a.shape[0] + 1)
    S = n_tiles * SUB
    nbytes = Np * bits // 8
    pat_u = jnp.asarray(inputs["pat_u"])
    text_u = jnp.asarray(inputs["text_u"])
    plen_pat = jnp.asarray(inputs["plen_pat"])
    peq_col = jnp.asarray(inputs["peq_col"])
    txt_col = jnp.asarray(inputs["txt_col"])
    headm = jnp.asarray(inputs["head"])
    lanek = jnp.asarray(inputs["lanek"])
    nlen = jnp.asarray(inputs["nlen"])
    mword = jnp.asarray(inputs["mword"])
    mbit = jnp.asarray(inputs["mbit"])
    mlen = jnp.asarray(inputs["mlen"])
    peq_u = _peq_from_codes(pat_u, plen_pat, nbmax * KC, bits)
    peq_flat = (
        peq_u.reshape(nbmax, KC, ALPHA, B1)
        .transpose(1, 2, 0, 3)
        .reshape(KC, ALPHA, nbmax * B1)
    )
    peq_g = jnp.take(peq_flat, peq_col, axis=2).reshape(
        KC, ALPHA, S, LANE)
    text_g = jnp.take(text_u[:nbytes], txt_col, axis=1).reshape(
        nbytes, S, LANE)
    variants = [
        ("full_core", True, True, True),
        ("no_enter", False, True, True),
        ("no_headsel", True, False, True),
        ("no_harvest", True, True, False),
        ("bare", False, False, False),
    ]
    for name, es, hs, hv in variants:
        out = _call_ablated(peq_g, text_g, headm, lanek, nlen, mword,
                            mbit, mlen, KC, Tc, n_chunks, n_tiles, SUB,
                            2, es, hs, hv)
        _ = float(jnp.asarray(out).sum())
        best = None
        for _rep in range(4):
            t0 = time.time()
            outs = [
                _call_ablated(peq_g, text_g, headm, lanek, nlen, mword,
                              mbit, mlen, KC, Tc, n_chunks, n_tiles, SUB,
                              2, es, hs, hv)
                for _ in range(2)
            ]
            _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
            dt = (time.time() - t0) / 2
            best = dt if best is None else min(best, dt)
        print(json.dumps({"variant": name,
                          "gcups": round(cells / best / 1e9, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
