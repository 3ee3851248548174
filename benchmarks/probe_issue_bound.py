#!/usr/bin/env python
"""Issue-bound speed-of-light for the EXACT Myers kernel op stream.

Round-4 VERDICT item 5: attribute the gap between the kernel's measured
rate and the essential-op roofline.  Op-count models failed in both
directions (docs/STATUS.md round 3), so this probe measures the bound
directly: it runs the production kernel's OWN per-word-step op body
(pallas_myers._make_kernel one_char, bits=2 path: peq select chain,
the full Myers recurrence, harvest masks, shifts) with every SERIAL
DEPENDENCY broken —

  * the inter-word ph/mh carries are register constants instead of the
    previous word's shifts, and
  * each char step consumes the ORIGINAL pv/mv streams instead of the
    previous char's outputs (results fold into xor accumulators so
    nothing dead-code-eliminates)

— so Mosaic schedules the identical op mix at pure issue throughput.
The ratio kernel_rate / probe_rate is then a FALSIFIABLE attribution:
at ~1.0 the kernel is issue-bound (the roofline gap is the real
non-essential ops the essential-op model assumes free); well below 1.0
the carry chain still costs.

Run on chip: python benchmarks/probe_issue_bound.py
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

LANE = 128
SUB = 8
K = 64  # canonical: 2048 bp pattern at 32 cells/word
ALPHA = 4


def _make_probe_kernel(K, Tc, n_chunks):
    def kernel(peq_ref, text_ref, out_ref):
        t = pl.program_id(0)
        base_pv = [peq_ref[k, 0] | jnp.uint32(1) for k in range(K)]
        base_mv = [peq_ref[k, 1] for k in range(K)]
        hm = [peq_ref[k, 2] for k in range(K)]

        def one_char(jj, acc_a, acc_b, score):
            packed = text_ref[jj >> 2].astype(jnp.int32)
            tc = (packed >> ((jj & 3) * 2)) & 3
            ph_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            mh_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            carry_ph = acc_a & jnp.uint32(1)  # NOT fed by the word loop
            carry_mh = acc_b & jnp.uint32(1)
            for k in range(K):
                eq0 = peq_ref[k, 0]
                for c in range(1, 4):
                    eq0 = jnp.where(tc == c, peq_ref[k, c], eq0)
                pv_k = base_pv[k]  # independent streams: no char chain
                mv_k = base_mv[k]
                eq = eq0 | carry_mh
                xv = eq | mv_k
                add = (eq & pv_k) + pv_k
                xh = (add ^ pv_k) | eq
                ph = mv_k | ~(xh | pv_k)
                mh = pv_k & xh
                ph_hit = ph_hit | (ph & hm[k])
                mh_hit = mh_hit | (mh & hm[k])
                ph_shift = (ph << 1) | carry_ph
                mh_shift = (mh << 1) | carry_mh
                # carries NOT updated from ph/mh: the serial chain is cut
                acc_a = acc_a ^ (mh_shift | ~(xv | ph_shift))
                acc_b = acc_b ^ (ph_shift & xv)
            score = (
                score
                + (ph_hit != 0).astype(jnp.int32)
                - (mh_hit != 0).astype(jnp.int32)
            )
            return acc_a, acc_b, score

        def stepj(jj, carry):
            acc_a, acc_b, score = carry
            for u in range(4):
                acc_a, acc_b, score = one_char(jj * 4 + u, acc_a, acc_b,
                                               score)
            return (acc_a, acc_b, score)

        z = jnp.zeros((SUB, LANE), jnp.uint32)
        acc_a, acc_b, score = jax.lax.fori_loop(
            0, Tc // 4, stepj, (z + 3, z + 5, z.astype(jnp.int32))
        )
        out_ref[:] = score + (acc_a ^ acc_b).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("K", "Tc", "n_chunks"))
def _call(peq, text, K, Tc, n_chunks):
    kernel = _make_probe_kernel(K, Tc, n_chunks)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((K, ALPHA, SUB, LANE), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tc // 4, SUB, LANE), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
    )(peq, text)


def main():
    rng = np.random.RandomState(0)
    Tc, n_chunks = 512, 4
    peq = jnp.asarray(
        rng.randint(0, 2**32, (K, ALPHA, SUB, LANE), np.uint64).astype(
            np.uint32)
    )
    text = jnp.asarray(
        rng.randint(-128, 128, (Tc // 4, SUB, LANE)).astype(np.int8))
    _ = float(jnp.asarray(_call(peq, text, K, Tc, n_chunks)).sum())
    CHAIN = 16
    best = None
    for _ in range(6):
        t0 = time.time()
        outs = [_call(peq, text, K, Tc, n_chunks) for _ in range(CHAIN)]
        _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = (time.time() - t0) / CHAIN
        best = dt if best is None else min(best, dt)
    # equivalent cells: SUB*LANE pairs x (Tc*n_chunks) chars x K words x 32
    cells = SUB * LANE * Tc * n_chunks * K * 32
    gcups = cells / best / 1e9
    print(f"issue-bound probe: {best*1e3:.3f} ms/launch -> "
          f"{gcups:.0f} GCUPS-equivalent SOL for the kernel's own op mix")
    print("compare: driver kernel headline (BENCH_r0*.json value) / this "
          "= fraction of the kernel's own issue bound actually achieved")


if __name__ == "__main__":
    main()
