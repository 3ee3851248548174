"""Pallas TPU kernel: batched wavefront edit distance.  SUPERSEDED.

pallas_myers.py replaces this for production DNA alignment (~20x fewer ops
per DP cell via bit-parallelism) and compiles cleanly on TPU; this wavefront
version needs an unaligned dynamic slice that Mosaic rejects (fixable with a
dynamic lane rotate as in pallas_protein.py, but there is no reason to: the
only score the DNA path needs is the edit distance, which Myers computes).
Kept as the simplest Pallas reference implementation of the wavefront
pattern; exact in interpret mode (tested).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 24)


def _kernel(a_ext_ref, rbp_ref, lens_ref, out_ref, prev_ref, pp_ref, res_ref):
    Bt, Mp1 = a_ext_ref.shape
    W = rbp_ref.shape[1]
    N = W - 2 * Mp1
    steps = Mp1 - 1 + N

    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, Mp1), 1)
    a_ext = a_ext_ref[:]
    a_len = lens_ref[:, 0:1]
    target_d = lens_ref[:, 0:1] + lens_ref[:, 1:2]

    prev_ref[:] = jnp.where(col == 0, 0, _BIG)
    pp_ref[:] = jnp.zeros((Bt, Mp1), jnp.int32)
    res_ref[:] = jnp.broadcast_to(jnp.maximum(a_len, lens_ref[:, 1:2]), (Bt, Mp1))

    def body(d, _):
        prev = prev_ref[:]
        pp = pp_ref[:]
        start = Mp1 + N - d
        bx = rbp_ref[:, pl.ds(start, Mp1)]
        cost = (a_ext != bx).astype(jnp.int32)
        # shift right by one lane; lane 0 becomes +inf / don't-care
        prev_s = jnp.where(col == 0, _BIG, pltpu.roll(prev, 1, axis=1))
        pp_s = jnp.where(col == 0, _BIG, pltpu.roll(pp, 1, axis=1))
        new = jnp.minimum(jnp.minimum(prev + 1, prev_s + 1), pp_s + cost)
        new = jnp.where(col == 0, d, new)
        new = jnp.where(col == d, d, new)
        res_ref[:] = jnp.where(d == target_d, new, res_ref[:])
        pp_ref[:] = prev
        prev_ref[:] = new
        return _

    jax.lax.fori_loop(1, steps + 1, body, None)
    out_ref[:] = res_ref[:]


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def _pallas_call(a_ext, rbp, lens, row_tile: int, interpret: bool = False):
    B, Mp1 = a_ext.shape
    W = rbp.shape[1]
    grid = (B // row_tile,)
    result = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, Mp1), jnp.int32),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((row_tile, Mp1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, Mp1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((row_tile, Mp1), jnp.int32),
            pltpu.VMEM((row_tile, Mp1), jnp.int32),
            pltpu.VMEM((row_tile, Mp1), jnp.int32),
        ],
    )(a_ext, rbp, lens)
    return jnp.take_along_axis(result, lens[:, 0:1], axis=1)[:, 0]


def _round_up(x, m):
    return -(-x // m) * m


def batched_edit_distance_pallas(
    a_codes, b_codes, a_len, b_len, row_tile: int = 8, interpret: bool = False
):
    """Drop-in for dna_align.batched_edit_distance on TPU.

    a_codes [B, M], b_codes [B, N] uint8; lens [B].  Pads the lane dimension
    to 128 multiples and the batch to the row tile.
    """
    a_codes = np.asarray(a_codes)
    b_codes = np.asarray(b_codes)
    a_len = np.asarray(a_len, dtype=np.int32)
    b_len = np.asarray(b_len, dtype=np.int32)
    B, M = a_codes.shape
    N = b_codes.shape[1]

    Mp1 = _round_up(M + 1, 128)
    Npad = _round_up(N, 128)
    Bpad = _round_up(max(B, row_tile), row_tile)

    a_ext = np.zeros((Bpad, Mp1), dtype=np.int32)
    a_ext[:B, 1 : M + 1] = a_codes
    rbp = np.full((Bpad, 2 * Mp1 + Npad), 255, dtype=np.int32)
    rbp[:B, Mp1 + Npad - N : Mp1 + Npad] = b_codes[:, ::-1]
    # note: with Npad > N the slice math uses Npad as the logical N, so the
    # reversed codes must sit flush against index Mp1 + Npad; the leading
    # Npad-N entries stay sentinel and behave as extra b-prefix junk beyond
    # every pair's harvest diagonal
    lens = np.zeros((Bpad, 2), dtype=np.int32)
    lens[:B, 0] = a_len
    lens[:B, 1] = b_len
    lens[B:, :] = 1

    out = _pallas_call(
        jnp.asarray(a_ext), jnp.asarray(rbp), jnp.asarray(lens), row_tile, interpret
    )
    return np.asarray(out)[:B]
