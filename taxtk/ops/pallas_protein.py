"""Pallas TPU kernel: batched protein global alignment (BLOSUM62, linear gap).

Anti-diagonal wavefront with the pair batch in sublanes and the pattern
(sequence A) dimension in lanes.  All carries — two score diagonals plus
match-count and diagonal-step-count stat diagonals — ride in loop-carried
registers.  The sliding text window uses only STATIC lane moves: the
incoming character streams from a 128-lane refill buffer (refilled every
128 steps with an aligned dynamic slice) consumed from lane 0 by a fixed
left-rotate, and the window itself advances with a fixed right-rotate —
Mosaic rejects unaligned dynamic slices and lowers dynamic-distance
rotates poorly.

The substitution score is a 27-way masked multiply-accumulate over a
per-position BLOSUM profile of A precomputed on the host
(prof[c][i] = BLOSUM62[a[i-1], c]) — independent terms, no gathers, no
select dependency chain.

Semantics identical to protein_align._protein_kernel (SeqAn tie-break:
diagonal > consume-B > consume-A); tested equal in interpret mode.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blosum import BLOSUM62, GAP_SCORE

_AA_N = BLOSUM62.shape[0]
_NEG = np.int32(-(1 << 24))
LANE = 128


def _make_kernel(SUB: int, Mp1: int, steps: int):
    gap = int(GAP_SCORE)

    def kernel(prof_ref, acode_ref, fwd_ref, tgt_ref, s_out, ma_out, dc_out,
               i0_ref, i1_ref, i2_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, Mp1), 1)
        target_d = tgt_ref[:]  # [SUB, Mp1] (row-constant)

        def shift_right(x, fill):
            r = pltpu.roll(x, 1, axis=1)
            return jnp.where(col == 0, fill, r)

        # materialize the init diagonals through VMEM scratch so every loop
        # carry starts with a concrete (non-replicated) vector layout —
        # constant-folded inits trip a Mosaic relayout error otherwise
        i0_ref[:] = jnp.where(col == 0, 0, _NEG)
        i1_ref[:] = jnp.zeros((SUB, Mp1), jnp.int32)
        i2_ref[:] = jnp.int32(GAP_SCORE) * target_d
        s0 = i0_ref[:]
        zero = i1_ref[:]
        res_s0 = i2_ref[:]
        acode = acode_ref[:]

        def body(d, carry):
            # sh_* carry the SHIFTED previous diagonals: the value shifted at
            # step d-1 for v_val is exactly the diagonal-shift (pp_s) needed
            # at step d, halving the expensive lane-rotate count
            (s_prev, ma_prev, dc_prev, sh_s, sh_ma, sh_dc,
             res_s, res_ma, res_dc, bx, buf) = carry
            # sliding text window, all-static lane shifts: the incoming
            # character streams from a 128-lane refill buffer loaded with an
            # ALIGNED dynamic slice every 128 steps and consumed from lane 0
            # by rolling left; bx shifts right by one with the new char at
            # lane 0 (no unaligned or dynamic-distance lane moves anywhere)
            k = d - 1
            base = pl.multiple_of((k // 128) * 128, 128)
            window = fwd_ref[:, pl.ds(base, 128)]
            # left-rotate by one == right-rotate by 127 (shift must be >= 0)
            buf = jnp.where((k % 128) == 0, window, pltpu.roll(buf, 127, axis=1))
            newval = buf[:, 0:1]
            bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))
            # masked multiply-accumulate, explicitly tree-reduced so the
            # accumulation is log-depth instead of a 27-long add chain
            terms = [
                (bx == c).astype(jnp.int32) * prof_ref[c] for c in range(_AA_N)
            ]
            while len(terms) > 1:
                nxt = [
                    terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)
                ]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            sub = jnp.where(bx < _AA_N, terms[0], _NEG)
            is_match = (acode == bx) & (bx < _AA_N)

            s_pp_s = sh_s
            ma_pp_s = sh_ma
            dc_pp_s = sh_dc
            s_prev_s = shift_right(s_prev, _NEG)
            ma_prev_s = shift_right(ma_prev, 0)
            dc_prev_s = shift_right(dc_prev, 0)

            d_val = s_pp_s + sub
            v_val = s_prev_s + gap  # consume A char, gap column in B
            h_val = s_prev + gap  # consume B char, gap column in A
            best = jnp.maximum(jnp.maximum(d_val, v_val), h_val)
            take_d = d_val == best
            take_h = (~take_d) & (h_val == best)

            new_s = best
            new_ma = jnp.where(
                take_d, ma_pp_s + is_match, jnp.where(take_h, ma_prev, ma_prev_s)
            )
            new_dc = jnp.where(
                take_d, dc_pp_s + 1, jnp.where(take_h, dc_prev, dc_prev_s)
            )

            on_edge = (col == 0) | (col == d)
            new_s = jnp.where(on_edge, gap * d, new_s)
            new_ma = jnp.where(on_edge, 0, new_ma)
            new_dc = jnp.where(on_edge, 0, new_dc)

            done = d == target_d
            res_s = jnp.where(done, new_s, res_s)
            res_ma = jnp.where(done, new_ma, res_ma)
            res_dc = jnp.where(done, new_dc, res_dc)
            return (new_s, new_ma, new_dc, s_prev_s, ma_prev_s, dc_prev_s,
                    res_s, res_ma, res_dc, bx, buf)

        init = (s0, zero, zero, zero, zero, zero,
                res_s0, zero, zero,
                zero + 255,              # bx: all-sentinel before step 1
                zero[:, 0:128] + 255)    # refill buffer (overwritten at k=0)
        # carry layout: (s_prev, ma_prev, dc_prev, sh_s, sh_ma, sh_dc, ...);
        # sh_* start at zero — step-1 cells are all boundary-overridden
        out = jax.lax.fori_loop(1, steps, body, init)
        s_out[:] = out[6]
        ma_out[:] = out[7]
        dc_out[:] = out[8]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("SUB", "Mp1", "steps", "fwd_w", "n_tiles", "interpret")
)
def _call(prof, acode, fwd, tgt, alen, SUB, Mp1, steps, fwd_w, n_tiles, interpret=False):
    s, ma, dc = _raw_call(
        prof, acode, fwd, tgt, SUB, Mp1, steps, fwd_w, n_tiles, interpret
    )
    # harvest the answer lane on device: D2H shrinks from full rasters to
    # three [B] vectors
    idx = alen[:, None]
    pick = lambda arr: jnp.take_along_axis(arr, idx, axis=1)[:, 0]
    return pick(s), pick(ma), pick(dc)


def _raw_call(prof, acode, fwd, tgt, SUB, Mp1, steps, fwd_w, n_tiles, interpret=False):
    kernel = _make_kernel(SUB, Mp1, steps)
    shape = jax.ShapeDtypeStruct((n_tiles * SUB, Mp1), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n_tiles,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((_AA_N, SUB, Mp1), lambda p: (0, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, fwd_w), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp1), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, Mp1), jnp.int32),
            pltpu.VMEM((SUB, Mp1), jnp.int32),
            pltpu.VMEM((SUB, Mp1), jnp.int32),
        ],
    )(prof, acode, fwd, tgt)


def _round_up(x, m):
    return -(-x // m) * m


def batched_protein_align_pallas(a_codes, b_codes, a_len, b_len,
                                 sub_tile: int = 64, interpret: bool = False):
    """Drop-in for protein_align.batched_protein_align (TPU path).

    Returns the same dict of numpy arrays (distances etc. computed with the
    reference's float32 normalization on host).
    """
    a_codes = np.asarray(a_codes)
    b_codes = np.asarray(b_codes)
    a_len = np.asarray(a_len, np.int32)
    b_len = np.asarray(b_len, np.int32)
    B, M = a_codes.shape
    N = b_codes.shape[1]

    SUB = sub_tile
    Mp1 = _round_up(M + 1, LANE)
    Npad = _round_up(max(N, 1), LANE)
    steps = Mp1 + Npad
    fwd_w = _round_up(steps, 128)
    n_tiles = max(1, -(-B // SUB))
    Bp = n_tiles * SUB

    # prof_g[c, pair, i+1] = BLOSUM62[a[pair, i], c]
    prof_a = BLOSUM62[np.minimum(a_codes, _AA_N - 1)]  # [B, M, AA]
    prof_g = np.full((_AA_N, Bp, Mp1), _NEG, np.int32)
    prof_g[:, :B, 1 : M + 1] = np.transpose(prof_a, (2, 0, 1))
    acode = np.full((Bp, Mp1), 255, np.int32)
    acode[:B, 1 : M + 1] = a_codes
    # forward text stream: the char consumed at step d is fwd[d-1] = b[d-1]
    fwd = np.full((Bp, fwd_w), 255, np.int32)
    fwd[:B, :N] = b_codes
    tgt = np.ones((Bp, Mp1), np.int32)
    tgt[:B] = (a_len + b_len)[:, None]

    alen_p = np.zeros(Bp, np.int32)
    alen_p[:B] = a_len
    s, ma, dc = _call(
        jnp.asarray(prof_g),
        jnp.asarray(acode),
        jnp.asarray(fwd),
        jnp.asarray(tgt),
        jnp.asarray(alen_p),
        SUB,
        Mp1,
        steps,
        fwd_w,
        n_tiles,
        interpret,
    )
    mutual = np.asarray(s)[:B]
    matches = np.asarray(ma)[:B]
    diag = np.asarray(dc)[:B]
    # empty-side pairs
    empty = (a_len == 0) | (b_len == 0)
    mutual = np.where(empty, GAP_SCORE * np.maximum(a_len, b_len), mutual)
    matches = np.where(empty, 0, matches)
    diag = np.where(empty, 0, diag)

    mismatches = diag - matches
    gaps = a_len + b_len - 2 * diag
    length = matches + mismatches + gaps
    diag_scores = np.diag(BLOSUM62)
    mask_a = np.arange(M)[None, :] < a_len[:, None]
    mask_b = np.arange(b_codes.shape[1])[None, :] < b_len[:, None]
    self_a = np.where(mask_a, diag_scores[np.minimum(a_codes, _AA_N - 1)], 0).sum(axis=1)
    self_b = np.where(mask_b, diag_scores[np.minimum(b_codes, _AA_N - 1)], 0).sum(axis=1)
    selfscore = (self_a + self_b).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        normfactor = np.where(
            selfscore != 0, length.astype(np.float32) / selfscore.astype(np.float32), 0
        ).astype(np.float32)
    distance = (selfscore - 2 * mutual).astype(np.float32) * normfactor
    similarity = (2 * mutual).astype(np.float32) * normfactor
    return {
        "mutual": mutual,
        "selfscore": selfscore,
        "matches": matches,
        "mismatches": mismatches,
        "gaps": gaps,
        "length": length,
        "distance": distance,
        "similarity": similarity,
    }
