"""Pallas TPU kernel: batched protein global alignment (BLOSUM62, linear gap).

Anti-diagonal wavefront with the pair batch in sublanes and the pattern
(sequence A) dimension in lanes.  All carries ride in loop-carried
registers; VMEM scratch is touched only to materialize concrete initial
layouts.  The sliding text window uses only STATIC lane moves: the
incoming character streams from a 128-lane refill buffer (refilled every
128 steps with an aligned dynamic slice) consumed from lane 0 by a fixed
left-rotate, and the window itself advances with a fixed right-rotate —
Mosaic rejects unaligned dynamic slices and lowers dynamic-distance
rotates poorly.

Kernel v4: **virtual boundaries.**  Earlier versions stored the DP
boundary row (pattern position 0) in lane 0, which forced the lane extent
to round_up(M+1, 128) — for the engine's pow2 square buckets that meant a
whole wasted 128-lane chunk (M=256 -> 384 lanes) and proportionally more
steps.  v4 maps lane j to pattern position j+1 and synthesizes both DP
boundaries on the fly:

* the pattern-side boundary row enters through the lane-0 shift-in fills
  (the vertical predecessor fill at step d is gap*(d-1); the carried
  shifted diagonal reuses the previous step's fill, which is exactly the
  diagonal predecessor's boundary value), and
* the text-side boundary column (cell (i, 0) = gap*i) is written at lane
  d-1 on step d, where it seeds the next step's horizontal predecessor.

Lane extent drops to round_up(M, 128) and the step count to M+N-1
(measured 2.2x on v5e at the canonical 512x256x256 launch,
benchmarks/probe_protein_chain.py).  Carried over from v2/v3:

* **4-bit packed profile.**  BLOSUM62 values fit [-4, 11], so each
  per-position profile entry packs into 4 bits (bias +4).  The 27 residue
  planes collapse into 4 int32 planes of 8 nibbles each; the substitution
  score is extracted with one variable vector shift + mask instead of a
  27-way masked multiply-accumulate.

* **Packed stat state.**  The match-count and diagonal-step-count
  wavefronts always select the same traceback arm, so they ride ONE int32
  carry (dc in the high 16 bits, matches in the low 16).

* **Freeze-at-target** (v3): past each pair's final anti-diagonal the
  score/stat wavefronts stop updating instead of being copied to result
  carries — two fewer loop carries keeps Mosaic on the register-resident
  fast path (benchmarks/probe_protein_ablate.py).

v4 also computes the per-pair BLOSUM self-scores on device (a table
gather + masked sum over the already-shipped uint8 code arrays), so the
host post-processing is O(B) and the D2H readback is one [3, B] vector.

Kernel v5: **op diet** (three lossless trims, measured together ~1.3x):

* **5-bit clamped codes.**  All codes (27 residues + sentinel) clamp to
  [0, 31] on device before the kernel; the packed profile table carries
  32 nibble slots per word group, with sentinel columns scoring the
  benign -4 instead of -inf.  Correct because garbage cells (pattern pad
  lanes, text positions past blen, pre-arrival lanes) can never feed the
  harvested answer cell: DP dependencies flow forward in text index, the
  answer (alen, blen) freezes at its target diagonal, and each lane's
  pre-arrival garbage is overwritten by the text-side boundary write the
  step before its first real cell.  Kills the `valid` compare + select
  and the -2^24 boundary constant.
* **Tie-break restructure.**  `max(s_prev, s_prev_s) + gap` replaces the
  separate v_val/h_val adds, and `take_h = ~take_d & (s_prev >=
  s_prev_s)` replaces the h_val == best compare (equivalent: when the
  diagonal arm loses, horizontal wins exactly when it beats-or-ties the
  vertical arm).
* **Phase-split loop: measured NEGATIVE.**  The text-side boundary
  write only fires while d <= Mp and the freeze select cannot fire
  while d <= min(target_d), so splitting the loop to drop them looked
  like a free ~20% — but on v5e a static 2-way split measured 1.72 ms
  and a dynamic (SMEM min-target bound) 3-way split 1.9-4.3 ms, vs
  1.53 ms for the single static loop: Mosaic's hardware-loop path needs
  a single static trip count, and loop-boundary overhead exceeds the
  saved selects.  int16 carries are also a toolchain dead end: Mosaic
  rejects both `tpu.dynamic_rotate` ("Rotate with non-32-bit data") and
  `arith.maxsi` on int16 vectors (benchmarks/probe_int16_step.py).

Semantics identical to protein_align._protein_kernel (SeqAn tie-break:
diagonal > consume-B > consume-A); tested equal in interpret mode and on
device (reference: taxonpredictionmodelsequence.hh:173-242).
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
_BIAS = 4  # BLOSUM62 min is -4 -> nibble range [0, 15]
_CODES = 32  # 5-bit clamped code space: 27 residues + sentinel slots
_NWORDS = _CODES // 8  # 4 int32 words hold 32 nibbles
LANE = 128
_DC_ONE = np.int32(1 << 16)  # packed stats: dc in high 16 bits, ma in low


def _make_kernel(SUB: int, Mp: int, steps_end: int):
    gap = int(GAP_SCORE)

    def kernel(prof_ref, acode_ref, fwd_ref, tgt_ref, s_out, madc_out,
               i0_ref, i1_ref, i2_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, Mp), 1)
        target_d = tgt_ref[:]  # [SUB, Mp] (row-constant)

        # materialize the init diagonals through VMEM scratch so every loop
        # carry starts with a concrete (non-replicated) vector layout —
        # constant-folded inits trip a Mosaic relayout error otherwise
        i0_ref[:] = jnp.where(col == 0, gap, _NEG)  # s after step d=1: (1,0)
        i1_ref[:] = jnp.zeros((SUB, Mp), jnp.int32)
        i2_ref[:] = jnp.where(col == 0, 0, _NEG)  # shifted d=0 diag: (0,0)=0
        s0 = i0_ref[:]
        zero = i1_ref[:]
        sh0 = i2_ref[:]
        acode = acode_ref[:]
        pw = [prof_ref[w] for w in range(_NWORDS)]

        def make_body(with_tb: bool, with_freeze: bool):
            def body(d, carry):
                # sh_* carry the SHIFTED previous diagonals: the value
                # shifted at step d-1 for the vertical arm is exactly the
                # diagonal-shift needed at step d (including its lane-0
                # boundary fill gap*(d-2)), halving the lane-rotate count
                (s_prev, madc_prev, sh_s, sh_madc, bx, buf) = carry
                # sliding text window, all-static lane shifts (see module
                # doc); lane j consumes text char b[d-2-j] at step d
                k = d - 2
                base = pl.multiple_of((k // 128) * 128, 128)
                window = fwd_ref[:, pl.ds(base, 128)]
                # left-rotate by one == right-rotate by 127 (shift >= 0)
                buf = jnp.where((k % 128) == 0, window,
                                pltpu.roll(buf, 127, axis=1))
                newval = buf[:, 0:1]
                bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))

                # 4-bit packed profile extraction over the 5-bit clamped
                # code space: word = pw[bx >> 3], nibble = (word >>
                # ((bx & 7) * 4)) & 15, score = nibble - 4; sentinel codes
                # carry nibble 0 (= -4), sound per the v5 module note
                widx = jax.lax.shift_right_logical(bx, 3)
                word = jnp.where(widx == 1, pw[1], pw[0])
                word = jnp.where(widx == 2, pw[2], word)
                word = jnp.where(widx == 3, pw[3], word)
                nshift = jax.lax.shift_left(jnp.bitwise_and(bx, 7), 2)
                nib = jnp.bitwise_and(
                    jax.lax.shift_right_logical(word, nshift), 15)
                sub = nib - _BIAS
                is_match = (acode == bx).astype(jnp.int32)

                # vertical predecessor (consume an A char): lane-0 fill is
                # the pattern-boundary cell (0, d-1) = gap*(d-1)
                s_prev_s = jnp.where(col == 0, gap * (d - 1),
                                     pltpu.roll(s_prev, 1, axis=1))
                madc_prev_s = jnp.where(col == 0, 0,
                                        pltpu.roll(madc_prev, 1, axis=1))

                # v5 tie-break restructure: both gap arms add the same gap,
                # so best = max(diag, max(prev, prev_s) + gap); when the
                # diagonal loses, horizontal wins iff it beats-or-ties the
                # vertical arm (SeqAn order: diag > consume-B > consume-A)
                d_val = sh_s + sub
                best = jnp.maximum(d_val,
                                   jnp.maximum(s_prev, s_prev_s) + gap)
                take_d = d_val == best
                take_h = (~take_d) & (s_prev >= s_prev_s)

                new_s = best
                new_madc = jnp.where(
                    take_d,
                    sh_madc + is_match + _DC_ONE,
                    jnp.where(take_h, madc_prev, madc_prev_s),
                )

                if with_tb:
                    # text-side boundary: cell (d, 0) = gap*d lives at lane
                    # d-1 and seeds the next step's horizontal predecessor;
                    # no lane matches once d > Mp (phase 3 drops the select)
                    on_tb = col == (d - 1)
                    new_s = jnp.where(on_tb, gap * d, new_s)
                    new_madc = jnp.where(on_tb, 0, new_madc)

                if with_freeze:
                    # FREEZE past each pair's target diagonal instead of
                    # carrying separate result tiles: two fewer loop carries
                    # keeps Mosaic on the register-resident fast path
                    # (benchmarks/probe_protein_ablate.py); cannot fire
                    # while d <= min(target) (phase 1 drops the selects)
                    live = d <= target_d
                    new_s = jnp.where(live, new_s, s_prev)
                    new_madc = jnp.where(live, new_madc, madc_prev)
                return (new_s, new_madc, s_prev_s, madc_prev_s, bx, buf)

            return body

        init = (s0, zero, sh0, zero,
                zero + 31,               # bx: all-sentinel before step 2
                zero[:, 0:128] + 31)     # refill buffer (overwritten at k=0)
        # phase bounds from the batch min target (SMEM scalar): the
        # boundary write targets lane d-1 (inactive once d > Mp) and the
        # freeze can only fire once d exceeds some pair's target
        # single static-bound loop: phase-split experiments measured WORSE
        # on v5e (static 2-way split 1.72 ms, dynamic SMEM-bound 3-way
        # split 1.9-4.3 ms, vs 1.53 ms for this loop at the canonical
        # 512x256x256 launch) — Mosaic's hardware-loop path needs the
        # single static trip count, and the saved selects are cheaper
        # than the split overhead.  Kept: the with_tb/with_freeze body
        # parameterization documents which spans each select guards.
        out = jax.lax.fori_loop(2, steps_end + 1, make_body(True, True),
                                init)
        s_out[:] = out[0]
        madc_out[:] = out[1]

    return kernel


def _shapes(B, M, N, SUB):
    """Derived launch shapes for a [B] x (M, N) bucket."""
    Mp = _round_up(max(M, 1), LANE)
    steps_end = Mp + max(N, 1)  # last anti-diagonal index (cells (Mp, N))
    fwd_w = _round_up(steps_end, 128)
    n_tiles = max(1, -(-B // SUB))
    return Mp, steps_end, fwd_w, n_tiles


# ---------------------------------------------------------------------------
# Kernel v6: SWAR 2x16 packing — two pairs per int32 lane (hi/lo 16-bit
# halves).  Closes round-4 VERDICT item 1: the probe chain
# (benchmarks/probe_packed16.py core mix 2.16x; probe_packed16_real.py
# FULL mix incl. the two port blockers 1.74x) measured the win despite a
# higher source-op count — Mosaic op models are unreliable in both
# directions, so this was built probe-first.
#
# The two blockers, resolved:
#   * per-half variable-shift profile extraction: each half extracts its
#     own word (own 4-way select over its own profile planes — 8 planes
#     total, same bytes/pair as v5) and its own variable shift; no SWAR
#     saving here, but none needed — the core DP mix carries the win;
#   * packed-stat conflict: v5's single dc<<16|match carry per pair
#     cannot share a half, so v6 SPLITS the stats into two packed carries
#     (match16x2 and dc16x2) — per pair the op count is unchanged.
#
# Numeric discipline: all scores ride biased non-negative in their half,
# bias = steps_end + 8 (gap = -1, so any true cell >= -(steps_end)); the
# guard-bit requirement is bias + 11*Mp < 2^14 (BLOSUM62 max 11/char), so
# every engine bucket up to 1024x1024 fits and larger buckets fall back
# to v5.  Garbage (pre-arrival) lanes start at bias-1 and grow at most
# +11/step until the text-boundary write overwrites them the step before
# their first real cell (v5 argument), staying under the bound.
# Pair layout: rows [0:half) ride the LO halves, rows [half:2*half) the
# HI halves; results unpack and re-stack to the v5 [3, B] output contract.

_SWAR_MASK_LO = 0x0000FFFF
_SWAR_MASK_HI = -65536  # 0xFFFF0000 as int32


def _swar_fits(Mp: int, steps_end: int) -> bool:
    return (steps_end + 8) + 11 * Mp < (1 << 14)


def _make_kernel_swar(SUB: int, Mp: int, steps_end: int, bias: int):
    gap = int(GAP_SCORE)
    one2 = (1 << 16) | 1

    def _ge_mask(a, b):
        # packed per-half (a >= b) masks; halves biased non-negative
        d_lo = (a & _SWAR_MASK_LO) - (b & _SWAR_MASK_LO)
        lo_m = jnp.int32(_SWAR_MASK_LO) & ~(d_lo >> 31)
        d_hi = (a >> 16) - (b >> 16)
        hi_m = jnp.int32(_SWAR_MASK_HI) & ~(d_hi >> 31)
        return hi_m | lo_m

    def pmax(a, b):
        m = _ge_mask(a, b)
        return (a & m) | (b & ~m)

    def psel(m, t, f):
        return (t & m) | (f & ~m)

    def kernel(prof_lo_ref, prof_hi_ref, acode_ref, fwd_ref, tgt_ref,
               s_out, ma_out, dc_out, i0_ref, i1_ref, i2_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (SUB, Mp), 1)
        target2 = tgt_ref[:]  # packed per-half target diagonals
        # concrete initial layouts via VMEM scratch (v5 note: constant-
        # folded inits trip a Mosaic relayout error)
        i0_ref[:] = jnp.full((SUB, Mp), (bias + gap) * 0x10001, jnp.int32)
        i1_ref[:] = jnp.zeros((SUB, Mp), jnp.int32)
        i2_ref[:] = jnp.full((SUB, Mp), bias * 0x10001, jnp.int32)
        s0 = i0_ref[:]
        zero = i1_ref[:]
        sh0 = i2_ref[:]
        acode = acode_ref[:]  # packed: hi char << 16 | lo char
        pwl = [prof_lo_ref[w] for w in range(_NWORDS)]
        pwh = [prof_hi_ref[w] for w in range(_NWORDS)]

        def body(d, carry):
            (s_prev, ma_prev, dc_prev, sh_s, sh_ma, sh_dc, bx, buf) = carry
            k = d - 2
            base = pl.multiple_of((k // 128) * 128, 128)
            window = fwd_ref[:, pl.ds(base, 128)]
            buf = jnp.where((k % 128) == 0, window,
                            pltpu.roll(buf, 127, axis=1))
            newval = buf[:, 0:1]
            bx = jnp.where(col == 0, newval, pltpu.roll(bx, 1, axis=1))

            # per-half profile extraction (each half: own word select over
            # its own planes + own variable nibble shift)
            bx_lo = bx & _SWAR_MASK_LO
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
                (_BIAS << 16) | _BIAS)

            # per-half match increments
            x = acode ^ bx
            is_match2 = (
                jnp.where((x & _SWAR_MASK_HI) == 0, 1 << 16, 0)
                | jnp.where((x & _SWAR_MASK_LO) == 0, 1, 0)
            )

            fill_s = (bias + gap * (d - 1)) * 0x10001
            s_prev_s = jnp.where(col == 0, fill_s,
                                 pltpu.roll(s_prev, 1, axis=1))
            ma_prev_s = jnp.where(col == 0, 0,
                                  pltpu.roll(ma_prev, 1, axis=1))
            dc_prev_s = jnp.where(col == 0, 0,
                                  pltpu.roll(dc_prev, 1, axis=1))

            # v5 tie-break restructure, SWAR packed max via the HYBRID
            # trick: halves are non-negative and < 2^15, so a native
            # 32-bit max picks the correct HI half (the hi half dominates
            # the 32-bit compare) and only the LO half needs its own
            # masked max — 3-op packed max with a 2-op serial chain,
            # keeping the score recurrence (the kernel's one genuine
            # serial chain) near v5's length.  The tie-break ge masks
            # feed only the STATS selects, off the critical path.
            def hmax(a, b):
                lo = jnp.maximum(a & _SWAR_MASK_LO, b & _SWAR_MASK_LO)
                return (jnp.maximum(a, b) & _SWAR_MASK_HI) | lo

            d_val = sh_s + sub2
            vmax = hmax(s_prev, s_prev_s)
            gap_best = vmax - one2
            best = hmax(d_val, gap_best)
            new_s = best
            # stats masks (diag wins ties; when it loses, horizontal wins
            # iff it beat-or-tied vertical) — parallel to the score chain
            m_v = _ge_mask(s_prev, s_prev_s)
            eq_d = _ge_mask(d_val, gap_best)
            take_h = m_v & ~eq_d
            new_ma = psel(eq_d, sh_ma + is_match2,
                          psel(take_h, ma_prev, ma_prev_s))
            new_dc = psel(eq_d, sh_dc + one2,
                          psel(take_h, dc_prev, dc_prev_s))

            # text-side boundary write (same lane for both halves)
            on_tb = col == (d - 1)
            new_s = jnp.where(on_tb, (bias + gap * d) * 0x10001, new_s)
            new_ma = jnp.where(on_tb, 0, new_ma)
            new_dc = jnp.where(on_tb, 0, new_dc)

            # per-half freeze at each pair's own target diagonal
            live = _ge_mask(target2, d * one2)
            new_s = psel(live, new_s, s_prev)
            new_ma = psel(live, new_ma, ma_prev)
            new_dc = psel(live, new_dc, dc_prev)
            return (new_s, new_ma, new_dc, s_prev_s, ma_prev_s, dc_prev_s,
                    bx, buf)

        init = (s0, zero, zero, sh0, zero, zero,
                zero + ((31 << 16) | 31),
                zero[:, 0:128] + ((31 << 16) | 31))
        out = jax.lax.fori_loop(2, steps_end + 1, body, init)
        s_out[:] = out[0]
        ma_out[:] = out[1]
        dc_out[:] = out[2]

    return kernel


def _raw_call_swar(prof_lo, prof_hi, acode_p, fwd_p, tgt_p, SUB, Mp,
                   steps_end, fwd_w, n_tiles, bias, interpret=False):
    kernel = _make_kernel_swar(SUB, Mp, steps_end, bias)
    shape = jax.ShapeDtypeStruct((n_tiles * SUB, Mp), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=(n_tiles,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((_NWORDS, SUB, Mp), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NWORDS, SUB, Mp), lambda p: (0, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, fwd_w), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, Mp), jnp.int32),
            pltpu.VMEM((SUB, Mp), jnp.int32),
            pltpu.VMEM((SUB, Mp), jnp.int32),
        ],
    )(prof_lo, prof_hi, acode_p, fwd_p, tgt_p)


def _from_codes_swar(acode8, fwd8, ablen, alen, SUB, Mp, steps_end, fwd_w,
                     n_tiles, interpret=False):
    """SWAR front end: ships the same uint8 code arrays as v5 (rows
    [0:half) = LO halves, [half:2*half) = HI halves), packs on device,
    runs the 2x16 kernel, unpacks and re-stacks to the v5 [3, B] output
    (madc repacked as dc<<16|match so post() is shared verbatim)."""
    bias = steps_end + 8
    half = n_tiles * SUB
    a32 = jnp.minimum(acode8, _CODES - 1).astype(jnp.int32)
    f32_ = jnp.minimum(fwd8, _CODES - 1).astype(jnp.int32)
    a_lo, a_hi = a32[:half], a32[half:]
    acode_p = jax.lax.shift_left(a_hi, 16) | a_lo
    fwd_p = jax.lax.shift_left(f32_[half:], 16) | f32_[:half]
    packed = jnp.asarray(_PACKED)  # [NWORDS, CODES]
    prof_lo = packed[:, a_lo]
    prof_hi = packed[:, a_hi]
    abl = ablen.astype(jnp.int32)
    tgt_p = jax.lax.shift_left(abl[half:], 16) | abl[:half]
    tgt_p = jnp.broadcast_to(tgt_p[:, None], (half, Mp))
    s, ma, dc = _raw_call_swar(
        prof_lo, prof_hi, acode_p, fwd_p, tgt_p, SUB, Mp, steps_end,
        fwd_w, n_tiles, bias, interpret
    )
    mask16 = jnp.int32(0xFFFF)
    s_all = jnp.concatenate(
        [(s & mask16) - bias,
         (jax.lax.shift_right_logical(s, 16) & mask16) - bias]
    )
    ma_all = jnp.concatenate(
        [ma & mask16, jax.lax.shift_right_logical(ma, 16) & mask16]
    )
    dc_all = jnp.concatenate(
        [dc & mask16, jax.lax.shift_right_logical(dc, 16) & mask16]
    )
    madc_all = jax.lax.shift_left(dc_all, 16) | ma_all  # v5 post format
    # per-pair BLOSUM self-scores on device, identical to _from_codes
    dtab = jnp.asarray(_DIAG)
    blen = ablen - alen
    mask_a = jax.lax.broadcasted_iota(jnp.int32, a32.shape, 1) < alen[:, None]
    mask_b = jax.lax.broadcasted_iota(jnp.int32, f32_.shape, 1) < blen[:, None]
    self_a = jnp.where(mask_a & (a32 < _AA_N),
                       jnp.take(dtab, jnp.minimum(a32, _AA_N - 1)), 0)
    self_b = jnp.where(mask_b & (f32_ < _AA_N),
                       jnp.take(dtab, jnp.minimum(f32_, _AA_N - 1)), 0)
    selfscore = self_a.sum(axis=1) + self_b.sum(axis=1)
    idx = jnp.maximum(alen - 1, 0)[:, None]
    pick = lambda arr: jnp.take_along_axis(arr, idx, axis=1)[:, 0]
    return jnp.stack([pick(s_all), pick(madc_all), selfscore])


@functools.partial(
    jax.jit, static_argnames=("SUB", "Mp", "steps_end", "fwd_w", "n_tiles",
                              "interpret")
)
def _call_swar(acode8, fwd8, ablen, alen, SUB, Mp, steps_end, fwd_w,
               n_tiles, interpret=False):
    return _from_codes_swar(acode8, fwd8, ablen, alen, SUB, Mp, steps_end,
                            fwd_w, n_tiles, interpret)


@functools.partial(
    jax.jit, static_argnames=("SUB", "Mp", "steps_end", "fwd_w", "n_tiles",
                              "interpret")
)
def _call_pool_swar(pool, a_cols, b_cols, ablen, alen, SUB, Mp, steps_end,
                    fwd_w, n_tiles, interpret=False):
    """Pool-gather front end for the SWAR kernel (see _call_pool)."""
    pool_u = jax.lax.bitcast_convert_type(pool, jnp.uint8)
    acode8 = jnp.take(pool_u[:Mp], a_cols, axis=1).T
    fwd8 = jnp.take(pool_u[:fwd_w], b_cols, axis=1).T
    return _from_codes_swar(acode8, fwd8, ablen, alen, SUB, Mp, steps_end,
                            fwd_w, n_tiles, interpret)


@functools.partial(
    jax.jit, static_argnames=("SUB", "Mp", "steps_end", "fwd_w", "n_tiles",
                              "interpret")
)
def _call_pool(pool, a_cols, b_cols, ablen, alen, SUB, Mp, steps_end,
               fwd_w, n_tiles, interpret=False):
    """Device-pool front end: per-pair code rows are gathered from the
    CROSS-ROUND resident pool (ops/seqpool.py, bits=8 — protein codes are
    raw uint8, one per byte) — the round's H2D is just the new rows plus
    the small per-pair column/length vectors.  Pool pad (-1 = 0xFF) is the
    kernel sentinel, and pad content past each row's own length is
    harmless (see the selfscore masking note in _from_codes)."""
    pool_u = jax.lax.bitcast_convert_type(pool, jnp.uint8)
    acode8 = jnp.take(pool_u[:Mp], a_cols, axis=1).T  # [Bp, Mp]
    fwd8 = jnp.take(pool_u[:fwd_w], b_cols, axis=1).T  # [Bp, fwd_w]
    return _from_codes(acode8, fwd8, ablen, alen, SUB, Mp, steps_end,
                       fwd_w, n_tiles, interpret)


@functools.partial(
    jax.jit, static_argnames=("SUB", "Mp", "steps_end", "fwd_w", "n_tiles",
                              "interpret")
)
def _call(acode8, fwd8, ablen, alen, SUB, Mp, steps_end, fwd_w, n_tiles,
          interpret=False):
    return _from_codes(acode8, fwd8, ablen, alen, SUB, Mp, steps_end,
                       fwd_w, n_tiles, interpret)


def _from_codes(acode8, fwd8, ablen, alen, SUB, Mp, steps_end, fwd_w,
                n_tiles, interpret=False):
    """H2D ships only uint8 code arrays + per-pair lengths; the packed
    int32 profile (10x the bytes) is materialized ON DEVICE by a table
    gather, and all int32 widening happens device-side.  Codes clamp to
    the 5-bit kernel space here (sentinel 255 -> 31, see v5 note)."""
    acode = jnp.minimum(acode8, _CODES - 1).astype(jnp.int32)
    fwd = jnp.minimum(fwd8, _CODES - 1).astype(jnp.int32)
    packed = jnp.asarray(_PACKED)  # [NWORDS, CODES]
    prof = packed[:, acode]  # [NWORDS, Bp, Mp]
    tgt = jnp.broadcast_to(ablen[:, None], acode.shape).astype(jnp.int32)
    s, madc = _raw_call(
        prof, acode, fwd, tgt, SUB, Mp, steps_end, fwd_w, n_tiles, interpret
    )
    # per-pair BLOSUM self-scores, also on device: table gather + sum masked
    # by the real lengths (callers may pad with any byte, incl. valid codes)
    dtab = jnp.asarray(_DIAG)
    blen = ablen - alen
    mask_a = jax.lax.broadcasted_iota(jnp.int32, acode.shape, 1) < alen[:, None]
    mask_b = jax.lax.broadcasted_iota(jnp.int32, fwd.shape, 1) < blen[:, None]
    self_a = jnp.where(mask_a & (acode < _AA_N),
                       jnp.take(dtab, jnp.minimum(acode, _AA_N - 1)), 0)
    self_b = jnp.where(mask_b & (fwd < _AA_N),
                       jnp.take(dtab, jnp.minimum(fwd, _AA_N - 1)), 0)
    selfscore = self_a.sum(axis=1) + self_b.sum(axis=1)
    # harvest the answer lane on device AND stack: D2H shrinks from full
    # rasters to ONE [3, B] transfer (the tunnel has ~170 ms fixed latency
    # per readback).  The answer cell (alen, blen) sits at lane alen-1.
    idx = jnp.maximum(alen - 1, 0)[:, None]
    pick = lambda arr: jnp.take_along_axis(arr, idx, axis=1)[:, 0]
    return jnp.stack([pick(s), pick(madc), selfscore])


def _raw_call(prof, acode, fwd, tgt, SUB, Mp, steps_end, fwd_w, n_tiles,
              interpret=False):
    kernel = _make_kernel(SUB, Mp, steps_end)
    shape = jax.ShapeDtypeStruct((n_tiles * SUB, Mp), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=(n_tiles,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((_NWORDS, SUB, Mp), lambda p: (0, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, fwd_w), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Mp), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, Mp), jnp.int32),
            pltpu.VMEM((SUB, Mp), jnp.int32),
            pltpu.VMEM((SUB, Mp), jnp.int32),
        ],
    )(prof, acode, fwd, tgt)


def _round_up(x, m):
    return -(-x // m) * m


# nibble-packed BLOSUM column table over the 5-bit clamped code space:
# _PACKED[w, a] = int32 packing (BLOSUM62[a, 8w+j] + 4) << 4j for j in
# 0..7; sentinel rows/columns (codes >= 27) pack nibble 0 (score -4)
def _packed_table():
    tbl = np.zeros((_NWORDS, _CODES), np.int64)
    for a in range(_AA_N):
        for c in range(_AA_N):
            tbl[c // 8, a] |= (int(BLOSUM62[a, c]) + _BIAS) << (4 * (c % 8))
    return tbl.astype(np.uint32).view(np.int32).reshape(_NWORDS, _CODES)


_PACKED = _packed_table()
_DIAG = np.ascontiguousarray(np.diag(BLOSUM62)).astype(np.int32)


# the shared protein pool height class (seqpool): one class serves every
# ORF-scale bucket (Mp and fwd_w both slice a taller pool), so rows reuse
# across bucket sizes AND rounds; taller buckets get their own pow2 class
_POOL_HC_FLOOR = 1024


def batched_protein_align_pallas(a_codes, b_codes, a_len, b_len,
                                 sub_tile: int = 256, interpret: bool = False,
                                 lazy: bool = False, pool_cache=None,
                                 swar: bool | None = None):
    """Drop-in for protein_align.batched_protein_align (TPU path).

    Returns the same dict of numpy arrays (distances etc. computed with the
    reference's float32 normalization on host).  lazy=True returns a
    zero-arg finish closure instead (kernel dispatched immediately).
    pool_cache: optional ops.seqpool.DevicePoolCache — code rows stay
    device-resident across align rounds (bits=8: protein codes raw, one
    per byte); only rows not yet on device ship, and sparse buckets stop
    shipping [Bp(=tile-padded), Mp] dense arrays entirely.
    swar: force the 2x16 packed kernel on/off.  Default OFF: on v5e the
    packed kernel measured only 1.00-1.06x v5 per pair across three
    formulations (emulated max/select, reused-ge tie-break, hybrid
    native-max) — the round-4 probe's 2.16x was an artifact of comparing
    two layout-handicapped probe kernels (see docs/STATUS.md round 5).
    The kernel stays golden-pinned (tests/test_seqan_golden.py) and
    opt-in via TAXTK_PROTEIN_SWAR=1 should a future toolchain shift the
    balance; bench.py records its measured rate each round.
    """
    # uint8 coercion: the pool path (_dedupe_pool/_pack_text_pool) keys its
    # device cache on row bytes, so dtype must be pinned at the entry point
    # (as the Myers entry points do) or cache keys become caller-dependent
    a_codes = np.asarray(a_codes, dtype=np.uint8)
    b_codes = np.asarray(b_codes, dtype=np.uint8)
    a_len = np.asarray(a_len, np.int32)
    b_len = np.asarray(b_len, np.int32)
    B, M = a_codes.shape
    N = b_codes.shape[1]

    SUB = sub_tile
    Mp, steps_end, fwd_w, _nt = _shapes(B, M, N, SUB)
    if swar is None:
        import os

        swar = os.environ.get("TAXTK_PROTEIN_SWAR") == "1"
    swar = swar and _swar_fits(Mp, steps_end)
    if swar:
        # two pairs per lane: a tile serves 2*SUB pairs (rows [0:half) on
        # the LO halves, [half:2*half) on the HI halves)
        n_tiles = max(1, -(-B // (2 * SUB)))
        Bp = 2 * n_tiles * SUB
    else:
        n_tiles = _nt
        Bp = n_tiles * SUB

    ablen = np.ones(Bp, np.int32)
    ablen[:B] = a_len + b_len
    alen_p = np.zeros(Bp, np.int32)
    alen_p[:B] = a_len

    if pool_cache is not None:
        from .pallas_myers import _dedupe_pool, _pow2

        pool = _dedupe_pool(a_codes, b_codes, a_len, b_len)
        rows, plen, idx_a, idx_b, keys = pool
        Hc = max(_pow2(max(Mp, fwd_w)), _POOL_HC_FLOOR)
        pool_dev, slots = pool_cache.ensure(8, Hc, keys, rows, plen)
        a_cols = np.zeros(Bp, np.int32)
        b_cols = np.zeros(Bp, np.int32)
        a_cols[:B] = slots[idx_a]
        b_cols[:B] = slots[idx_b]
        call = _call_pool_swar if swar else _call_pool
        stacked = call(
            pool_dev,
            jnp.asarray(a_cols),
            jnp.asarray(b_cols),
            jnp.asarray(ablen),
            jnp.asarray(alen_p),
            SUB,
            Mp,
            steps_end,
            fwd_w,
            n_tiles,
            interpret,
        )
    else:
        # uint8 host arrays only — profile/widening happen on device
        # (_call); lane j holds pattern position j+1 (virtual boundaries,
        # see module doc)
        acode = np.full((Bp, Mp), 255, np.uint8)
        acode[:B, 0:M] = a_codes
        # forward text stream: char consumed at lane 0 on step d is b[d-2]
        fwd = np.full((Bp, fwd_w), 255, np.uint8)
        fwd[:B, :N] = b_codes
        call = _call_swar if swar else _call
        stacked = call(
            jnp.asarray(acode),
            jnp.asarray(fwd),
            jnp.asarray(ablen),
            jnp.asarray(alen_p),
            SUB,
            Mp,
            steps_end,
            fwd_w,
            n_tiles,
            interpret,
        )
    def post(st):
        st = np.asarray(st)
        mutual = st[0, :B]
        madc = st[1, :B]
        selfscore = st[2, :B].astype(np.int64)
        matches = madc & 0xFFFF
        diag = madc >> 16
        # empty-side pairs
        empty = (a_len == 0) | (b_len == 0)
        mutual = np.where(empty, GAP_SCORE * np.maximum(a_len, b_len), mutual)
        matches = np.where(empty, 0, matches)
        diag = np.where(empty, 0, diag)

        mismatches = diag - matches
        gaps = a_len + b_len - 2 * diag
        length = matches + mismatches + gaps
        with np.errstate(divide="ignore", invalid="ignore"):
            normfactor = np.where(
                selfscore != 0,
                length.astype(np.float32) / selfscore.astype(np.float32),
                0,
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

    if lazy == "device":
        return stacked, post
    if lazy:
        from .myers_batch import start_host_copy

        start_host_copy(stacked)
        return lambda: post(np.asarray(stacked))
    return post(np.asarray(stacked))
