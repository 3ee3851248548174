"""Pallas TPU kernel: bit-parallel Myers edit distance over pair batches.

TPU mapping of myers_batch.py (same exact semantics): pairs tile into
(8 sublane x 128 lane) blocks so each uint32 lane carries one pair's
32-cell DP block; the grid is (pair_tiles, text_chunks) with the text
dimension sequential — Pv/Mv/score state lives in VMEM scratch across
chunks, so arbitrarily long texts stream through a bounded VMEM window.

Source-op count per (text char x 32-cell pattern block): peq select
chain 10 (4 cmp+select pairs + the sentinel reject), core Myers
recurrences 13 (eq/xv/add/xh/ph/mh/new_pv/new_mv), score-harvest
accumulate 4 (single-bit hmask hits OR-fold across pattern words),
carry shifts 6 — ~33 source ops per 32 cells, versus ~12 ops/cell for
the wavefront formulation.

Roofline history (bench.py): the source-op model (3.85e12 VPU op/s /
1.03 ops/cell = 3.7e3 GCUPS) was FALSIFIED in round 3 — the 4-char-
unrolled kernel delivered 4.3e3 GCUPS (117%), so Mosaic issues fewer
ISA ops than the source count (fusion), and a dependency-free probe of
the same mix sustains only 3.0e12 op/s (benchmarks/probe_vpu_peak.py).
The bench now bounds against the ~20 essential core-recurrence ops
only (~6.2e3 GCUPS); see bench.py for the exact model.

The serial ph/mh carry chain across pattern words is the limiter the
unroll attacks: 4 text chars per fori_loop trip interleave 4 carry
chains (char j+1's word-k step needs only char j's word-k state, ready
K-1 words earlier), measured 1.43x at the canonical launch
(benchmarks/probe_unroll2.py: 1949 -> 2637/2811 GCUPS interleaved A/B;
full bench 2506 -> 4319 median-of-5).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .myers_batch import _precompute, build_peq, ALPHA, WORD

LANE = 128
DEFAULT_SUB = 8
# canonical launch shapes: a fixed pair-tile group per kernel call and
# pow2-padded K / text chunks keep the set of compiled variants tiny
# (remote TPU compiles are expensive; see also the persistent cache below)
GROUP_TILES = 8


def _pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


def _quant_chunks(n: int) -> int:
    """Round a text-chunk count up to {4,5,6,7}*2^e (quarter-octave).

    The chunk count is a jit static, so every value is one compiled
    variant — but the kernel RUNS every padded chunk, and pow2 rounding
    wastes up to ~2x steps (measured on chip at 16x50kbp systolic: 128
    chunks padded vs 99 needed cost 12.6% wall, /tmp probe_stage_attr
    round 5).  Quarter-octave keeps the pad <= 25% (mean ~11%) for ~3x
    the ladder points; compiles persist across processes via the jax
    compilation cache (ops/__init__), so the extra points are one-time.
    """
    if n <= 4:
        return n
    e = max(0, n.bit_length() - 3)
    while (7 << e) < n:
        e += 1
    for m in (4, 5, 6, 7):
        if (m << e) >= n:
            return m << e
    raise AssertionError("unreachable")


def _pack_text(text, N, B, Np, Bp, n_tiles, SUB, bits=4):
    """[N, B] u8 codes (sentinel 31) -> [Np*bits//8, tiles*SUB, LANE] i8
    with 2 (bits=4) or 4 (bits=2) codes per byte, lowest field = even text
    position.  bits=4: the sentinel maps to nibble 15, which the kernel's
    `tc >= ALPHA` check rejects the same way.  bits=2 (caller guarantees
    every real code < 4): pad fields read as code 3 but the kernel harvests
    each pair's result exactly at its own text end, so pad is inert.  Text
    is the largest wire array; packing cuts its H2D 2x/4x."""
    cpb = 8 // bits
    sent = (1 << bits) - 1
    packed = np.full((Np // cpb, Bp), 0xFF, np.uint8)
    t = np.minimum(text, sent)
    if N % cpb:
        t = np.concatenate(
            [t, np.full((cpb - N % cpb, t.shape[1]), sent, np.uint8)]
        )
    merged = t[0::cpb].copy()
    for f in range(1, cpb):
        merged |= t[f::cpb] << (bits * f)
    packed[: t.shape[0] // cpb, :B] = merged
    return packed.view(np.int8).reshape(Np // cpb, n_tiles * SUB, LANE)


def _quantize_K(K: int) -> int:
    """Quantize the pattern block count to a small launch-shape set
    (zero peq/hmask pad blocks are inert): {1,2,3,4,8,16,24,32,64} then
    multiples of 64.  Each distinct K is one (expensive remote) compile.
    The VMEM budget is ~56KB/K (peq + hmask + Pv/Mv, double-buffered):
    K=192 — the aligner's 6144bp pattern cap — fits in ~12MB, while a
    pow2 jump to 256 would exceed the 16MB scoped-vmem limit."""
    if K > 64:
        return -(-K // 64) * 64
    if K > 32:
        return 64
    if K > 4:
        return -(-K // 8) * 8
    return K


def _make_kernel(K: int, Tc: int, n_chunks: int, SUB: int, bits: int = 4):
    UNROLL = 4 if Tc % 4 == 0 else 1

    def kernel(
        peq_ref,  # [K, ALPHA, SUB, LANE] u32
        text_ref,  # [Tc*bits//8, SUB, LANE] i8 — 2 (bits=4) or 4 (bits=2)
        #            codes per byte (H2D through the host tunnel is the
        #            engine bottleneck; packing shrinks the dominant wire
        #            term; bits=2 is valid for N-free buckets because the
        #            result is harvested exactly at j == n_len, so pad
        #            codes past each text's end are inert)
        nlen_ref,  # [SUB, LANE] i32
        mlen_ref,  # [SUB, LANE] i32
        out_ref,  # [SUB, LANE] i32
        pv_ref,  # scratch [K, SUB, LANE] u32
        mv_ref,  # scratch [K, SUB, LANE] u32
        score_ref,  # scratch [SUB, LANE] i32
        res_ref,  # scratch [SUB, LANE] i32
        hmask_ref,  # scratch [K, SUB, LANE] u32 — derived from mlen at init
        #            (single bit at the pattern's last cell), replacing a
        #            K*4-byte/pair host input
    ):
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

        # the whole per-chunk state rides in loop-carried registers; VMEM
        # scratch is only touched at chunk boundaries so the inner loop is a
        # pure register/VPU dependency chain with pipelined peq/text loads.
        # UNROLL text chars per loop trip: the Myers recurrence serializes
        # on the ph/mh carry across pattern words (~7 dependent ops x K per
        # char — at K=64 the chain is ~86% of the issue-bound time), while
        # char j+1's word-k step only needs char j's word-k state, which is
        # ready K-1 words earlier in program order.  Unrolling interleaves
        # the chains so the 4 VPU ALUs stay fed (measured 1.43x at the
        # canonical 8192x2048 launch, benchmarks/probe_unroll2.py; 4 and 8
        # measured equal, so the smaller variant wins on VMEM/compile).
        # Tc is always a multiple of 4 (text packing pads to it).
        def one_char(jj, pvs, mvs, score, res):
            if bits == 2:
                packed = text_ref[jj >> 2].astype(jnp.int32)
                tc = (packed >> ((jj & 3) * 2)) & 3
            else:
                packed = text_ref[jj >> 1].astype(jnp.int32)
                tc = (packed >> ((jj & 1) * 4)) & 15
            # score-harvest diet: hm is a SINGLE bit in exactly one word k
            # per pair, so the per-word masked bits OR-accumulate losslessly
            # into one register each and the (!=0 -> +-1) evaluation happens
            # ONCE per text char instead of once per pattern word (saves
            # ~4 VPU ops per word-step; see the op count in the module doc)
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
                if bits != 2:  # 2-bit codes are always < ALPHA (no sentinel)
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


def _make_kernel_chunked(K: int, Tc: int, n_chunks: int, SUB: int,
                         bits: int = 4):
    """Pattern-block-chunked variant: processes ONE block of K pattern
    words per launch; the inter-word carry bits at the block boundary are
    read from / written to a per-text-position carry stream (hin/hout,
    packed ph | mh<<1 in int8), so patterns of ANY length run as a
    sequence of launches with all DP state device-resident.  Score/result
    ride through the launches as functional inputs/outputs; only the
    final block's launch leaves the true scores in `res` (earlier
    launches' harvests are overwritten)."""
    UNROLL = 4 if Tc % 4 == 0 else 1

    def kernel(
        peq_ref,    # [K, ALPHA, SUB, LANE] u32 (this block's pattern words)
        text_ref,   # [Tc//2, SUB, LANE] i8 — two 4-bit codes per byte
        mword_ref,  # [SUB, LANE] i32  pattern-end word index RELATIVE to this
        #            block (outside [0,K) when the pattern ends elsewhere)
        mbit_ref,   # [SUB, LANE] i32  pattern-end bit within that word
        nlen_ref,   # [SUB, LANE] i32
        sin_ref,    # [SUB, LANE] i32  score carried across launches
        rin_ref,    # [SUB, LANE] i32  result carried across launches
        hin_ref,    # [Tc, SUB, LANE] i8  carry bits from the previous block
        sout_ref,   # [SUB, LANE] i32
        rout_ref,   # [SUB, LANE] i32
        hout_ref,   # [Tc, SUB, LANE] i8  carry bits for the next block
        pv_ref,     # scratch [K, SUB, LANE] u32
        mv_ref,     # scratch [K, SUB, LANE] u32
        score_ref,  # scratch [SUB, LANE] i32
        res_ref,    # scratch [SUB, LANE] i32
        hmask_ref,  # scratch [K, SUB, LANE] u32 — built from mword/mbit
    ):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            pv_ref[:] = jnp.full((K, SUB, LANE), 0xFFFFFFFF, jnp.uint32)
            mv_ref[:] = jnp.zeros((K, SUB, LANE), jnp.uint32)
            score_ref[:] = sin_ref[:]
            res_ref[:] = rin_ref[:]
            kk = mword_ref[:]
            one = jnp.full((SUB, LANE), 1, jnp.uint32)
            bit = one << mbit_ref[:].astype(jnp.uint32)
            for k in range(K):
                hmask_ref[k] = jnp.where(kk == k, bit, jnp.uint32(0))

        n_len = nlen_ref[:]
        base_j = t * Tc

        # UNROLL chars per trip to interleave the serial ph/mh carry
        # chains (see the single-launch kernel's note)
        def one_char(jj, pvs, mvs, score, res):
            if bits == 2:
                packed = text_ref[jj >> 2].astype(jnp.int32)
                tc = (packed >> ((jj & 3) * 2)) & 3
            else:
                packed = text_ref[jj >> 1].astype(jnp.int32)
                tc = (packed >> ((jj & 1) * 4)) & 15
            hpack = hin_ref[jj].astype(jnp.int32)
            carry_ph = (hpack & 1).astype(jnp.uint32)
            carry_mh = ((hpack >> 1) & 1).astype(jnp.uint32)
            # score-harvest diet: OR-accumulate the single-bit masked hits
            # across pattern words, evaluate +-1 once per char (see the
            # single-launch kernel)
            ph_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            mh_hit = jnp.zeros((SUB, LANE), jnp.uint32)
            new_pvs = []
            new_mvs = []
            for k in range(K):
                eq0 = peq_ref[k, 0]
                for c in range(1, 4 if bits == 2 else ALPHA):
                    eq0 = jnp.where(tc == c, peq_ref[k, c], eq0)
                if bits != 2:  # 2-bit codes are always < ALPHA (no sentinel)
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
            hout_ref[jj] = (carry_ph | (carry_mh << 1)).astype(jnp.int8)
            delta = (ph_hit != 0).astype(jnp.int32) - (
                mh_hit != 0
            ).astype(jnp.int32)
            j = base_j + jj + 1
            # freeze the score past each pair's own text end: the carried
            # score is re-harvested at j == n_len by EVERY later launch, so
            # it must not keep evolving over pad text (the single-launch
            # kernel can let it drift because its harvest happens once)
            score = score + jnp.where(j <= n_len, delta, 0)
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
            sout_ref[:] = score
            rout_ref[:] = res

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("K", "Tc", "n_chunks", "n_tiles", "SUB", "interpret",
                     "bits"),
)
def _call_chunked(peq, text, mword, mbit, nlen, score, res, hbuf,
                  K, Tc, n_chunks, n_tiles, SUB, interpret=False, bits=4):
    return _pallas_chunked(peq, text, mword, mbit, nlen, score, res, hbuf,
                           K, Tc, n_chunks, n_tiles, SUB, interpret, bits)


@functools.partial(jax.jit, static_argnames=("n_tiles", "SUB"))
def _gather_text(text_u, txt_idx, n_tiles, SUB):
    """Materialize the per-pair tiled text from the pool ONCE; the gathered
    array is reused by every pattern-block launch (txt_idx/text_u never
    change across blocks — re-gathering per block was pure waste)."""
    S = n_tiles * SUB
    return jnp.take(text_u, txt_idx, axis=1).reshape(-1, S, LANE)


@functools.partial(
    jax.jit,
    static_argnames=("K", "Tc", "n_chunks", "n_tiles", "SUB", "interpret",
                     "bits"),
)
def _call_chunked_gather(peq_u, text, pat_idx, mword, mbit, nlen,
                         score, res, hbuf,
                         K, Tc, n_chunks, n_tiles, SUB, interpret=False,
                         bits=4):
    """Pool-gather front end for the pattern-block-chunked kernel: long-text
    buckets are often pair-sparse (the cell budget caps real pairs far below
    the tile width), so shipping [text, Bp]-wide arrays is mostly padding.
    The peq pool gathers per block; `text` arrives already gathered
    (_gather_text) since it is block-invariant."""
    S = n_tiles * SUB
    peq = jnp.take(peq_u, pat_idx, axis=2).reshape(K, ALPHA, S, LANE)
    return _pallas_chunked(peq, text, mword, mbit, nlen, score, res, hbuf,
                           K, Tc, n_chunks, n_tiles, SUB, interpret, bits)


def _pallas_chunked(peq, text, mword, mbit, nlen, score, res, hbuf,
                    K, Tc, n_chunks, n_tiles, SUB, interpret=False, bits=4):
    kernel = _make_kernel_chunked(K, Tc, n_chunks, SUB, bits)
    B2 = jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32)
    H = jax.ShapeDtypeStruct(hbuf.shape, jnp.int8)
    bspec = pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(B2, B2, H),
        grid=(n_tiles, n_chunks),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(
                (K, ALPHA, SUB, LANE), lambda p, t: (0, 0, p, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Tc * bits // 8, SUB, LANE), lambda p, t: (t, p, 0),
                memory_space=pltpu.VMEM
            ),
            bspec,
            bspec,
            bspec,
            bspec,
            bspec,
            pl.BlockSpec((Tc, SUB, LANE), lambda p, t: (t, p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            bspec,
            bspec,
            pl.BlockSpec((Tc, SUB, LANE), lambda p, t: (t, p, 0), memory_space=pltpu.VMEM),
        ),
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
    )(peq, text, mword, mbit, nlen, score, res, hbuf)


# chunked-path shape constants: 64-word (2048bp) pattern blocks — the
# measured sweet spot (benchmarks/probe_myers_blocks.py: 64 words 2x
# faster than 128, register pressure); pattern/text caps bound the H2D
# of one bucket
CHUNK_KC = 64
LONG_PATTERN_CAP = 98304   # 768 words = 6 chunked launches of 128 words
LONG_TEXT_CAP = 262144


def batched_edit_distance_pallas_myers_long(
    a_codes, b_codes, a_len, b_len,
    text_chunk: int = 512, interpret: bool = False, sub_tile: int = DEFAULT_SUB,
    block_words: int = CHUNK_KC, lazy: bool = False,
    pool_gather: bool | None = None, pool_cache=None,
):
    """Pattern-block-chunked TPU path for pairs whose pattern exceeds the
    single-launch VMEM budget (aligner routes min-side > 6144bp here).
    Same exact semantics as batched_edit_distance_pallas_myers."""
    a_codes = np.asarray(a_codes, dtype=np.uint8)
    b_codes = np.asarray(b_codes, dtype=np.uint8)
    a_len = np.asarray(a_len, np.int32)
    b_len = np.asarray(b_len, np.int32)
    B = a_codes.shape[0]
    swap = a_len > b_len
    m_len = np.where(swap, b_len, a_len).astype(np.int32)
    n_len = np.where(swap, a_len, b_len).astype(np.int32)
    N = int(n_len.max(initial=1))
    K = max(1, -(-int(m_len.max(initial=1)) // WORD))

    Kb = block_words
    n_blocks = max(1, -(-K // Kb))
    Kp = n_blocks * Kb

    SUB = sub_tile
    TILE = SUB * LANE
    n_tiles = max(1, -(-B // TILE))
    if not interpret:
        n_tiles = 1 if n_tiles == 1 else GROUP_TILES
    Bp = n_tiles * TILE
    Tc = max(4, min(text_chunk, _pow2(max(1, N))))
    Tc += (-Tc) % 4  # packed text stores up to four positions per byte
    n_chunks = max(1, -(-N // Tc))
    if not interpret:
        n_chunks = _quant_chunks(n_chunks)
    Np = n_chunks * Tc

    def tile_pairs(arr, fill, dtype):
        out = np.full(arr.shape[:-1] + (Bp,), fill, dtype)
        out[..., :B] = arr
        return out.reshape(arr.shape[:-1] + (n_tiles * SUB, LANE))

    mlen_t = tile_pairs(m_len[None, :], 1, np.int32)[0]
    nlen_t = tile_pairs(n_len[None, :], 1, np.int32)[0]
    # pattern-end word/bit (the kernel derives the high-bit mask on device;
    # shipping the full [K, B] u32 hmask was K*4 bytes/pair of H2D)
    mword_t = (mlen_t - 1) >> 5
    mbit_t = (mlen_t - 1) & 31
    nlen_d = jnp.asarray(nlen_t)
    mbit_d = jnp.asarray(mbit_t)

    score = jnp.asarray(mlen_t)
    res = jnp.asarray(np.maximum(mlen_t, nlen_t))
    # block-boundary carries: ph=1, mh=0 above the first pattern word
    hbuf = jnp.ones((Np, n_tiles * SUB, LANE), jnp.int8)

    # pool-gather: long-text buckets are usually pair-sparse (the aligner's
    # cell budget caps real pairs), so pool-sized wire arrays cut the
    # dominant text H2D by the tile fill factor on top of sequence reuse
    pool = None
    if pool_gather is None:
        pool_gather = not interpret
    if pool_gather:
        # same cap rationale as the single-launch entry: with a cross-round
        # cache, dense unique buckets still belong on the pool path (H2D =
        # new rows only; the dense fallback pays the host peq build)
        cap = (
            None
            if (interpret or pool_cache is not None)
            else max(128, Bp // 2)
        )
        pool = _dedupe_pool(a_codes, b_codes, a_len, b_len, max_rows=cap)

    if pool is not None:
        rows, plen, idx_a, idx_b, keys = pool
        Up = max(8 if interpret else 128, _pow2(len(rows)))
        bits = 2 if all(int(r.max(initial=0)) < 4 for r in rows) else 4
        if pool_cache is not None:
            from .seqpool import DevicePoolCache

            Hc = max(DevicePoolCache.height_class(Np), _pow2(Kp * WORD))
            pool_dev, slots = pool_cache.ensure(bits, Hc, keys, rows, plen)
            pat_idx, txt_idx, plen_pat, _, _, _ = _pool_indices(
                plen, idx_a, idx_b, swap, B, Bp, Kp, Up
            )
            pat_cols = np.zeros(Up, np.int32)
            pat_cols[: len(slots)] = slots
            cpb = 8 // bits
            pat_idx_d = jnp.asarray(pat_idx)
            text_d = _gather_text_pool(
                pool_dev, jnp.asarray(slots[txt_idx]), n_tiles, SUB,
                Np // cpb,
            )
            peq_dev = _peq_from_pool(
                pool_dev, jnp.asarray(pat_cols), jnp.asarray(plen_pat),
                Kp, bits, Kp * WORD // cpb,
            )
        else:
            pat_u, plen_pat, text_u, pat_idx, txt_idx = _build_pool_wire(
                rows, plen, idx_a, idx_b, swap, B, Bp, Kp, Np, Up, bits
            )
            pat_idx_d = jnp.asarray(pat_idx)
            text_d = _gather_text(jnp.asarray(text_u), jnp.asarray(txt_idx),
                                  n_tiles, SUB)
            # peq planes built ON DEVICE from the packed codes (the [K,5,Up]
            # u32 peq was the dominant wire term), then sliced per block
            # device-side — no per-block H2D at all
            peq_dev = _peq_from_codes(jnp.asarray(pat_u),
                                      jnp.asarray(plen_pat), Kp, bits)
        for p in range(n_blocks):
            score, res, hbuf = _call_chunked_gather(
                peq_dev[p * Kb : (p + 1) * Kb],
                text_d,
                pat_idx_d,
                jnp.asarray(mword_t - p * Kb),
                mbit_d,
                nlen_d,
                score,
                res,
                hbuf,
                Kb,
                Tc,
                n_chunks,
                n_tiles,
                SUB,
                interpret,
                bits,
            )
    else:
        peq, text, _hmask, m_len, n_len, _K = _precompute(
            a_codes, b_codes, a_len, b_len
        )
        if Kp > peq.shape[0]:
            peq = np.concatenate(
                [peq, np.zeros((Kp - peq.shape[0],) + peq.shape[1:], np.uint32)]
            )
        bits = 2 if int(max(a_codes.max(initial=0),
                            b_codes.max(initial=0))) < 4 else 4
        peq_t = tile_pairs(peq, 0, np.uint32)    # [Kp, A, tiles*SUB, LANE]
        text_t = jnp.asarray(
            _pack_text(text, text.shape[0], B, Np, Bp, n_tiles, SUB, bits)
        )
        for p in range(n_blocks):
            score, res, hbuf = _call_chunked(
                jnp.asarray(peq_t[p * Kb : (p + 1) * Kb]),
                text_t,
                jnp.asarray(mword_t - p * Kb),
                mbit_d,
                nlen_d,
                score,
                res,
                hbuf,
                Kb,
                Tc,
                n_chunks,
                n_tiles,
                SUB,
                interpret,
                bits,
            )

    def post(host):
        out = np.asarray(host).reshape(Bp)[:B]
        return np.where(m_len == 0, n_len, out)

    if lazy == "device":
        return res, post
    if lazy:
        from .myers_batch import start_host_copy

        start_host_copy(res)
        return lambda: post(np.asarray(res))
    return post(np.asarray(res))


def _dedupe_pool(a_codes, b_codes, a_len, b_len, max_rows=None):
    """Row-dedupe both pair sides into one sequence pool.

    Returns (rows, lens, idx_a, idx_b, keys): `rows` is a list of 1-D uint8
    code arrays (trimmed to each sequence's own length), `idx_a[i]`/
    `idx_b[i]` index the pool entry backing pair i's a/b side, `keys` are
    the content keys (for the cross-round device pool cache, ops/seqpool.py).
    RPA re-aligns the same query/anchor/candidate segments across many pairs
    (pass 0 shares the query, pass 1/2 share anchors), so the pool is
    materially smaller than 2B rows — and, more importantly, the device
    wire arrays become pool-sized instead of padded-pair-group-sized.

    max_rows: short-circuit — return None as soon as the pool exceeds this
    many rows (the caller would discard a pool that wide anyway; hashing
    every byte of a dense unique-pair bucket is pure host overhead).

    Keys include the row length: both sides are uint8 (enforced by the
    public entry points), but byte-identical prefixes of different logical
    lengths must not collide."""
    B = a_codes.shape[0]
    seen: dict = {}
    rows = []
    lens = []
    keys = []
    idx = np.empty(2 * B, np.int32)
    for j, (codes, ls) in enumerate(((a_codes, a_len), (b_codes, b_len))):
        for i in range(B):
            L = int(ls[i])
            key = (L, codes[i, :L].tobytes())
            u = seen.get(key)
            if u is None:
                u = len(rows)
                if max_rows is not None and u >= max_rows:
                    return None
                seen[key] = u
                rows.append(codes[i, :L])
                lens.append(L)
                keys.append(key)
            idx[j * B + i] = u
    return rows, np.asarray(lens, np.int32), idx[:B], idx[B:], keys


def _pool_indices(plen, idx_a, idx_b, swap, B, Bp, K, Up):
    """Per-pair pool indices + per-entry pattern lengths shared by the
    host-packed and device-pool wire paths."""
    pat_idx = np.zeros(Bp, np.int32)
    txt_idx = np.zeros(Bp, np.int32)
    pat_idx[:B] = np.where(swap, idx_b, idx_a)
    txt_idx[:B] = np.where(swap, idx_a, idx_b)
    U = len(plen)
    pat_used = np.zeros(U, bool)
    txt_used = np.zeros(U, bool)
    pat_used[pat_idx[:B]] = True
    txt_used[txt_idx[:B]] = True
    # pattern codes read to the pattern extent (K*WORD), independent of
    # the (possibly much taller) text pool height
    plen_cap = np.minimum(plen, K * WORD).astype(np.int32)
    plen_pat = np.where(pat_used[:U], plen_cap[:U], 0)
    plen_pat = np.concatenate([plen_pat, np.zeros(Up - U, np.int32)])
    return pat_idx, txt_idx, plen_pat, plen_cap, pat_used, txt_used


def _build_pool_wire(rows, plen, idx_a, idx_b, swap, B, Bp, K, Np, Up,
                     bits=4):
    """Shared pool->wire construction for the single-launch and
    pattern-block-chunked entry points: per-pair pool indices, used-entry
    masks, the packed PATTERN CODES pool (peq planes are built on device —
    shipping [K, ALPHA, Up] u32 peq was the dominant wire term after the
    text packing, and packed codes are 2.5x/1.25x smaller at bits=2/4),
    and the packed text pool."""
    pat_idx, txt_idx, plen_pat, plen_cap, pat_used, txt_used = _pool_indices(
        plen, idx_a, idx_b, swap, B, Bp, K, Up
    )
    pat_u = _pack_text_pool(rows, plen_cap, pat_used, K * WORD, Up, bits)
    text_u = _pack_text_pool(rows, plen, txt_used, Np, Up, bits)
    return pat_u, plen_pat, text_u, pat_idx, txt_idx


@functools.partial(
    jax.jit,
    static_argnames=("K", "Tc", "n_chunks", "n_tiles", "SUB", "interpret",
                     "bits"),
)
def _call_pool(pool, txt_cols, pat_cols, plen_pat, pat_idx, nlen, mlen,
               K, Tc, n_chunks, n_tiles, SUB, interpret=False, bits=4):
    """Device-pool front end (single-launch kernel): text and pattern
    columns are gathered straight from the CROSS-ROUND resident pool
    (ops/seqpool.py) — the round's H2D is just the new rows plus these
    small index vectors.  A column packed at the pool height sliced to the
    first Np//cpb (or K*WORD//cpb) rows IS the packing at that height."""
    cpb = 8 // bits
    S = n_tiles * SUB
    Np = n_chunks * Tc
    text = jnp.take(pool[: Np // cpb], txt_cols, axis=1).reshape(-1, S, LANE)
    pat_u = jnp.take(pool[: K * WORD // cpb], pat_cols, axis=1)
    peq_u = _peq_from_codes(pat_u, plen_pat, K, bits)
    peq = jnp.take(peq_u, pat_idx, axis=2).reshape(K, ALPHA, S, LANE)
    return _pallas_single(
        peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB, interpret,
        bits=bits,
    )


@functools.partial(jax.jit, static_argnames=("n_tiles", "SUB", "np_rows"))
def _gather_text_pool(pool, txt_cols, n_tiles, SUB, np_rows):
    """Chunked-path text gather from the cross-round device pool (gathered
    once; block-invariant, like _gather_text)."""
    S = n_tiles * SUB
    return jnp.take(pool[:np_rows], txt_cols, axis=1).reshape(-1, S, LANE)


@functools.partial(jax.jit, static_argnames=("K", "bits", "kw_rows"))
def _peq_from_pool(pool, pat_cols, plen_pat, K, bits, kw_rows):
    """Chunked-path peq build from the cross-round device pool."""
    pat_u = jnp.take(pool[:kw_rows], pat_cols, axis=1)
    return _peq_from_codes(pat_u, plen_pat, K, bits)


# ---------------------------------------------------------------------------
# Gathers lower poorly on TPU: a 12.8 MB jnp.take measured 7.4 ms on v5e
# (benchmarks/probe_systolic_ablate.py found the systolic production entry
# losing HALF its launch time to its three staging gathers).  Column
# selection is a matmul with a one-hot matrix, which rides the MXU at
# int8: out[r, j] = sum_c src[r, c] * (c == idx[j]).  Exact for byte
# data (0/1 weights), and u32 sources split into 4 byte planes.


def _onehot_cols(idx, C):
    return (jnp.arange(C, dtype=jnp.int32)[:, None]
            == idx[None, :].astype(jnp.int32)).astype(jnp.int8)


def _mxu_take_cols_u8(src, idx):
    """take(src, idx, axis=1) for int8/uint8 [R, C] via MXU one-hot."""
    oh = _onehot_cols(idx, src.shape[1])
    out = jax.lax.dot_general(
        src.astype(jnp.int8), oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.int8)


def _mxu_take_cols_u32(src, idx):
    """take(src, idx, axis=-1) for uint32 [..., C] via 4 byte-plane
    one-hot matmuls."""
    shape = src.shape
    C = shape[-1]
    src8 = jax.lax.bitcast_convert_type(src, jnp.uint8)  # [..., C, 4]
    src8 = jnp.moveaxis(src8, -1, 0).reshape(4, -1, C)   # [4, R, C]
    oh = _onehot_cols(idx, C)
    out = jax.lax.dot_general(
        src8.astype(jnp.int8), oh, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [4, R, J]
    out = out.astype(jnp.uint32) & jnp.uint32(0xFF)
    res = (out[0] | (out[1] << 8) | (out[2] << 16) | (out[3] << 24))
    return res.reshape(shape[:-1] + (idx.shape[0],))


@functools.partial(jax.jit, static_argnames=("K", "bits"))
def _peq_from_codes(pat_u, plen_pat, K, bits):
    """Device-side peq builder: packed pattern codes [K*WORD*bits//8, Up]
    -> bit-parallel match masks [K, ALPHA, Up] u32.  Pad positions (and
    bits=2 pad fields, which read as code 3) are masked by plen_pat; bits
    above a pattern's end never reach the harvested hmask cell anyway."""
    cpb = 8 // bits
    mask = (1 << bits) - 1
    W = K * WORD
    idx = jnp.arange(W)
    rowsb = jnp.take(pat_u.astype(jnp.int32), idx // cpb, axis=0)  # [W, Up]
    codes = (rowsb >> ((idx % cpb) * bits)[:, None]) & mask
    valid = idx[:, None] < plen_pat[None, :]
    weights = (jnp.uint32(1) << jnp.arange(WORD, dtype=jnp.uint32))
    planes = []
    for c in range(ALPHA):
        eq = ((codes == c) & valid).reshape(K, WORD, -1)
        planes.append(
            (eq.astype(jnp.uint32) * weights[None, :, None]).sum(
                axis=1, dtype=jnp.uint32
            )
        )
    return jnp.stack(planes, axis=1)  # [K, ALPHA, Up]


def _pack_text_pool(rows, lens, txt_used, Np, Up, bits=4):
    """Pool rows -> [Np*bits//8, Up] packed codes (2 or 4 per byte, pad
    field = all-ones beyond each row's own length; see _pack_text for why
    bits=2 pad is inert).  Only entries used as a text (txt_used mask) are
    materialized; pattern-only entries stay all-pad.

    Packing is one vectorized pass over a sentinel-padded row matrix (a
    per-row Python pack loop was a top host cost in the warm e2e profile);
    per-row work is just the ragged copy."""
    U = len(rows)
    cpb = 8 // bits
    sent = (1 << bits) - 1
    packed = np.full((Np // cpb, Up), 0xFF, np.uint8)
    use = [u for u in range(U) if txt_used[u]]
    if not use:
        return packed.view(np.int8)
    nbmax = max(1, -(-max(int(lens[u]) for u in use) // cpb))
    mat = np.full((len(use), nbmax * cpb), sent, np.uint8)
    for j, u in enumerate(use):
        L = int(lens[u])
        np.minimum(rows[u][:L], sent, out=mat[j, :L])
    merged = mat[:, 0::cpb].copy()
    for f in range(1, cpb):
        merged |= mat[:, f::cpb] << (bits * f)
    packed[:nbmax, use] = merged.T
    return packed.view(np.int8)


def _pallas_single(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB,
                   interpret=False, bits=4):
    kernel = _make_kernel(K, Tc, n_chunks, SUB, bits)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32),
        grid=(n_tiles, n_chunks),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(
                (K, ALPHA, SUB, LANE), lambda p, t: (0, 0, p, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Tc * bits // 8, SUB, LANE), lambda p, t: (t, p, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0), memory_space=pltpu.VMEM),
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


@functools.partial(
    jax.jit, static_argnames=("K", "Tc", "n_chunks", "n_tiles", "SUB", "bits")
)
def _call(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB, bits=4):
    return _pallas_single(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles,
                          SUB, bits=bits)


@functools.partial(
    jax.jit,
    static_argnames=("K", "Tc", "n_chunks", "n_tiles", "SUB", "interpret",
                     "bits"),
)
def _call_gather(pat_u, plen_pat, text_u, pat_idx, txt_idx, nlen, mlen,
                 K, Tc, n_chunks, n_tiles, SUB, interpret=False, bits=4):
    """Pool-gather front end: wire arrays are pool-sized ([*, Up]); the
    peq planes are BUILT on device from packed pattern codes
    (_peq_from_codes) and the per-pair tiled layouts are materialized on
    DEVICE by two gathers.  H2D through the host tunnel is the engine's
    bottleneck — this makes the wire cost scale with unique sequence
    BYTES instead of peq planes or the padded pair-group width."""
    S = n_tiles * SUB
    peq_u = _peq_from_codes(pat_u, plen_pat, K, bits)
    peq = jnp.take(peq_u, pat_idx, axis=2).reshape(K, ALPHA, S, LANE)
    text = jnp.take(text_u, txt_idx, axis=1).reshape(-1, S, LANE)
    return _pallas_single(
        peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB, interpret,
        bits=bits,
    )


def batched_edit_distance_pallas_myers(
    a_codes,
    b_codes,
    a_len,
    b_len,
    text_chunk: int = 512,
    interpret: bool = False,
    sub_tile: int = DEFAULT_SUB,
    lazy: bool = False,
    pool_gather: bool | None = None,
    pool_cache=None,
):
    """Drop-in for dna_align.batched_edit_distance (TPU bit-parallel path).

    lazy=True returns a zero-arg finish closure (see myers_batch).
    pool_gather: None = auto (on for compiled runs when the dedupe pool is
    narrower than the padded pair group), True = force (tests), False = off.
    pool_cache: optional ops.seqpool.DevicePoolCache — sequence rows stay
    DEVICE-RESIDENT across align rounds; only rows not yet on device ship.
    """
    a_codes = np.asarray(a_codes, dtype=np.uint8)
    b_codes = np.asarray(b_codes, dtype=np.uint8)
    a_len = np.asarray(a_len, np.int32)
    b_len = np.asarray(b_len, np.int32)
    B = a_codes.shape[0]
    swap = a_len > b_len
    m_len = np.where(swap, b_len, a_len).astype(np.int32)
    n_len = np.where(swap, a_len, b_len).astype(np.int32)
    N = int(n_len.max(initial=1))

    K = _quantize_K(max(1, -(-int(m_len.max(initial=1)) // WORD)))
    if K > CHUNK_KC and not interpret:
        # beyond 64 pattern words the monolithic unroll falls off the
        # register fast path (52 vs 147 GCUPS measured at K=192,
        # benchmarks/probe_single_vs_chunked.py) — stream pattern blocks
        return batched_edit_distance_pallas_myers_long(
            a_codes, b_codes, a_len, b_len,
            text_chunk=text_chunk, sub_tile=sub_tile, lazy=lazy,
            pool_cache=pool_cache,
        )

    SUB = sub_tile
    TILE = SUB * LANE
    n_tiles = max(1, -(-B // TILE))
    if not interpret:
        # canonical shape ladder: a single tile (1024 pairs) for small
        # buckets, the full group for anything larger (long-text buckets
        # are pair-chunked small by the aligner's cell budget, and padding
        # those to the 8-tile group made the text H2D the dominant engine
        # cost), pow2 groups above 8 so oversized batches stay correct
        if n_tiles > GROUP_TILES:
            n_tiles = _pow2(n_tiles)
        elif n_tiles > 1:
            n_tiles = GROUP_TILES
    Bp = n_tiles * TILE
    Tc = max(4, min(text_chunk, _pow2(max(1, N))))
    Tc += (-Tc) % 4  # packed text stores up to four positions per byte
    n_chunks = max(1, -(-N // Tc))
    if not interpret:
        n_chunks = _quant_chunks(n_chunks)  # no-op for the pow2 buckets
    Np = n_chunks * Tc

    # reshape/pad to tiled layouts
    def tile_pairs(arr, fill, dtype):
        # [..., B] -> [..., n_tiles*SUB, LANE]
        out = np.full(arr.shape[:-1] + (Bp,), fill, dtype)
        out[..., :B] = arr
        return out.reshape(arr.shape[:-1] + (n_tiles * SUB, LANE))

    mlen_t = tile_pairs(m_len[None, :], 1, np.int32)[0]
    nlen_t = tile_pairs(n_len[None, :], 1, np.int32)[0]

    # pool-gather path: dedupe sequences, ship pool-sized wire arrays, and
    # gather the per-pair layouts on device.  Worth it whenever the pool is
    # strictly narrower than the padded pair group (always true when real
    # pairs underfill the canonical tile group).
    pool = None
    if pool_gather is None:
        pool_gather = not interpret
    if pool_gather:
        # Without a cross-round cache the pool only pays when strictly
        # narrower than the padded pair group (_dedupe_pool bails once that
        # is impossible).  WITH the cache, H2D scales with rows not yet on
        # device, so even a dense unique bucket belongs on the pool path:
        # pass-1/2 candidates were almost always shipped by pass 0, and the
        # dense fallback would both re-ship them and pay the host peq build
        # (_precompute was ~0.1 s/bucket at config-4 shapes).
        cap = (
            None
            if (interpret or pool_cache is not None)
            else max(128, Bp // 2)
        )
        pool = _dedupe_pool(a_codes, b_codes, a_len, b_len, max_rows=cap)

    if pool is not None:
        rows, plen, idx_a, idx_b, keys = pool
        Up = max(8 if interpret else 128, _pow2(len(rows)))
        bits = 2 if all(int(r.max(initial=0)) < 4 for r in rows) else 4
        if pool_cache is not None:
            from .seqpool import DevicePoolCache

            Hc = max(DevicePoolCache.height_class(Np), _pow2(K * WORD))
            pool_dev, slots = pool_cache.ensure(bits, Hc, keys, rows, plen)
            pat_idx, txt_idx, plen_pat, _, _, _ = _pool_indices(
                plen, idx_a, idx_b, swap, B, Bp, K, Up
            )
            pat_cols = np.zeros(Up, np.int32)
            pat_cols[: len(slots)] = slots
            kernel_out = _call_pool(
                pool_dev,
                jnp.asarray(slots[txt_idx]),
                jnp.asarray(pat_cols),
                jnp.asarray(plen_pat),
                jnp.asarray(pat_idx),
                jnp.asarray(nlen_t),
                jnp.asarray(mlen_t),
                K,
                Tc,
                n_chunks,
                n_tiles,
                SUB,
                interpret,
                bits,
            )
        else:
            pat_u, plen_pat, text_u, pat_idx, txt_idx = _build_pool_wire(
                rows, plen, idx_a, idx_b, swap, B, Bp, K, Np, Up, bits
            )
            kernel_out = _call_gather(
                jnp.asarray(pat_u),
                jnp.asarray(plen_pat),
                jnp.asarray(text_u),
                jnp.asarray(pat_idx),
                jnp.asarray(txt_idx),
                jnp.asarray(nlen_t),
                jnp.asarray(mlen_t),
                K,
                Tc,
                n_chunks,
                n_tiles,
                SUB,
                interpret,
                bits,
            )
    else:
        peq, text, _hmask, m_len, n_len, K0 = _precompute(
            a_codes, b_codes, a_len, b_len
        )
        if K > peq.shape[0]:
            peq = np.concatenate(
                [peq, np.zeros((K - peq.shape[0],) + peq.shape[1:], np.uint32)]
            )
        peq_t = tile_pairs(peq, 0, np.uint32)  # [K, A, n_tiles*SUB, LANE]
        if interpret:
            text_t = _pack_text(text, text.shape[0], B, Np, Bp, n_tiles, SUB)
            kernel_out = _call_interpret(
                peq_t, text_t, nlen_t, mlen_t, K, Tc, n_chunks, n_tiles, SUB
            )
        else:
            bits = 2 if int(max(a_codes.max(initial=0),
                                b_codes.max(initial=0))) < 4 else 4
            text_t = _pack_text(text, text.shape[0], B, Np, Bp, n_tiles,
                                SUB, bits)
            kernel_out = _call(
                jnp.asarray(peq_t),
                jnp.asarray(text_t),
                jnp.asarray(nlen_t),
                jnp.asarray(mlen_t),
                K,
                Tc,
                n_chunks,
                n_tiles,
                SUB,
                bits,
            )
    def post(host):
        out = np.asarray(host).reshape(Bp)[:B]
        return np.where(m_len == 0, n_len, out)

    if lazy == "device":
        return kernel_out, post
    if lazy:
        from .myers_batch import start_host_copy

        start_host_copy(kernel_out)
        return lambda: post(np.asarray(kernel_out))
    return post(np.asarray(kernel_out))


def _call_interpret(peq, text, nlen, mlen, K, Tc, n_chunks, n_tiles, SUB):
    kernel = _make_kernel(K, Tc, n_chunks, SUB)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32),
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((K, ALPHA, SUB, LANE), lambda p, t: (0, 0, p, 0)),
            pl.BlockSpec((Tc // 2, SUB, LANE), lambda p, t: (t, p, 0)),
            pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0)),
            pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0)),
        ],
        out_specs=pl.BlockSpec((SUB, LANE), lambda p, t: (p, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, SUB, LANE), jnp.uint32),
            pltpu.VMEM((K, SUB, LANE), jnp.uint32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((K, SUB, LANE), jnp.uint32),
        ],
        interpret=True,
    )(
        jnp.asarray(peq),
        jnp.asarray(text),
        jnp.asarray(nlen),
        jnp.asarray(mlen),
    )
