"""Block-systolic Myers kernel: pattern blocks staggered across lanes.

The pairs-across-lanes kernels (ops/pallas_myers.py) pad every launch to
a full 1024-lane pair tile, so a long-pair batch with few pairs runs
mostly-empty lanes — measured on chip: 16 pairs x 50 kbp sustains 1.6%
of the padded rate (benchmarks/probe_long_kernel.py).  This variant
recovers the idle lanes by assigning each lane ONE (pair, pattern-block)
slot and running the blocks as a systolic cascade:

  * lane (p, k) processes pattern block k of pair p, staggered k text
    steps behind block 0: at step j it handles text position j-k;
  * the Myers inter-word carries at a block boundary are exactly the
    bits block k produces at position j and block k+1 consumes at the
    same position — one lane-roll per step moves them (the same
    device-resident dataflow the chunked kernel streams through HBM
    between launches, now register-to-register);
  * the current text char rides the same roll: the head lane (k == 0)
    inserts pair p's char j, and k rolls later it reaches lane (p, k);
  * every block of every pair processes in ONE kernel launch (no
    per-block launch sequence), and lane fill scales with
    pairs x blocks instead of pairs.

Layout contract (host side, _pack_systolic): a pair's block slots are
CONTIGUOUS WITHIN ONE SUBLANE ROW (rolls rotate each 128-lane row
independently), pairs never straddle rows; the roll wrap from lane 127
to lane 0 lands on a head or unused lane, where the inserted value is
masked anyway.

Exactness: identical results to the other Myers kernels — same
recurrence, same harvest-at-n_len rule (cross-checked against the
oracle and the native baseline in tests/test_ops_myers.py).

reference: taxonpredictionmodelsequence.hh:133-171 is the semantic
anchor (SeqAn MyersBitVector global edit distance); this dataflow has no
reference analog.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_myers import (
    ALPHA,
    LANE,
    WORD,
    _pack_text_pool,
    _peq_from_codes,
    _pow2,
    _quant_chunks,
)

# pattern words per block (1024 bp): measured 16x50kbp on chip — KC=32
# 1,009 GCUPS vs KC=64's 669 (halved per-lane pv/mv register state AND
# doubled slots-per-pair lane fill); KC=16 within noise of 32, KC=32
# keeps the pattern cap (98,304 bp = 96 blocks) inside one 128-lane row
DEFAULT_KC = 32
DEFAULT_SUB = 8


STAG = 4  # inter-block stagger in text steps (== UNROLL, see below)


def _make_systolic_kernel(KC: int, Tc: int, n_chunks: int, SUB: int,
                          bits: int = 4):
    # UNROLL == STAG: block k runs STAG text steps behind block k-1, so
    # the carries a char consumes were produced STAG chars earlier — all
    # chars within one unrolled trip read LAST trip's FIFO slots and are
    # mutually independent, restoring the DNA kernels' carry-chain
    # interleaving (a stagger of 1 chained every char through the roll:
    # measured ~600 GCUPS padded vs the chunked kernel's ~3.6T).
    assert Tc % STAG == 0
    UNROLL = STAG

    def kernel(
        tlast_ref,  # scalar-prefetch [n_tiles] i32 — last live chunk/tile
        peq_ref,    # [KC, ALPHA, SUB, LANE] u32 — per-slot block peq
        text_ref,   # [Tc//2, SUB, LANE] i8 — pair chars at HEAD lanes
        head_ref,   # [SUB, LANE] i32 — 1 at each pair's block-0 lane
        lanek_ref,  # [SUB, LANE] i32 — STAG * block-index of the slot
        nlen_ref,   # [SUB, LANE] i32 — pair text length (0 = unused)
        mword_ref,  # [SUB, LANE] i32 — pattern-end word RELATIVE to slot
        mbit_ref,   # [SUB, LANE] i32
        mlen_ref,   # [SUB, LANE] i32 — pattern length (score seed)
        out_ref,    # [SUB, LANE] i32
        pv_ref,     # scratch [KC, SUB, LANE] u32
        mv_ref,     # scratch [KC, SUB, LANE] u32
        fifo_ref,   # scratch [STAG, SUB, LANE] i32 — PACKED slot FIFO:
        #             char | PH<<8 | MH<<9 (one lane-roll per char
        #             instead of three — rolls are cross-lane permutes,
        #             the per-char tax of this dataflow)
        score_ref,  # scratch [SUB, LANE] i32
        res_ref,    # scratch [SUB, LANE] i32
        hmask_ref,  # scratch [KC, SUB, LANE] u32
    ):
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

        base_j = t * Tc

        # per-TILE early stop: slot (lane) k of a pair is live only for
        # text steps j < n_len + lanek, so chunks past the tile max have
        # no live lane and skip the whole body.  tlast (host-computed,
        # scalar-prefetched) is the tile's last live chunk; the text
        # BlockSpec index map clamps to it, so skipped grid cells
        # REVISIT the same block and the pipeline skips their DMA too.
        # n_chunks is sized by the LAUNCH max; the row packer fills rows
        # in descending block-count order, so tiles hold similar-length
        # pairs and short tiles stop early (config-4 stream sim:
        # launch-wide fill 57.8% -> 82.3%; early_stop=False is a pure
        # data knob — tlast = n_chunks-1 — same compiled kernel)
        @pl.when(t <= tlast_ref[pl.program_id(0)])
        def _compute():
            head = head_ref[:] == 1
            lanek = lanek_ref[:]  # pre-scaled: STAG * block index
            n_len = nlen_ref[:]

            def one_char(jj, u, pvs, mvs, fifo, score, res):
                # fifo[u] = packed (char | PH<<8 | MH<<9) produced STAG
                # chars ago — all UNROLL chars of a trip consume the
                # PREVIOUS trip's slots, so their carry chains are
                # independent and interleave.  Packing the slot means ONE
                # roll + ONE select per char (head lanes insert fresh |
                # PH=1 | MH=0) instead of three of each; the unpack is
                # plain cheap ALU.
                if bits == 2:
                    packed = text_ref[jj >> 2].astype(jnp.int32)
                    fresh = (packed >> ((jj & 3) * 2)) & 3
                else:
                    packed = text_ref[jj >> 1].astype(jnp.int32)
                    fresh = (packed >> ((jj & 1) * 4)) & 15
                slot_in = jnp.where(head, fresh | 256,
                                    pltpu.roll(fifo[u], 1, axis=1))
                j = base_j + jj
                jeff1 = (j + 1) - lanek  # completed text positions
                enter = jeff1 == 1       # first live step: fresh DP state
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
                    if bits != 2:  # 2-bit codes are always < ALPHA
                        eq0 = jnp.where(tc >= ALPHA, jnp.uint32(0), eq0)
                    pv_k = jnp.where(enter, jnp.uint32(0xFFFFFFFF), pvs[k])
                    mv_k = jnp.where(enter, jnp.uint32(0), mvs[k])
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
                delta = (ph_hit != 0).astype(jnp.int32) - (
                    mh_hit != 0
                ).astype(jnp.int32)
                live = (jeff1 >= 1) & (jeff1 <= n_len)
                score = score + jnp.where(live, delta, 0)
                res = jnp.where(jeff1 == n_len, score, res)
                slot = (tc
                        | jax.lax.shift_left(carry_ph.astype(jnp.int32), 8)
                        | jax.lax.shift_left(carry_mh.astype(jnp.int32), 9))
                return tuple(new_pvs), tuple(new_mvs), slot, score, res

            def stepj(jj, carry):
                pvs, mvs, fifo, score, res = carry
                new_fifo = list(fifo)
                for u in range(UNROLL):
                    pvs, mvs, slot, score, res = one_char(
                        jj * UNROLL + u, u, pvs, mvs, fifo, score, res
                    )
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
                0, Tc // UNROLL, stepj, carry0
            )
            for k in range(KC):
                pv_ref[k] = pvs[k]
                mv_ref[k] = mvs[k]
            for u in range(STAG):
                fifo_ref[u] = fifo[u]
            score_ref[:] = score
            res_ref[:] = res

        @pl.when(t == n_chunks - 1)
        def _emit():
            out_ref[:] = res_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("KC", "Tc", "n_chunks", "n_tiles", "SUB", "interpret",
                     "bits"),
)
def _call_systolic(tlast, peq, text, head, lanek, nlen, mword, mbit, mlen,
                   KC, Tc, n_chunks, n_tiles, SUB, interpret=False,
                   bits=4):
    kernel = _make_systolic_kernel(KC, Tc, n_chunks, SUB, bits)
    B2 = jax.ShapeDtypeStruct((n_tiles * SUB, LANE), jnp.int32)
    bspec = pl.BlockSpec((SUB, LANE), lambda p, t, tl: (p, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((KC, ALPHA, SUB, LANE),
                         lambda p, t, tl: (0, 0, p, 0),
                         memory_space=pltpu.VMEM),
            # clamp to the tile's last live chunk: skipped cells revisit
            # the same text block, so their DMA is elided as well
            pl.BlockSpec((Tc * bits // 8, SUB, LANE),
                         lambda p, t, tl: (jnp.minimum(t, tl[p]), p, 0),
                         memory_space=pltpu.VMEM),
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
    )
    return pl.pallas_call(
        kernel,
        out_shape=B2,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(tlast, peq, text, head, lanek, nlen, mword, mbit, mlen)


def _pack_systolic(a_codes, b_codes, a_len, b_len, KC, SUB, Tc,
                   interpret=False, build_pools=True, bits=4):
    """Assign (pair, block) slots to lanes row by row and build the
    kernel's WIRE arrays: packed per-pair pattern/text code columns plus
    small per-slot metadata — the lane-layout peq planes and the
    [steps, R, LANE] text stream are materialized ON DEVICE
    (_stage_systolic); shipping them was 100x the useful bytes.
    Returns (inputs dict, slot map, shapes)."""
    B = len(a_len)
    swap = a_len > b_len
    m_len = np.where(swap, b_len, a_len).astype(np.int32)
    n_len = np.where(swap, a_len, b_len).astype(np.int32)
    patterns = [
        (a_codes[i, : a_len[i]] if not swap[i] else b_codes[i, : b_len[i]])
        for i in range(B)
    ]
    texts = [
        (b_codes[i, : b_len[i]] if not swap[i] else a_codes[i, : a_len[i]])
        for i in range(B)
    ]
    nb = np.maximum(1, -(-np.maximum(m_len, 1) // (KC * WORD)))

    # greedy row packing: pairs in descending nb order, first row with room
    order = sorted(range(B), key=lambda i: -int(nb[i]))
    rows_free: list[int] = []
    slot_of = {}
    for i in order:
        need = int(nb[i])
        if need > LANE:
            raise ValueError("pattern exceeds systolic row capacity")
        for r in range(len(rows_free)):
            if rows_free[r] >= need:
                break
        else:
            rows_free.append(LANE)
            r = len(rows_free) - 1
        slot_of[i] = (r, LANE - rows_free[r])
        rows_free[r] -= need

    n_rows = len(rows_free)
    n_tiles = max(1, -(-n_rows // SUB))
    R = n_tiles * SUB

    # per-slot metadata, vectorized over a flat slot list
    pair_arr = np.concatenate([np.full(int(nb[i]), i) for i in range(B)])
    k_arr = np.concatenate([np.arange(int(nb[i])) for i in range(B)])
    r_arr = np.array([slot_of[i][0] for i in pair_arr])
    l_arr = np.array([slot_of[i][1] for i in pair_arr]) + k_arr

    head = np.zeros((R, LANE), np.int32)
    lanek = np.zeros((R, LANE), np.int32)
    nlen_l = np.zeros((R, LANE), np.int32)
    mlen_l = np.ones((R, LANE), np.int32)
    mword = np.full((R, LANE), -1, np.int32)  # outside [0,KC): no hmask
    mbit = np.zeros((R, LANE), np.int32)
    # device-gather columns: pattern peq col (k*(B+1)+pair) and text col
    peq_col = np.zeros((R, LANE), np.int32)  # default: zero column B
    txt_col = np.full((R, LANE), B, np.int32)

    B1 = _pow2(B + 1)  # pow2 pool-column count (bounded jit statics)
    kend = (np.maximum(m_len, 1) - 1) >> 5
    lanek[r_arr, l_arr] = STAG * k_arr  # pre-scaled block stagger
    nlen_l[r_arr, l_arr] = n_len[pair_arr]
    mlen_l[r_arr, l_arr] = m_len[pair_arr]
    rel = kend[pair_arr] - k_arr * KC
    endslot = (rel >= 0) & (rel < KC)
    mword[r_arr[endslot], l_arr[endslot]] = rel[endslot]
    mbit[r_arr[endslot], l_arr[endslot]] = (
        (m_len[pair_arr[endslot]] - 1) & 31
    )
    peq_col[r_arr, l_arr] = k_arr * B1 + pair_arr
    unused = nlen_l == 0
    peq_col[unused] = B  # an all-pad zero column (plen 0)
    is_head = k_arr == 0
    head[r_arr[is_head], l_arr[is_head]] = 1
    txt_col[r_arr[is_head], l_arr[is_head]] = pair_arr[is_head]
    last_slot = {
        i: (slot_of[i][0], slot_of[i][1] + int(nb[i]) - 1) for i in range(B)
    }

    # steps must cover every lane's window: n_len + STAG * (nb - 1)
    steps_needed = int((n_len + STAG * (nb - 1)).max(initial=0)) + 1
    n_chunks = max(1, -(-steps_needed // Tc))
    if not interpret:
        n_chunks = _quant_chunks(n_chunks)  # quarter-octave: pad <= 25%
    Np = n_chunks * Tc

    # per-tile last live chunk (scalar-prefetch early stop): a slot is
    # live for steps j < n_len + lanek
    smax_lane = nlen_l + lanek
    smax_tile = smax_lane.reshape(n_tiles, SUB * LANE).max(axis=1)
    tlast = np.clip(-(-smax_tile // Tc) - 1, 0, n_chunks - 1).astype(
        np.int32)

    # pow2-quantize the jit static dims (pool column count, block count)
    # so the compiled-stage ladder stays bounded across ragged rounds;
    # pad columns are all-0xFF with plen 0 (zero peq planes)
    nbmax = _pow2(int(nb.max(initial=1)))
    K_full = nbmax * KC
    plen_pat = np.zeros(B1, np.int32)
    plen_pat[:B] = np.minimum(m_len, K_full * WORD)
    pat_u = text_u = None
    if build_pools:  # the pool-cache front end gathers from the
        all_used = np.ones(B, bool)  # device-resident pool instead
        pat_u = _pack_text_pool(patterns, plen_pat[:B], all_used,
                                K_full * WORD, B1, bits=bits)
        text_u = _pack_text_pool(texts, n_len, all_used, Np, B1, bits=bits)

    inputs = dict(
        pat_u=pat_u, text_u=text_u, plen_pat=plen_pat,
        peq_col=peq_col.reshape(-1), txt_col=txt_col.reshape(-1),
        head=head, lanek=lanek, nlen=nlen_l, mword=mword, mbit=mbit,
        mlen=mlen_l, tlast=tlast,
    )
    return inputs, last_slot, (n_tiles, n_chunks, Np, nbmax)


def _stage_core(pat_u, text_u, plen_pat, peq_col, txt_col, tlast, head,
                lanek, nlen, mword, mbit, mlen,
                KC, nbmax, B1, Tc, n_chunks, n_tiles, SUB, interpret,
                bits):
    """Device-side staging: build peq planes from packed pattern codes
    (_peq_from_codes, the round-2 device builder), gather (pair, block)
    columns into the slot-lane layout, expand the text stream to head
    lanes, then run the systolic kernel.  H2D is just the packed code
    columns + small metadata; the big lane-layout arrays live only in
    HBM."""
    S = n_tiles * SUB
    Np = n_chunks * Tc
    nbytes = Np * bits // 8
    peq_u = _peq_from_codes(pat_u, plen_pat, nbmax * KC, bits)  # [K,A,B1]
    peq_flat = (
        peq_u.reshape(nbmax, KC, ALPHA, B1)
        .transpose(1, 2, 0, 3)
        .reshape(KC, ALPHA, nbmax * B1)
    )
    # NOTE round-5: probe_systolic_ablate.py attributes ~half the
    # production launch time to this staging block (kernel body alone
    # ~1.6 T padded at 16x50k vs ~0.8-1.0 T through the entry).  BOTH
    # attempted reformulations measured WORSE in-session and were
    # reverted: (a) MXU one-hot int8 matmul gathers -> 434 GCUPS at
    # 16x50k (2.3x regression; helpers kept in pallas_myers for the
    # record); (b) broadcast+reshape byte expansion inside
    # _peq_from_codes -> ~590 (1.7x; the reshape forces a relayout).
    # The native take lowering is the best formulation tested; the
    # remaining staging cost would need the gathers fused INTO the
    # kernel to disappear.
    peq = jnp.take(peq_flat, peq_col, axis=2).reshape(KC, ALPHA, S, LANE)
    text = jnp.take(
        text_u[:nbytes], txt_col, axis=1
    ).reshape(nbytes, S, LANE)
    return _call_systolic(
        tlast, peq, text, head, lanek, nlen, mword, mbit, mlen,
        KC=KC, Tc=Tc, n_chunks=n_chunks, n_tiles=n_tiles, SUB=SUB,
        interpret=interpret, bits=bits,
    )


@functools.partial(
    jax.jit,
    static_argnames=("KC", "nbmax", "B1", "Tc", "n_chunks", "n_tiles",
                     "SUB", "interpret", "bits"),
)
def _stage_and_call(pat_u, text_u, plen_pat, peq_col, txt_col, tlast, head,
                    lanek, nlen, mword, mbit, mlen,
                    KC, nbmax, B1, Tc, n_chunks, n_tiles, SUB,
                    interpret=False, bits=4):
    return _stage_core(pat_u, text_u, plen_pat, peq_col, txt_col, tlast,
                       head, lanek, nlen, mword, mbit, mlen,
                       KC, nbmax, B1, Tc, n_chunks, n_tiles, SUB,
                       interpret, bits)


@functools.partial(
    jax.jit,
    static_argnames=("KC", "nbmax", "B1", "Tc", "n_chunks", "n_tiles",
                     "SUB", "interpret", "bits"),
)
def _stage_and_call_pool(pool, pat_cols, txt_cols, plen_pat, peq_col,
                         txt_col, tlast, head, lanek, nlen, mword, mbit,
                         mlen, KC, nbmax, B1, Tc, n_chunks, n_tiles, SUB,
                         interpret=False, bits=4):
    """Pool front end: per-pair pattern/text code columns gathered from
    the CROSS-ROUND device-resident pool (ops/seqpool.py) — the round's
    H2D is just the rows not yet on device (pass-1/2 re-alignments are
    ~all hits), exactly the classic long path's residency model."""
    Np = n_chunks * Tc
    cpb = 8 // bits
    pat_u = jnp.take(pool[: nbmax * KC * WORD // cpb], pat_cols, axis=1)
    text_u = jnp.take(pool[: Np // cpb], txt_cols, axis=1)
    return _stage_core(pat_u, text_u, plen_pat, peq_col, txt_col, tlast,
                       head, lanek, nlen, mword, mbit, mlen,
                       KC, nbmax, B1, Tc, n_chunks, n_tiles, SUB,
                       interpret, bits)


def batched_edit_distance_systolic(
    a_codes, b_codes, a_len, b_len,
    text_chunk: int = 512, interpret: bool = False,
    block_words: int = DEFAULT_KC, sub_tile: int = DEFAULT_SUB,
    lazy: bool = False, pool_cache=None, early_stop: bool = True,
):
    """Exact batched global edit distance via the block-systolic kernel.
    Drop-in contract of batched_edit_distance_pallas_myers_long; best in
    the few-pairs x long-patterns regime where the pair-tile kernels run
    mostly padding.  pool_cache: ops.seqpool.DevicePoolCache — sequence
    rows stay device-resident across align rounds (bits=4); only rows
    not yet on device ship."""
    a_codes = np.asarray(a_codes, dtype=np.uint8)
    b_codes = np.asarray(b_codes, dtype=np.uint8)
    a_len = np.asarray(a_len, np.int32)
    b_len = np.asarray(b_len, np.int32)
    B = a_codes.shape[0]
    if B == 0:
        # honor the drop-in contract for empty batches (the packer's
        # np.concatenate([]) would raise) — round-4 advisor finding
        empty = np.zeros(0, np.int32)
        if lazy == "device":
            return empty, lambda host_res: np.asarray(host_res)
        if lazy:
            return lambda: empty
        return empty
    KC = block_words
    SUB = sub_tile
    Tc = max(4, text_chunk)
    Tc += (-Tc) % 4
    # 2-bit wire for N-free batches: halves the pool bytes AND shares
    # the cross-round pool with the classic long path (same (bits, Hc)
    # class -> no double residency); sound because results are harvested
    # exactly at n_len (pad fields read as code 3) and _peq_from_codes
    # masks pattern pads by plen
    bits = 2 if (int(a_codes.max(initial=0)) < 4
                 and int(b_codes.max(initial=0)) < 4) else 4

    inputs, last_slot, (n_tiles, n_chunks, Np, nbmax) = _pack_systolic(
        a_codes, b_codes, a_len, b_len, KC, SUB, Tc, interpret,
        build_pools=pool_cache is None, bits=bits)
    B1 = _pow2(B + 1)
    tlast_arr = inputs["tlast"]
    if not early_stop:  # falsification arm: same compiled kernel,
        tlast_arr = np.full_like(tlast_arr, n_chunks - 1)  # no stops
    meta = (
        jnp.asarray(inputs["plen_pat"]), jnp.asarray(inputs["peq_col"]),
        jnp.asarray(inputs["txt_col"]), jnp.asarray(tlast_arr),
        jnp.asarray(inputs["head"]),
        jnp.asarray(inputs["lanek"]), jnp.asarray(inputs["nlen"]),
        jnp.asarray(inputs["mword"]), jnp.asarray(inputs["mbit"]),
        jnp.asarray(inputs["mlen"]),
    )
    statics = dict(
        KC=KC, nbmax=nbmax, B1=B1, Tc=Tc, n_chunks=n_chunks,
        n_tiles=n_tiles, SUB=SUB, interpret=interpret, bits=bits,
    )
    if pool_cache is not None:
        from .pallas_myers import _dedupe_pool
        from .seqpool import DevicePoolCache

        rows, plen, idx_a, idx_b, keys = _dedupe_pool(
            a_codes, b_codes, a_len, b_len)
        swap = a_len > b_len
        pat_entry = np.where(swap, idx_b, idx_a)
        txt_entry = np.where(swap, idx_a, idx_b)
        Hc = max(DevicePoolCache.height_class(Np),
                 _pow2(nbmax * KC * WORD))
        # height RATCHET: residency is per (bits, Hc) class, and the
        # round's natural Hc varies with its own maxima — without the
        # ratchet a row resident from a pass-0 round (tall class)
        # re-ships for every smaller pass-1/2 round (measured: config-4
        # h2d 154 MB vs ~17.5 MB of unique content).  Ratcheting to the
        # largest class this cache has seen keeps later rounds hitting
        # the same pool; the first (pass-0) round is the biggest, so the
        # ratchet settles immediately
        prev = getattr(pool_cache, "systolic_hc", 0)
        Hc = max(Hc, prev)
        pool_cache.systolic_hc = Hc
        pool_dev, slots = pool_cache.ensure(bits, Hc, keys, rows, plen)
        pat_cols = np.zeros(B1, np.int32)
        pat_cols[:B] = slots[pat_entry]
        txt_cols = np.zeros(B1, np.int32)
        txt_cols[:B] = slots[txt_entry]
        dev = _stage_and_call_pool(
            pool_dev, jnp.asarray(pat_cols), jnp.asarray(txt_cols),
            *meta, **statics,
        )
    else:
        dev = _stage_and_call(
            jnp.asarray(inputs["pat_u"]), jnp.asarray(inputs["text_u"]),
            *meta, **statics,
        )

    def post(host_res):
        res = np.asarray(host_res)
        out = np.zeros(B, np.int32)
        for i in range(B):
            r, l = last_slot[i]
            out[i] = res[r, l]
        # empty-side pairs: the kernel's harvest fires at jeff1 == n_len
        # with a zero score seed when m == 0, so pin the exact answer
        # here (distance(empty, s) == len(s)) — matches the chunked
        # path's drop-in contract
        empty = (a_len == 0) | (b_len == 0)
        if empty.any():
            out = np.where(empty, np.maximum(a_len, b_len), out)
        return out

    if lazy == "device":
        return dev, post
    if lazy:
        from .myers_batch import start_host_copy

        pend = start_host_copy(dev)  # async D2H kick, returns the array
        return lambda: post(np.asarray(pend))
    return post(np.asarray(dev))
