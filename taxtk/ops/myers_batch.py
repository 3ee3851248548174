"""Bit-parallel Myers edit distance, vectorized across the pair batch.

The wavefront DP (dna_align.py) spends ~12 vector ops per DP cell.  Myers'
bit-vector algorithm (Myers, JACM 1999; Hyyrö's block formulation) packs 32
cells into each 32-bit lane: one (text-char x block) step costs ~20 bitwise
ops for 32 cells, ~0.6 ops/cell — a ~20x algorithmic speedup that maps
perfectly onto the TPU VPU with the BATCH in the lane dimension:

  state  Pv/Mv  [K, B]  uint32  (K = pattern blocks of 32)
  text           [N, B] int32   (transposed: step j loads one row)
  peq      [K, A, B]    uint32  (pattern match masks, A = alphabet 5)

Each scan step processes one text character for B pairs at once; horizontal
delta carries (ph/mh) thread through the K blocks sequentially.  Per-pair
ragged lengths: the score is harvested at each pair's own text length, and
each pair's own last block/high bit contributes the +-1 updates.

This module is the XLA (portable) version; pallas_myers.py is the TPU
kernel with the same semantics.  Distances are exact global edit distances,
identical to dna_align / the SeqAn-calibrated oracle.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

ALPHA = 5  # DNA5
WORD = 32


def build_peq(patterns: np.ndarray, m_len: np.ndarray, K: int) -> np.ndarray:
    """patterns [B, M] uint8 codes, m_len [B] -> peq [K, ALPHA, B] uint32.

    Prefers the native single-pass C++ builder (O(B*M)); falls back to
    np.packbits bit packing (little-endian, O(B*K*32*ALPHA))."""
    B, M = patterns.shape
    assert K * WORD >= M, (K, M)
    try:
        from ..native import build_peq_native

        peq = build_peq_native(patterns, m_len, K, ALPHA)
        if peq is not None:
            return peq
    except Exception:
        pass
    pad = np.full((B, K * WORD), 255, np.uint8)
    pad[:, :M] = patterns
    mask = np.arange(K * WORD)[None, :] < m_len[:, None]
    peq = np.zeros((K, ALPHA, B), dtype=np.uint32)
    for c in range(ALPHA):
        hit = (pad == c) & mask  # [B, K*WORD]
        packed = np.packbits(hit, axis=1, bitorder="little")  # [B, K*4] u8
        words = packed.view("<u4").reshape(B, K)  # [B, K] u32
        peq[:, c, :] = words.T
    return peq


def _precompute(a_codes, b_codes, a_len, b_len):
    """Choose per-pair pattern = shorter sequence (reference kernel does the
    same swap, taxonpredictionmodelsequence.hh:141-147); build peq, the
    transposed text, and per-pair last-block high-bit masks.  Fully
    vectorized — no per-pair Python work."""
    B = a_codes.shape[0]
    swap = a_len > b_len
    m_len = np.where(swap, b_len, a_len).astype(np.int32)
    n_len = np.where(swap, a_len, b_len).astype(np.int32)
    Mmax = int(m_len.max(initial=1))
    Nmax = int(n_len.max(initial=1))
    K = max(1, -(-Mmax // WORD))

    W = max(a_codes.shape[1], b_codes.shape[1], 1)
    a_pad = np.full((B, W), 255, np.uint8)
    a_pad[:, : a_codes.shape[1]] = a_codes
    b_pad = np.full((B, W), 255, np.uint8)
    b_pad[:, : b_codes.shape[1]] = b_codes
    patterns = np.where(swap[:, None], b_pad, a_pad)[:, : max(Mmax, 1)]
    text_rows = np.where(swap[:, None], a_pad, b_pad)[:, : max(Nmax, 1)]
    # sentinel beyond each pair's own text length; kept uint8 — the device
    # kernels compare codes directly, and int32 widening tripled the H2D
    col = np.arange(text_rows.shape[1])[None, :]
    text = np.ascontiguousarray(np.where(col < n_len[:, None], text_rows, 31).T)

    peq = build_peq(patterns, m_len, K)
    last_block = np.maximum(m_len - 1, 0) // WORD  # [B]
    high_bit = np.uint32(1) << ((np.maximum(m_len, 1) - 1) % WORD).astype(np.uint32)
    # hmask[k, b] = high-bit mask if k is b's last block else 0
    hmask = np.where(
        np.arange(K)[:, None] == last_block[None, :], high_bit[None, :], 0
    ).astype(np.uint32)
    return peq, text, hmask, m_len, n_len, K


@jax.jit
def _myers_kernel(peq, text, hmask, m_len, n_len):
    """peq [K, A, B] u32, text [N, B] i32, hmask [K, B] u32 -> dist [B] i32."""
    K, A, B = peq.shape
    N = text.shape[0]
    ones = jnp.uint32(0xFFFFFFFF)

    def step(carry, tc):
        pv, mv, score, result, j = carry  # pv/mv [K, B]
        # select per-lane match masks for this text char
        eq_all = jnp.zeros((K, B), jnp.uint32)
        for c in range(ALPHA):
            eq_all = jnp.where(tc[None, :] == c, peq[:, c, :], eq_all)

        carry_ph = jnp.ones((B,), jnp.uint32)
        carry_mh = jnp.zeros((B,), jnp.uint32)
        new_pv = []
        new_mv = []
        delta = jnp.zeros((B,), jnp.int32)
        for k in range(K):
            eq0 = eq_all[k]
            pv_k = pv[k]
            mv_k = mv[k]
            eq = eq0 | carry_mh
            xv = eq | mv_k
            add = (eq & pv_k) + pv_k  # u32 wraps
            xh = (add ^ pv_k) | eq
            ph = mv_k | ~(xh | pv_k)
            mh = pv_k & xh
            delta = delta + ((ph & hmask[k]) != 0).astype(jnp.int32)
            delta = delta - ((mh & hmask[k]) != 0).astype(jnp.int32)
            ph_shift = (ph << 1) | carry_ph
            mh_shift = (mh << 1) | carry_mh
            carry_ph = ph >> 31
            carry_mh = mh >> 31
            new_pv.append(mh_shift | ~(xv | ph_shift))
            new_mv.append(ph_shift & xv)
        pv = jnp.stack(new_pv)
        mv = jnp.stack(new_mv)
        score = score + delta
        j = j + 1
        result = jnp.where(j == n_len, score, result)
        return (pv, mv, score, result, j), None

    pv0 = jnp.full((K, B), ones, jnp.uint32)
    mv0 = jnp.zeros((K, B), jnp.uint32)
    score0 = m_len.astype(jnp.int32)
    result0 = jnp.maximum(m_len, n_len).astype(jnp.int32)  # covers n == 0
    (pv, mv, score, result, j), _ = jax.lax.scan(
        step, (pv0, mv0, score0, result0, jnp.int32(0)), text
    )
    return result


def start_host_copy(device_arr):
    """Kick off an async device->host copy if the runtime supports it."""
    try:
        device_arr.copy_to_host_async()
    except Exception:
        pass
    return device_arr


def batched_edit_distance_myers(a_codes, b_codes, a_len, b_len, lazy=False):
    """Drop-in for dna_align.batched_edit_distance (XLA bit-parallel path).

    lazy=True returns a zero-arg closure finishing the host readback; the
    kernel is dispatched (and the D2H copy started) immediately, so callers
    can pipeline several buckets before blocking on any transfer.
    """
    a_codes = np.asarray(a_codes)
    b_codes = np.asarray(b_codes)
    a_len = np.asarray(a_len, np.int32)
    b_len = np.asarray(b_len, np.int32)
    peq, text, hmask, m_len, n_len, K = _precompute(a_codes, b_codes, a_len, b_len)
    out = _myers_kernel(
        jnp.asarray(peq),
        jnp.asarray(text),
        jnp.asarray(hmask),
        jnp.asarray(m_len),
        jnp.asarray(n_len),
    )
    # empty pattern: the bit machinery has no zero-width mode
    post = lambda host: np.where(m_len == 0, n_len, host)
    if lazy == "device":
        # (device_array, post) so the caller can fuse many buckets'
        # readbacks into ONE device->host transfer
        return out, post
    finish = lambda: post(np.asarray(out))
    if lazy:
        start_host_copy(out)
        return finish
    return finish()
