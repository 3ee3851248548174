"""Batched global protein alignment (BLOSUM62, linear gaps) in JAX.

Anti-diagonal wavefront formulation of the reference protein kernel
(reference: taxonpredictionmodelsequence.hh:173-242).  Alongside the score we
carry two stat wavefronts — match count and diagonal-step count of the
traceback-preferred optimal path — so the reference's traceback-derived
match/mismatch/gap statistics come out of the forward pass with no traceback
memory:  with D diagonal steps on the path, V = lenA - D vertical and
H = lenB - D horizontal steps, so gap columns = lenA + lenB - 2D and
mismatches = D - matches.

Tie-breaking (calibrated against SeqAn, see tests/tools/seqan_oracle.cpp):
diagonal > vertical (gap in B) > horizontal (gap in A).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .blosum import BLOSUM62, GAP_SCORE

_NEG = np.int32(-(1 << 24))
_BLOSUM_FLAT = jnp.asarray(BLOSUM62.reshape(-1), dtype=jnp.int32)
_AA_N = BLOSUM62.shape[0]


@jax.jit
def _protein_kernel(a_ext, rbp, a_len, b_len):
    """Score + traceback stats wavefront scan.

    a_ext: [B, M+1] int32 codes (a_ext[:,0] dummy), rbp: [B, 2M+N+2] int32
    reversed-b padded with out-of-alphabet sentinel; lens [B] int32.
    Returns (mutual_score, matches, diag_steps) each int32 [B].
    """
    Bsz, Mp1 = a_ext.shape
    M = Mp1 - 1
    N = rbp.shape[1] - 2 * Mp1
    i_idx = jnp.arange(Mp1, dtype=jnp.int32)[None, :]
    gap = jnp.int32(GAP_SCORE)

    def shift(x, fill):
        return jnp.concatenate([jnp.full((Bsz, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def step(carry, d):
        (s_prev, s_pp, ma_prev, ma_pp, dc_prev, dc_pp, res) = carry
        start = Mp1 + N - d
        bx = jax.lax.dynamic_slice_in_dim(rbp, start, Mp1, axis=1)
        valid_pair = bx < _AA_N  # padding sentinel never gathers the table
        sub_idx = a_ext * _AA_N + jnp.where(valid_pair, bx, 0)
        sub = jnp.take(_BLOSUM_FLAT, sub_idx)
        is_match = (a_ext == bx) & valid_pair

        s_pp_s = shift(s_pp, _NEG)
        s_prev_s = shift(s_prev, _NEG)
        ma_pp_s = shift(ma_pp, 0)
        ma_prev_s = shift(ma_prev, 0)
        dc_pp_s = shift(dc_pp, 0)
        dc_prev_s = shift(dc_prev, 0)

        d_val = s_pp_s + sub
        v_val = s_prev_s + gap  # consume A char, gap column in B
        h_val = s_prev + gap  # consume B char, gap column in A
        best = jnp.maximum(jnp.maximum(d_val, v_val), h_val)
        # SeqAn preference (seqH = A): diagonal > consume-B > consume-A
        take_d = d_val == best
        take_h = (~take_d) & (h_val == best)

        new_s = best
        new_ma = jnp.where(
            take_d, ma_pp_s + is_match, jnp.where(take_h, ma_prev, ma_prev_s)
        )
        new_dc = jnp.where(take_d, dc_pp_s + 1, jnp.where(take_h, dc_prev, dc_prev_s))

        # boundary rows/cols: all-gap prefixes
        on_edge = (i_idx == 0) | (i_idx == d)
        new_s = jnp.where(on_edge, gap * d, new_s)
        new_ma = jnp.where(on_edge, 0, new_ma)
        new_dc = jnp.where(on_edge, 0, new_dc)

        # row-copy harvest (final lane gather happens after the scan)
        done = d == (a_len + b_len)[:, None]
        res = (
            jnp.where(done, new_s, res[0]),
            jnp.where(done, new_ma, res[1]),
            jnp.where(done, new_dc, res[2]),
        )
        return (new_s, s_prev, new_ma, ma_prev, new_dc, dc_prev, res), None

    zeros = jnp.zeros((Bsz, Mp1), jnp.int32)
    s0 = jnp.where(i_idx == 0, 0, _NEG) + jnp.zeros((Bsz, 1), jnp.int32)
    res0 = (
        jnp.broadcast_to(
            (gap * jnp.maximum(a_len, b_len))[:, None], (Bsz, Mp1)
        ),  # covers empty-sequence pairs
        zeros,
        zeros,
    )
    (_, _, _, _, _, _, res), _ = jax.lax.scan(
        step,
        (s0, zeros, zeros, zeros, zeros, zeros, res0),
        jnp.arange(1, M + N + 1, dtype=jnp.int32),
    )
    pick = lambda arr: jnp.take_along_axis(arr, a_len[:, None], axis=1)[:, 0]
    # one stacked output => ONE device->host transfer (the tunnel has ~170 ms
    # fixed latency per readback; three separate transfers dominated runtime)
    return jnp.stack([pick(res[0]), pick(res[1]), pick(res[2])])


def batched_protein_align(a_codes, b_codes, a_len, b_len, lazy=False):
    """Protein alignment for a padded batch.

    Returns dict of numpy arrays: mutual score, matches, mismatches, gaps,
    length, and the reference's float32 distance/similarity normalization
    (selfscore computed from the BLOSUM diagonal).  lazy=True returns a
    zero-arg finish closure instead (kernel dispatched immediately).
    """
    a_codes = np.asarray(a_codes)
    b_codes = np.asarray(b_codes)
    a_len = np.asarray(a_len, dtype=np.int32)
    b_len = np.asarray(b_len, dtype=np.int32)
    Bsz, M = a_codes.shape
    a_ext = np.concatenate([np.zeros((Bsz, 1), np.uint8), a_codes], axis=1)
    rb = b_codes[:, ::-1]
    pad = np.full((Bsz, M + 1), 255, np.uint8)
    rbp = np.concatenate([pad, rb, pad], axis=1)

    dev = _protein_kernel(
        jnp.asarray(a_ext, jnp.int32),
        jnp.asarray(rbp, jnp.int32),
        jnp.asarray(a_len),
        jnp.asarray(b_len),
    )

    def post(st):
        stacked = np.asarray(st)
        mutual, matches, diag = stacked[0], stacked[1], stacked[2]

        mismatches = diag - matches
        gaps = a_len + b_len - 2 * diag
        length = matches + mismatches + gaps

        diag_scores = np.diag(BLOSUM62)
        # selfscore over true (unpadded) lengths
        mask_a = np.arange(M)[None, :] < a_len[:, None]
        mask_b = np.arange(b_codes.shape[1])[None, :] < b_len[:, None]
        self_a = np.where(
            mask_a, diag_scores[np.minimum(a_codes, _AA_N - 1)], 0
        ).sum(axis=1)
        self_b = np.where(
            mask_b, diag_scores[np.minimum(b_codes, _AA_N - 1)], 0
        ).sum(axis=1)
        selfscore = (self_a + self_b).astype(np.int64)

        normfactor = length.astype(np.float32) / selfscore.astype(np.float32)
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
        return dev, post
    if lazy:
        from .myers_batch import start_host_copy

        start_host_copy(dev)
        return lambda: post(np.asarray(dev))
    return post(np.asarray(dev))
