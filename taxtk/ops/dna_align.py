"""Batched global edit distance — anti-diagonal wavefront DP in JAX.

TPU-native reformulation of the reference DNA kernel (SeqAn MyersBitVector,
reference: taxonpredictionmodelsequence.hh:133-171).  Instead of a bit-vector
scan per pair on a CPU core, we compute a *batch* of pairwise DP matrices at
once: the DP recurrence along an anti-diagonal has no intra-step dependency —
  D[i,j] = min(D[i-1,j]+1, D[i,j-1]+1, D[i-1,j-1]+cost)
touches only the two previous anti-diagonals, so one `lax.scan` step updates
a whole [batch, M+1] wavefront with pure element-wise VPU work.  Ragged pairs
are padded into shape buckets; the per-pair result is harvested from the
wavefront at step d = len(A)+len(B), position i = len(A) (padding never
contaminates cells of the true submatrix because DP cells only depend on
smaller i,j).

Statistics follow the reference's approximate-stat convention (dna_align
oracle docstring): only the distance needs the kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_BIG = np.int32(1 << 24)


@functools.partial(jax.jit, static_argnums=())
def _edit_distance_kernel(a_ext, rbp, a_len, b_len):
    """a_ext: [B, M+1] codes with a_ext[:,0] dummy; rbp: [B, 2M+N+2] reversed-b
    padded on both sides with M+1 entries; lens: [B] int32."""
    Bsz, Mp1 = a_ext.shape
    M = Mp1 - 1
    N = rbp.shape[1] - 2 * Mp1
    i_idx = jnp.arange(Mp1, dtype=jnp.int32)[None, :]

    def shift_right(x):
        return jnp.concatenate([jnp.full((Bsz, 1), _BIG, x.dtype), x[:, :-1]], axis=1)

    target_d = (a_len + b_len)[:, None]

    def step(carry, d):
        prev, prevprev, result = carry
        start = Mp1 + N - d
        bx = jax.lax.dynamic_slice_in_dim(rbp, start, Mp1, axis=1)
        cost = (a_ext != bx).astype(jnp.int32)
        new = jnp.minimum(
            jnp.minimum(prev + 1, shift_right(prev) + 1),
            shift_right(prevprev) + cost,
        )
        new = jnp.where(i_idx == 0, d, new)
        new = jnp.where(i_idx == d, d, new)
        # row-copy harvest: the answer row is frozen at its target diagonal,
        # the lane extraction happens once after the scan (gather-free steps)
        result = jnp.where(d == target_d, new, result)
        return (new, prev, result), None

    prev0 = jnp.where(i_idx == 0, 0, _BIG) + jnp.zeros((Bsz, 1), jnp.int32)
    prevprev0 = jnp.zeros((Bsz, Mp1), jnp.int32)
    result0 = jnp.broadcast_to(
        jnp.maximum(a_len, b_len)[:, None], (Bsz, Mp1)
    )  # covers a_len+b_len == 0 edge
    (_, _, result), _ = jax.lax.scan(
        step, (prev0, prevprev0, result0), jnp.arange(1, M + N + 1, dtype=jnp.int32)
    )
    return jnp.take_along_axis(result, a_len[:, None], axis=1)[:, 0]


def batched_edit_distance(a_codes, b_codes, a_len, b_len):
    """Edit distances for a padded batch.

    a_codes: [B, M] uint8 (padded), b_codes: [B, N] uint8, lens: [B].
    Returns int32 [B].
    """
    a_codes = jnp.asarray(a_codes)
    b_codes = jnp.asarray(b_codes)
    a_len = jnp.asarray(a_len, dtype=jnp.int32)
    b_len = jnp.asarray(b_len, dtype=jnp.int32)
    Bsz, M = a_codes.shape
    N = b_codes.shape[1]
    a_ext = jnp.concatenate(
        [jnp.zeros((Bsz, 1), a_codes.dtype), a_codes], axis=1
    ).astype(jnp.int32)
    rb = jnp.flip(b_codes, axis=1).astype(jnp.int32)
    pad = jnp.full((Bsz, M + 1), 255, jnp.int32)
    rbp = jnp.concatenate([pad, rb, pad], axis=1)
    return _edit_distance_kernel(a_ext, rbp, a_len, b_len)


def dna_alignment_stats(dist: np.ndarray, a_len: np.ndarray, b_len: np.ndarray):
    """Derive the reference's approximate statistics from the distance
    (reference: taxonpredictionmodelsequence.hh:153-159)."""
    dist = np.asarray(dist)
    a_len = np.asarray(a_len)
    b_len = np.asarray(b_len)
    lendiff = np.abs(a_len - b_len)
    gaps = lendiff
    mismatches = dist - lendiff
    matches = np.minimum(a_len, b_len) - mismatches
    return {
        "matches": matches,
        "mismatches": mismatches,
        "gaps": gaps,
        "length": matches + mismatches + gaps,
        "distance": dist.astype(np.float32),
        "similarity": matches.astype(np.float32),
    }
