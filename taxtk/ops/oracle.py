"""NumPy reference implementations of the alignment kernels.

These are the ground truth the JAX/Pallas kernels are tested against, and the
documentation of the exact semantics adopted from the reference:

* DNA: global unit-cost edit distance with the Myers bit-vector *approximate
  statistics* convention (reference: taxonpredictionmodelsequence.hh:133-171):
  gaps = |len(A)-len(B)| (lower bound), mismatches = dist - gaps (upper
  bound), matches = min-len - mismatches (lower bound).  N==N counts as a
  match (SeqAn Dna5 equality is code equality).

* Protein: Needleman-Wunsch, BLOSUM62 (27-letter alphabet), linear gap -1,
  with match/mismatch/gap-column counts along the SeqAn traceback.  SeqAn's
  traceback prefers, on score ties, diagonal > vertical (gap in B, consuming
  an A char) > horizontal (gap in A) — calibrated against the vendored SeqAn
  via tests/tools/seqan_oracle.cpp.  Distance/similarity normalization per
  reference taxonpredictionmodelsequence.hh:227-233 in float32:
    len        = matches + mismatches + gapcols
    normfactor = len / selfscore
    distance   = (selfscore - 2*mutual) * normfactor
    similarity = (2*mutual) * normfactor
  where selfscore = sum of BLOSUM62 diagonal over A plus over B.  This
  equals SeqAn's full self-alignment: BLOSUM62 satisfies
  2*s(x,y) <= s(x,x) + s(y,y) for every letter pair (verified exhaustively
  over the 27-letter alphabet), so any matching of positions scores at most
  the identity matching and gap columns only subtract — the identity
  alignment is optimal (also brute-force-checked against NW including the
  X/O/U/* letters whose diagonals are not row maxima).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .blosum import BLOSUM62, GAP_SCORE


@dataclass
class AlignmentResult:
    matches: int
    mismatches: int
    gaps: int
    length: int
    distance: np.float32
    similarity: np.float32


def edit_distance(a: np.ndarray, b: np.ndarray) -> int:
    """Global unit-cost edit distance (row-vectorized NumPy DP)."""
    m, n = len(a), len(b)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = np.arange(n + 1, dtype=np.int32)
    jj = np.arange(n, dtype=np.int32)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int32)
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        dele = prev[1:] + 1
        t = np.minimum(sub, dele)
        # resolve the left-to-right insertion dependency with a prefix-min:
        # cur[c] = min( min_{k<=c}(t[k] + c - k), cur[0] + c )
        cand = np.minimum.accumulate(t - jj) + jj
        cur[1:] = np.minimum(cand, i + 1 + jj)
        prev = cur
    return int(prev[n])


def dna_align(a: np.ndarray, b: np.ndarray) -> AlignmentResult:
    """Reference DNA kernel semantics (taxonpredictionmodelsequence.hh:133-171)."""
    dist = edit_distance(a, b)
    lendiff = abs(len(a) - len(b))
    gaps = lendiff
    mismatches = dist - lendiff
    matches = min(len(a), len(b)) - mismatches
    return AlignmentResult(
        matches=matches,
        mismatches=mismatches,
        gaps=gaps,
        length=matches + mismatches + gaps,
        distance=np.float32(dist),
        similarity=np.float32(matches),
    )


def protein_selfscore(codes: np.ndarray) -> int:
    diag = np.diag(BLOSUM62)
    return int(diag[codes].sum())


# traceback predecessor preference (calibrated against SeqAn):
#   diagonal > vertical (consume A char, gap column in B) > horizontal
def protein_align(a: np.ndarray, b: np.ndarray) -> AlignmentResult:
    m, n = len(a), len(b)
    NEG = np.int32(-(10**9))
    S = np.full((m + 1, n + 1), 0, dtype=np.int32)
    S[0, :] = GAP_SCORE * np.arange(n + 1)
    S[:, 0] = GAP_SCORE * np.arange(m + 1)
    # stats[i,j] = (match, mismatch, gapcols) of the traceback-preferred path
    MA = np.zeros((m + 1, n + 1), dtype=np.int32)
    MI = np.zeros((m + 1, n + 1), dtype=np.int32)
    GA = np.zeros((m + 1, n + 1), dtype=np.int32)
    GA[0, :] = np.arange(n + 1)
    GA[:, 0] = np.arange(m + 1)
    for i in range(1, m + 1):
        sub = BLOSUM62[a[i - 1], b]  # [n]
        for j in range(1, n + 1):
            d = S[i - 1, j - 1] + sub[j - 1]
            v = S[i - 1, j] + GAP_SCORE
            h = S[i, j - 1] + GAP_SCORE
            best = max(d, v, h)
            S[i, j] = best
            # SeqAn cell preference: diagonal, then its VERTICAL (consume a
            # char of B = gap column in A, move j-1), then HORIZONTAL
            # (consume A char = gap column in B, move i-1): seqH is A.
            if d == best:
                MA[i, j] = MA[i - 1, j - 1] + (a[i - 1] == b[j - 1])
                MI[i, j] = MI[i - 1, j - 1] + (a[i - 1] != b[j - 1])
                GA[i, j] = GA[i - 1, j - 1]
            elif h == best:
                MA[i, j] = MA[i, j - 1]
                MI[i, j] = MI[i, j - 1]
                GA[i, j] = GA[i, j - 1] + 1
            else:
                MA[i, j] = MA[i - 1, j]
                MI[i, j] = MI[i - 1, j]
                GA[i, j] = GA[i - 1, j] + 1
    mutual = int(S[m, n])
    match, mismatch, gap = int(MA[m, n]), int(MI[m, n]), int(GA[m, n])
    selfscore = protein_selfscore(a) + protein_selfscore(b)
    length = match + mismatch + gap
    normfactor = np.float32(length) / np.float32(selfscore)
    distance = np.float32(selfscore - 2 * mutual) * normfactor
    similarity = np.float32(2 * mutual) * normfactor
    return AlignmentResult(
        matches=match,
        mismatches=mismatch,
        gaps=gap,
        length=length,
        distance=distance,
        similarity=similarity,
    )
