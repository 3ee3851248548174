"""SeqAn-exact protein alignment art for the decision log.

The reference streams SeqAn's ASCII rendering of every protein
re-alignment into its logsink (`logsink << queryalignment` —
taxonpredictionmodelsequence.hh:534,:637,:783,:803; layout:
includes-external/seqan/align/align_base.h `_write`).  This module
reproduces those bytes exactly:

  * traceback: global NW (BLOSUM62, linear gap -1) walked with SeqAn's
    preference diagonal > vertical (consume B, gap in the A row) >
    horizontal — verified 0/500 mismatches against the compiled SeqAn
    oracle (tests/tools/seqan_oracle);
  * layout: 50-column windows; a `%7u`-numbered ruler line (`:` every
    10, `.` every 5), the two gapped rows and a `|` match line, each
    behind 8 spaces; a blank line per window, one more after the last,
    and the logsink's own std::endl.

Logging-path only (taxator -l); the hot path never builds alignments.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..ops.blosum import AA_ORDER, BLOSUM62, GAP_SCORE


def _traceback_py(a: np.ndarray, b: np.ndarray) -> str:
    """Pure-Python fallback for taxtk_protein_nw_traceback (same walk)."""
    m, n = len(a), len(b)
    S = np.zeros((m + 1, n + 1), np.int32)
    S[:, 0] = np.arange(m + 1) * GAP_SCORE
    S[0, :] = np.arange(n + 1) * GAP_SCORE
    for i in range(1, m + 1):
        srow = BLOSUM62[a[i - 1]]
        prev = S[i - 1]
        row = S[i]
        for j in range(1, n + 1):
            row[j] = max(prev[j - 1] + srow[b[j - 1]], prev[j] + GAP_SCORE,
                         row[j - 1] + GAP_SCORE)
    i, j = m, n
    cols: List[str] = []
    while i > 0 or j > 0:
        s = S[i, j]
        if (i > 0 and j > 0
                and s == S[i - 1, j - 1] + BLOSUM62[a[i - 1]][b[j - 1]]):
            cols.append("M" if a[i - 1] == b[j - 1] else "X")
            i -= 1
            j -= 1
        elif j > 0 and s == S[i, j - 1] + GAP_SCORE:
            cols.append("A")
            j -= 1
        else:
            cols.append("B")
            i -= 1
    return "".join(reversed(cols))


def seqan_traceback(a: np.ndarray, b: np.ndarray) -> str:
    from ..native import protein_nw_traceback

    tb = protein_nw_traceback(a, b)
    if tb is None:
        tb = _traceback_py(np.asarray(a), np.asarray(b))
    return tb


def render_alignment_art(a: np.ndarray, b: np.ndarray) -> List[str]:
    """The exact lines `logsink << alignment` adds after a protein +ALN
    line, INCLUDING the operator's final blank line but NOT the
    logsink's own std::endl (the caller appends that empty line, the
    same slot the DNA path's empty alignment occupies)."""
    tb = seqan_traceback(a, b)
    row0: List[str] = []
    row1: List[str] = []
    ia = ib = 0
    for c in tb:
        if c == "A":
            row0.append("-")
            row1.append(AA_ORDER[b[ib]])
            ib += 1
        elif c == "B":
            row0.append(AA_ORDER[a[ia]])
            row1.append("-")
            ia += 1
        else:
            row0.append(AA_ORDER[a[ia]])
            row1.append(AA_ORDER[b[ib]])
            ia += 1
            ib += 1
    r0 = "".join(row0)
    r1 = "".join(row1)
    L = len(tb)
    lines: List[str] = []
    base = 0
    begin = 0
    while begin < L:
        w = min(50, L - begin)
        ruler = "".join(
            ":" if i % 10 == 0 else "." if i % 5 == 0 else " "
            for i in range(1, w + 1)
        )
        lines.append("%7u " % base + ruler + " ")
        base += w
        s0 = r0[begin:begin + w]
        s1 = r1[begin:begin + w]
        match = "".join(
            "|" if (x != "-" and y != "-" and x == y) else " "
            for x, y in zip(s0, s1)
        )
        lines.append(" " * 8 + s0)
        lines.append(" " * 8 + match)
        lines.append(" " * 8 + s1)
        lines.append("")
        begin += 50
    lines.append("")  # _write's final '\n'
    return lines
