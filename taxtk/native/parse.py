"""ctypes wrapper for the native columnar alignment-TSV parser (io.cpp).

`iter_alignment_records_fast` is a drop-in replacement for
`taxtk.formats.alignments.iter_alignment_records` that reads a BINARY
stream in large chunks, parses each chunk in C++ into columnar arrays, and
materializes `AlignmentRecord` objects from the columns.  On any native
parse error the offending chunk is re-parsed with the pure-Python parser so
the raised ParsingError (reason, value, line number) is byte-identical.

Falls back to the pure-Python path entirely when the native library cannot
be built.
"""

from __future__ import annotations

import ctypes
import io
from typing import Iterator, Tuple

import numpy as np

from ..formats.alignments import AlignmentRecord, iter_alignment_records
from .faidx import load

_CHUNK = 8 << 20


def _native_parse_chunk(lib, data: bytes, start_lineno: int):
    """Parse one chunk of whole lines; returns columns or raises ValueError
    with the failing absolute line number."""
    n_lines = data.count(b"\n") + 1
    qid_off = np.empty(n_lines, np.int64)
    qid_len = np.empty(n_lines, np.int32)
    rid_off = np.empty(n_lines, np.int64)
    rid_len = np.empty(n_lines, np.int32)
    nums = np.empty((n_lines, 7), np.int64)
    score = np.empty(n_lines, np.float32)
    evalue = np.empty(n_lines, np.float64)
    cig_off = np.empty(n_lines, np.int64)
    cig_len = np.empty(n_lines, np.int32)
    masked = np.empty(n_lines, np.uint8)
    lineno = np.empty(n_lines, np.int64)
    err_line = np.zeros(1, np.int64)
    I64P = ctypes.POINTER(ctypes.c_int64)
    I32P = ctypes.POINTER(ctypes.c_int32)
    n = lib.taxtk_parse_alignments(
        data,
        len(data),
        start_lineno,
        qid_off.ctypes.data_as(I64P),
        qid_len.ctypes.data_as(I32P),
        rid_off.ctypes.data_as(I64P),
        rid_len.ctypes.data_as(I32P),
        nums.ctypes.data_as(I64P),
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        evalue.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cig_off.ctypes.data_as(I64P),
        cig_len.ctypes.data_as(I32P),
        masked.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lineno.ctypes.data_as(I64P),
        err_line.ctypes.data_as(I64P),
    )
    if n < 0:
        raise ValueError(int(err_line[0]))
    return (
        qid_off[:n],
        qid_len[:n],
        rid_off[:n],
        rid_len[:n],
        nums[:n],
        score[:n],
        evalue[:n],
        cig_off[:n],
        cig_len[:n],
        masked[:n],
        lineno[:n],
    )


def _materialize(data: bytes, cols) -> list:
    """Columns -> [(lineno, AlignmentRecord)].  Runs with the cyclic GC
    paused: the bulk creation of millions of small objects otherwise
    triggers gen-0 collections that dominate the wall time (~9x here)."""
    import gc

    (qid_off, qid_len, rid_off, rid_len, nums, score, evalue,
     cig_off, cig_len, masked, lineno) = cols
    gc_was_on = gc.isenabled()
    if gc_was_on:
        gc.disable()
    try:
        qo = qid_off.tolist()
        ql = qid_len.tolist()
        ro = rid_off.tolist()
        rl = rid_len.tolist()
        nn = nums.tolist()
        sc = score.tolist()
        ev = evalue.tolist()
        co = cig_off.tolist()
        cl = cig_len.tolist()
        mk = masked.tolist()
        ln = lineno.tolist()
        # reference ids repeat heavily (one per refpack sequence): intern
        # the decoded strings keyed by the raw byte slice
        rid_cache = {}
        cache_get = rid_cache.get
        AR = AlignmentRecord
        out = []
        append = out.append
        for k in range(len(qo)):
            o = ro[k]
            rkey = data[o : o + rl[k]]
            rid = cache_get(rkey)
            if rid is None:
                rid = rkey.decode()
                rid_cache[rkey] = rid
            o = qo[k]
            num = nn[k]
            c = cl[k]
            o2 = co[k]
            append((ln[k], AR(
                data[o : o + ql[k]].decode(),
                num[0],
                num[1],
                num[2],
                rid,
                num[3],
                num[4],
                sc[k],
                ev[k],
                num[5],
                num[6],
                data[o2 : o2 + c].decode() if c else "",
                bool(mk[k]),
            )))
        return out
    finally:
        if gc_was_on:
            gc.enable()


def iter_alignment_records_fast(stream) -> Iterator[Tuple[int, AlignmentRecord]]:
    """Drop-in for iter_alignment_records over a binary OR text stream.

    Text streams (no .buffer, no bytes reads) fall back to the Python
    parser; so does a missing native library.
    """
    lib = load()
    if lib is None:
        yield from iter_alignment_records(stream)
        return
    if not hasattr(lib, "taxtk_parse_alignments"):
        return  # pragma: no cover - stale .so; loader rebuilds on mtime
    raw = getattr(stream, "buffer", stream)
    probe = raw.read(0)
    if not isinstance(probe, bytes):
        yield from iter_alignment_records(stream)
        return

    _setup_sig(lib)
    carry = b""
    lineno0 = 1
    while True:
        block = raw.read(_CHUNK)
        if not block:
            break
        buf = carry + block
        cut = buf.rfind(b"\n")
        if cut < 0:
            carry = buf
            continue
        chunk, carry = buf[: cut + 1], buf[cut + 1 :]
        yield from _parse_or_fallback(lib, chunk, lineno0)
        lineno0 += chunk.count(b"\n")
    if carry:
        yield from _parse_or_fallback(lib, carry, lineno0)


def _parse_or_fallback(lib, chunk: bytes, lineno0: int):
    try:
        cols = _native_parse_chunk(lib, chunk, lineno0)
    except ValueError:
        # exact-error path: replay the chunk through the Python parser,
        # which yields the valid prefix then raises the precise ParsingError
        text = io.TextIOWrapper(io.BytesIO(chunk))
        for k, rec in iter_alignment_records(text):
            yield lineno0 + k - 1, rec
        return
    yield from _materialize(chunk, cols)


def parse_records_block(lib, chunk: bytes, lineno0: int = 1) -> list:
    """Non-generator fast path: one pre-split chunk of whole lines ->
    [(lineno, AlignmentRecord)]; native errors raise via the Python parser
    for exact ParsingError parity."""
    try:
        cols = _native_parse_chunk(lib, chunk, lineno0)
    except ValueError:
        out = []
        text = io.TextIOWrapper(io.BytesIO(chunk))
        for k, rec in iter_alignment_records(text):
            out.append((lineno0 + k - 1, rec))
        return out
    return _materialize(chunk, cols)


_sig_done = False


def _setup_sig(lib):
    global _sig_done
    if _sig_done:
        return
    I64P = ctypes.POINTER(ctypes.c_int64)
    I32P = ctypes.POINTER(ctypes.c_int32)
    lib.taxtk_parse_alignments.restype = ctypes.c_int64
    lib.taxtk_parse_alignments.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        I64P,
        I32P,
        I64P,
        I32P,
        I64P,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        I64P,
        I32P,
        ctypes.POINTER(ctypes.c_uint8),
        I64P,
        I64P,
    ]
    _sig_done = True
