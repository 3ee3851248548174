"""The 11(+1)-column TAB-separated alignment format.

Contract (reference: doc/fileformats.md:11-35):
  qid qstart qstop qlen rid rstart rstop score evalue identities alnlen [cigar]
1-based inclusive positions; swapped reference coordinates denote the
reverse complement; swapped *query* positions are rejected
(reference: core/src/alignmentrecord.hh:95-158).  A '*' prefix masks the
record (pre-filtered but kept in the stream).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_f32_pack = struct.Struct("<f")


def _float32(text: str) -> float:
    # value rounded to float32 but held as a python float: exactly what
    # boost::lexical_cast<float> produces, without numpy scalar overhead
    return _f32_pack.unpack(_f32_pack.pack(float(text)))[0]

from ..constants import FIELD_SEPARATOR
from ..utils.errors import ParsingError
from ..utils.fmt import cxx_float, cxx_double
from ..utils.tokenize import tokenize_single_char, empty_line, ignore_line


@dataclass(slots=True)
class AlignmentRecord:
    query_identifier: str = ""
    query_start: int = 0
    query_stop: int = 0
    query_length: int = 0
    reference_identifier: str = ""
    reference_start: int = 0
    reference_stop: int = 0
    score: np.float32 = np.float32(0)
    evalue: float = 0.0
    identities: int = 0
    alignment_length: int = 0
    alignment_code: str = ""
    masked: bool = False
    # resolved taxonomy node index (AlignmentRecordTaxonomy analog); -1 unset
    reference_node: int = -1

    @property
    def pid(self) -> float:
        # reference: alignmentrecord.hh:81-83
        return self.identities / float(max(self.query_length, self.alignment_length))

    def sort_key(self):
        """Ascending sort key per reference operator< (alignmentrecord.hh:89-93):
        (score, identities)."""
        return (float(self.score), self.identities)

    def print_line(self) -> str:
        """Serialize exactly like reference print (alignmentrecord.hh:160-178):
        note the trailing separator after the CIGAR column."""
        prefix = "*" if self.masked else ""
        return (
            prefix
            + FIELD_SEPARATOR.join(
                (
                    self.query_identifier,
                    str(self.query_start),
                    str(self.query_stop),
                    str(self.query_length),
                    self.reference_identifier,
                    str(self.reference_start),
                    str(self.reference_stop),
                    cxx_float(self.score),
                    cxx_double(self.evalue),
                    str(self.identities),
                    str(self.alignment_length),
                    self.alignment_code,
                )
            )
            + FIELD_SEPARATOR
        )


def _parse_uint(text: str, what: str) -> int:
    # boost::lexical_cast<large_unsigned_int>: digits only, no sign/space
    if not text.isdigit():
        raise ParsingError(what, value=text)
    return int(text)


def parse_alignment_line(line: str) -> AlignmentRecord:
    if len(line) <= 1:
        raise ParsingError("alignment line too short")
    masked = line[0] == "*"
    body = line[1:] if masked else line
    # fast path: str.split matches the reference tokenizer for field
    # extraction (the always-appended empty remainder token only matters
    # beyond column 12, which parse ignores)
    fields = body.split(FIELD_SEPARATOR, 12)
    if len(fields) < 11:
        raise ParsingError("bad number of fields in alignment line")

    # inlined digit-validated int parsing (boost::lexical_cast semantics:
    # plain digits only, no sign/space/underscore)
    f1, f2, f3, f5, f6, f9, f10 = (
        fields[1], fields[2], fields[3], fields[5], fields[6], fields[9], fields[10]
    )
    if not (
        f1.isdigit() and f2.isdigit() and f3.isdigit()
        and f5.isdigit() and f6.isdigit()
    ):
        raise ParsingError("bad position number or query length")
    query_start = int(f1)
    query_stop = int(f2)
    if query_start > query_stop:
        raise ParsingError(
            "reverse query positions not allowed (only reference positions can "
            "be swapped to indicate the reverse complement, adjust input"
        )
    try:
        score = _float32(fields[7])
    except ValueError:
        raise ParsingError("bad score", value=fields[7]) from None
    try:
        evalue = float(fields[8])
    except ValueError:
        raise ParsingError("bad E-value", value=fields[8]) from None
    if not f9.isdigit():
        raise ParsingError("bad identity value", value=f9)
    if not f10.isdigit():
        raise ParsingError("bad alignment length", value=f10)
    return AlignmentRecord(
        query_identifier=fields[0],
        query_start=query_start,
        query_stop=query_stop,
        query_length=int(f3),
        reference_identifier=fields[4],
        reference_start=int(f5),
        reference_stop=int(f6),
        score=score,
        evalue=evalue,
        identities=int(f9),
        alignment_length=int(f10),
        alignment_code=fields[11] if len(fields) >= 12 else "",
        masked=masked,
    )


def iter_alignment_records(stream):
    """Line-based lazy parsing; skips comments and empty lines
    (reference: fileparser.hh:29-77). Yields (line_number, AlignmentRecord)."""
    for lineno, raw in enumerate(stream, 1):
        line = raw.rstrip("\n")
        if empty_line(line) or ignore_line(line):
            continue
        try:
            yield lineno, parse_alignment_line(line)
        except ParsingError as e:
            e.info["line"] = lineno
            raise
