"""The 11(+1)-column TAB-separated alignment format.

Contract (reference: doc/fileformats.md:11-35):
  qid qstart qstop qlen rid rstart rstop score evalue identities alnlen [cigar]
1-based inclusive positions; swapped reference coordinates denote the
reverse complement; swapped *query* positions are rejected
(reference: core/src/alignmentrecord.hh:95-158).  A '*' prefix masks the
record (pre-filtered but kept in the stream).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..constants import FIELD_SEPARATOR
from ..utils.errors import ParsingError
from ..utils.fmt import cxx_float, cxx_double
from ..utils.tokenize import tokenize_single_char, empty_line, ignore_line


@dataclass
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
    fields = tokenize_single_char(body, FIELD_SEPARATOR, 12, False)
    if len(fields) < 11:
        raise ParsingError("bad number of fields in alignment line")

    rec = AlignmentRecord(masked=masked)
    rec.query_start = _parse_uint(fields[1], "bad position number or query length")
    rec.query_stop = _parse_uint(fields[2], "bad position number or query length")
    if rec.query_start > rec.query_stop:
        raise ParsingError(
            "reverse query positions not allowed (only reference positions can "
            "be swapped to indicate the reverse complement, adjust input"
        )
    rec.query_length = _parse_uint(fields[3], "bad position number or query length")
    rec.reference_start = _parse_uint(fields[5], "bad position number or query length")
    rec.reference_stop = _parse_uint(fields[6], "bad position number or query length")
    try:
        rec.score = np.float32(fields[7])
    except ValueError:
        raise ParsingError("bad score", value=fields[7]) from None
    try:
        rec.evalue = float(fields[8])
    except ValueError:
        raise ParsingError("bad E-value", value=fields[8]) from None
    rec.identities = _parse_uint(fields[9], "bad identity value")
    rec.alignment_length = _parse_uint(fields[10], "bad alignment length")
    if len(fields) >= 12:
        rec.alignment_code = fields[11]
    rec.query_identifier = fields[0]
    rec.reference_identifier = fields[4]
    return rec


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
