"""Refpack sequence access: FASTA stores, .fai indexing, device encoding.

Mirrors the reference storage layer (reference: core/src/sequencestorage.hh,
core/src/faidx.h) with a TPU-friendly twist: sequences are returned as small
uint8 code arrays ready for device batching.

Store contracts (1-based inclusive coordinates):
  * IndexedFastaStore — samtools-compatible `.fai` random access; the stop
    position is clamped to the sequence length
    (reference: sequencestorage.hh:341-362); identifiers are the first
    whitespace-separated token of the header (faidx.h getRecordInfo).
  * InMemoryFastaStore — whole-file load keyed by the FULL header line
    (reference: sequencestorage.hh:57-140; doc/fileformats.md:71), optional
    identifier whitelist to reduce memory (taxator -w).

Alphabet encodings follow SeqAn so alignment results match the reference:
  DNA5:   A=0 C=1 G=2 T=3, everything else N=4; case-insensitive.
  AminoAcid (27): "ABCDEFGHIJKLMNOPQRSTUVWYZX*", unknown -> X.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..utils.errors import SequenceNotFound, FileError, ParsingError

DNA_ALPHABET_SIZE = 5
PROTEIN_ALPHABET_SIZE = 27

# --- encoding tables ---------------------------------------------------------

_DNA_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _DNA_TABLE[ord(_c)] = _i
    _DNA_TABLE[ord(_c.lower())] = _i

_DNA_COMPLEMENT = np.array([3, 2, 1, 0, 4], dtype=np.uint8)

_AA_ORDER = "ABCDEFGHIJKLMNOPQRSTUVWYZX*"
_AA_TABLE = np.full(256, _AA_ORDER.index("X"), dtype=np.uint8)
for _i, _c in enumerate(_AA_ORDER):
    _AA_TABLE[ord(_c)] = _i
    if _c.isalpha():
        _AA_TABLE[ord(_c.lower())] = _i


def encode_dna(seq: bytes | str) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return _DNA_TABLE[np.frombuffer(seq, dtype=np.uint8)]


def revcomp_dna(codes: np.ndarray) -> np.ndarray:
    return _DNA_COMPLEMENT[codes[::-1]]


def encode_protein(seq: bytes | str) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return _AA_TABLE[np.frombuffer(seq, dtype=np.uint8)]


def decode_dna(codes: np.ndarray) -> str:
    return "".join("ACGTN"[c] for c in codes)


def decode_protein(codes: np.ndarray) -> str:
    return "".join(_AA_ORDER[c] for c in codes)


# --- .fai index --------------------------------------------------------------


class FaiIndex:
    """samtools/SeqAn-compatible FASTA index.

    Columns: name, sequence length, byte offset of first base, bases per
    line, bytes per line (reference: faidx.h:553-567 save format).
    """

    def __init__(self):
        self.names: List[str] = []
        self.lengths: List[int] = []
        self.offsets: List[int] = []
        self.line_bases: List[int] = []
        self.line_widths: List[int] = []
        self.name2idx: Dict[str, int] = {}

    def __len__(self):
        return len(self.names)

    def add(self, name: str, length: int, offset: int, line_bases: int, line_width: int):
        self.name2idx[name] = len(self.names)
        self.names.append(name)
        self.lengths.append(length)
        self.offsets.append(offset)
        self.line_bases.append(line_bases)
        self.line_widths.append(line_width)

    @classmethod
    def build(cls, fasta_filename: str) -> "FaiIndex":
        idx = cls()
        with open(fasta_filename, "rb") as fh:
            name = None
            length = 0
            offset = 0
            lb = 0
            lw = 0
            seen_line = False
            pos = 0
            for raw in fh:
                linelen = len(raw)
                if raw.startswith(b">"):
                    if name is not None:
                        idx.add(name, length, offset, lb, lw)
                    header = raw[1:].rstrip(b"\r\n")
                    name = header.split()[0].decode("ascii") if header.split() else ""
                    length = 0
                    offset = pos + linelen
                    lb = lw = 0
                    seen_line = False
                elif name is not None:
                    bases = raw.rstrip(b"\r\n")
                    if bases:
                        if not seen_line:
                            lb = len(bases)
                            lw = linelen
                            seen_line = True
                        length += len(bases)
                pos += linelen
            if name is not None:
                idx.add(name, length, offset, lb, lw)
        return idx

    @classmethod
    def load(cls, fai_filename: str) -> "FaiIndex":
        idx = cls()
        with open(fai_filename, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                f = line.split("\t")
                if len(f) < 5:
                    raise ParsingError("bad .fai line", line=line)
                idx.add(f[0], int(f[1]), int(f[2]), int(f[3]), int(f[4]))
        return idx

    def save(self, fai_filename: str):
        with open(fai_filename, "w", encoding="utf-8") as fh:
            for i in range(len(self.names)):
                fh.write(
                    f"{self.names[i]}\t{self.lengths[i]}\t{self.offsets[i]}"
                    f"\t{self.line_bases[i]}\t{self.line_widths[i]}\n"
                )


# --- stores ------------------------------------------------------------------


class IndexedFastaStore:
    """Random access via .fai; builds and saves the index when missing
    (reference: sequencestorage.hh:321-330)."""

    def __init__(self, fasta_filename: str, index_filename: Optional[str] = None):
        self.fasta_filename = fasta_filename
        self.index_filename = index_filename or fasta_filename + ".fai"
        if os.path.exists(self.index_filename):
            self.index = FaiIndex.load(self.index_filename)
        else:
            self.index = FaiIndex.build(fasta_filename)
            try:
                self.index.save(self.index_filename)
            except OSError:
                pass  # read-only location: keep in-memory index
        self._fh = open(fasta_filename, "rb")
        self._native = None
        try:
            from ..native.faidx import NativeFaidx

            self._native = NativeFaidx(
                fasta_filename,
                self.index.lengths,
                self.index.offsets,
                self.index.line_bases,
                self.index.line_widths,
            )
        except Exception:
            self._native = None

    def close(self):
        self._fh.close()

    def sequence_length(self, seqid: str) -> int:
        i = self._resolve(seqid)
        return self.index.lengths[i]

    def _resolve(self, seqid: str) -> int:
        i = self.index.name2idx.get(seqid)
        if i is None:
            raise SequenceNotFound("sequence not found", seqid=seqid)
        return i

    def get_sequence(self, seqid: str, start: int, stop: int) -> bytes:
        """1-based inclusive [start, stop], stop clamped to sequence length."""
        i = self._resolve(seqid)
        length = self.index.lengths[i]
        stop = min(stop, length)
        if start < 1:
            start = 1
        if stop < start:
            return b""
        lb = self.index.line_bases[i]
        lw = self.index.line_widths[i]
        first = start - 1
        last = stop  # exclusive base count
        byte_start = self.index.offsets[i] + (first // lb) * lw + (first % lb)
        byte_end = self.index.offsets[i] + ((last - 1) // lb) * lw + ((last - 1) % lb) + 1
        self._fh.seek(byte_start)
        raw = self._fh.read(byte_end - byte_start)
        # strip line terminators
        return raw.replace(b"\n", b"").replace(b"\r", b"")

    def fetch_encode_batch(self, specs, protein: bool = False):
        """Batched region fetch + encode; specs = [(seqid, start, stop,
        revcomp)], returns list of uint8 code arrays.  Uses the native C++
        fetcher when available (taxtk/native/io.cpp)."""
        if self._native is not None:
            idx = [self._resolve(s[0]) for s in specs]
            return self._native.fetch_encode(
                idx,
                [s[1] for s in specs],
                [s[2] for s in specs],
                [s[3] for s in specs],
                protein,
            )
        out = []
        for seqid, start, stop, revcomp in specs:
            raw = self.get_sequence(seqid, start, stop)
            codes = encode_protein(raw) if protein else encode_dna(raw)
            if revcomp and not protein:
                codes = revcomp_dna(codes)
            out.append(codes)
        return out


class InMemoryFastaStore:
    """Whole-file FASTA store keyed by the full header line
    (reference: sequencestorage.hh:57-140)."""

    def __init__(self, fasta_filename: str, whitelist: Optional[Iterable[str]] = None):
        wl = set(whitelist) if whitelist is not None else None
        self.sequences: Dict[str, bytes] = {}
        with open(fasta_filename, "rb") as fh:
            name: Optional[str] = None
            chunks: List[bytes] = []
            for raw in fh:
                if raw.startswith(b">"):
                    if name is not None and (wl is None or name in wl):
                        self.sequences[name] = b"".join(chunks)
                    name = raw[1:].rstrip(b"\r\n").decode("utf-8")
                    chunks = []
                else:
                    chunks.append(raw.rstrip(b"\r\n"))
            if name is not None and (wl is None or name in wl):
                self.sequences[name] = b"".join(chunks)

    def sequence_length(self, seqid: str) -> int:
        return len(self._get(seqid))

    def _get(self, seqid: str) -> bytes:
        try:
            return self.sequences[seqid]
        except KeyError:
            raise SequenceNotFound("sequence not found", seqid=seqid) from None

    def get_sequence(self, seqid: str, start: int, stop: int) -> bytes:
        seq = self._get(seqid)
        stop = min(stop, len(seq))
        if start < 1:
            start = 1
        if stop < start:
            return b""
        return seq[start - 1 : stop]


def load_identifier_whitelist(filename: str) -> List[str]:
    """One identifier per line (reference: sequencestorage.hh:469-476)."""
    out = []
    with open(filename, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line:
                out.append(line)
    return out
