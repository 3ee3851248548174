"""seqid -> taxid mapping files (refpack `mapping.tax`).

TSV with two columns `seqid<TAB>taxid` (reference: core/src/accessconv.hh:51-99
loads this into a hat-trie; a plain dict serves the same contract here —
missing keys raise, mirroring the out_of_range behaviour that taxator turns
into a fatal 'bad taxon mapping' error).
"""

from typing import Dict

from ..utils.tokenize import tokenize_single_char, empty_line, ignore_line


def load_seqid_taxid_mapping(filename: str) -> Dict[str, str]:
    mapping: Dict[str, str] = {}
    with open(filename, "r", encoding="utf-8") as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if empty_line(line) or ignore_line(line):
                continue
            fields = tokenize_single_char(line, "\t", 2, False)
            if len(fields) >= 2 and fields[0] and fields[1]:
                mapping[fields[0]] = fields[1]
    return mapping
