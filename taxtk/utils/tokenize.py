"""Field tokenizers with reference-exact semantics.

The reference tokenizer (reference: core/src/utils.hh:59-78) has two quirks
that downstream parsers rely on:
  * after `fieldnum` tokens are consumed, the remainder of the line is
    appended as one token, and
  * an extra (possibly empty) remainder token is ALWAYS appended — GFF3 tax
    paths are terminated by that empty token (predictionrecord.hh:340).
"""

from typing import List


def tokenize_single_char(s: str, delimiters: str, fieldnum: int = 0, trimempty: bool = False) -> List[str]:
    tokens: List[str] = []
    n = len(s)
    fn = fieldnum if fieldnum else n
    last = 0
    while fn and last < n:
        pos = _find_first_of(s, delimiters, last)
        if pos < 0:
            pos = n
            if pos != last or not trimempty:
                tokens.append(s[last:pos])
            last = pos
            break
        if pos != last or not trimempty:
            tokens.append(s[last:pos])
            fn -= 1
        last = pos + 1
    tokens.append(s[last:])
    return tokens


def tokenize_multi_char(s: str, delimiters: str, fieldnum: int = 0, trimempty: bool = False) -> List[str]:
    """Splits on the full delimiter string (reference: utils.hh:83-111);
    unlike the single-char variant, no unconditional trailing token."""
    tokens: List[str] = []
    n = len(s)
    fn = fieldnum if fieldnum else n
    last = 0
    dlen = len(delimiters)
    while fn and last < n:
        pos = s.find(delimiters, last)
        if pos < 0:
            pos = n
            if pos != last or not trimempty:
                tokens.append(s[last:pos])
            return tokens
        if pos != last or not trimempty:
            tokens.append(s[last:pos])
            fn -= 1
        last = pos + dlen
    tokens.append(s[last:])
    return tokens


def _find_first_of(s: str, chars: str, start: int) -> int:
    if len(chars) == 1:
        return s.find(chars, start)
    best = -1
    for c in chars:
        p = s.find(c, start)
        if p >= 0 and (best < 0 or p < best):
            best = p
    return best


def empty_line(line: str) -> bool:
    return len(line) == 0


def ignore_line(line: str) -> bool:
    return len(line) > 0 and line[0] == "#"


def masked_line(line: str) -> bool:
    return len(line) > 0 and line[0] == "*"
