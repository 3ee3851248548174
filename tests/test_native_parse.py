"""Native columnar TSV parser: byte parity with the pure-Python parser."""

import io
import random

import pytest

from taxtk.formats.alignments import iter_alignment_records
from taxtk.native.faidx import load
from taxtk.native.parse import iter_alignment_records_fast
from taxtk.utils.errors import ParsingError

pytestmark = pytest.mark.skipif(load() is None, reason="native lib unavailable")


def _fuzz_lines(seed, n):
    rng = random.Random(seed)
    lines = []
    for _ in range(n):
        qs = rng.randint(1, 1000)
        qe = qs + rng.randint(0, 5000)
        qlen = qe + rng.randint(0, 100)
        rs = rng.randint(1, 100000)
        re = max(1, rs + rng.choice([-1, 1]) * rng.randint(0, 5000))
        score = rng.choice(["81.5", "100", "0.125", "12345.6", "3", "1e3"])
        ev = rng.choice(["0", "1e-100", "0.001", "1000", "2.5e-30"])
        mask = "*" if rng.random() < 0.1 else ""
        cig = rng.choice(["", "\tM100", "\tM100\textra\tstuff"])
        lines.append(
            f"{mask}q{rng.randint(0,99)}\t{qs}\t{qe}\t{qlen}\tr{rng.randint(0,99)}"
            f"\t{rs}\t{re}\t{score}\t{ev}\t{rng.randint(0, qe-qs+1)}"
            f"\t{rng.randint(1,6000)}{cig}"
        )
        if rng.random() < 0.1:
            lines.append("")
        if rng.random() < 0.1:
            lines.append("# a comment line")
    return lines


def _compare(text: str):
    fast = list(iter_alignment_records_fast(io.BytesIO(text.encode())))
    slow = list(iter_alignment_records(io.StringIO(text)))
    assert len(fast) == len(slow)
    for (lf, rf), (ls, rs) in zip(fast, slow):
        assert lf == ls
        assert rf == rs, (rf, rs)


def test_fuzz_parity():
    _compare("\n".join(_fuzz_lines(11, 500)) + "\n")


def test_no_trailing_newline():
    _compare("q\t1\t5\t10\tr\t3\t7\t50\t1e-3\t4\t5")


def test_chunk_boundary_lines(monkeypatch):
    # force tiny chunks so lines straddle read boundaries
    from taxtk.native import parse as P

    monkeypatch.setattr(P, "_CHUNK", 37)
    _compare("\n".join(_fuzz_lines(13, 120)) + "\n")


@pytest.mark.parametrize(
    "bad,reason",
    [
        ("q\t5\t2\t10\tr\t3\t7\t50\t1e-3\t4\t5", "reverse query positions"),
        ("q\t1\t2\t10\tr\t3\t7\tabc\t1e-3\t4\t5", "bad score"),
        ("q\t1\t2\t10\tr\t3\t7\t50\txx\t4\t5", "bad E-value"),
        ("q\t1\t2\t10\tr\t3\t7\t50\t1e-3\t4x\t5", "bad identity"),
        ("q\t1\t2\t10\tr\t3\t7\t50\t1e-3\t4\t5x", "bad alignment length"),
        ("q\t1\t2", "bad number of fields"),
        ("xy", "bad number of fields"),
        ("z", "too short"),
        ("q\t-1\t2\t10\tr\t3\t7\t50\t1e-3\t4\t5", "bad position"),
    ],
)
def test_error_parity(bad, reason):
    good = "q\t1\t5\t10\tr\t3\t7\t50\t1e-3\t4\t5"
    text = f"{good}\n{bad}\n{good}\n"
    with pytest.raises(ParsingError) as e_fast:
        list(iter_alignment_records_fast(io.BytesIO(text.encode())))
    with pytest.raises(ParsingError) as e_slow:
        list(iter_alignment_records(io.StringIO(text)))
    assert str(e_fast.value) == str(e_slow.value)
    assert reason.split()[0] in str(e_fast.value)
    # the valid prefix before the bad line is still yielded identically
    n_fast = sum(
        1 for _ in _safe_iter(iter_alignment_records_fast(io.BytesIO(text.encode())))
    )
    n_slow = sum(1 for _ in _safe_iter(iter_alignment_records(io.StringIO(text))))
    assert n_fast == n_slow == 1


def _safe_iter(it):
    try:
        yield from it
    except ParsingError:
        return
