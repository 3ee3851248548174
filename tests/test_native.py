"""Native C++ runtime tests: Myers baseline + batched faidx fetcher."""

import numpy as np
import pytest

from taxtk.refpack.store import IndexedFastaStore, encode_dna, revcomp_dna
from taxtk.native import load as load_myers
from taxtk.native.faidx import load as load_io


FASTA = b""">chr1 first
ACGTACGTACGTACGTAC
GTNNACGTACGTACGTAC
GT
>chr2
TTTTGGGGCCAATTGGCC
AA
"""


@pytest.fixture
def store(tmp_path):
    fa = tmp_path / "ref.fna"
    fa.write_bytes(FASTA)
    return IndexedFastaStore(str(fa))


def test_native_io_builds():
    assert load_io() is not None


def test_fetch_encode_batch_matches_python(store):
    specs = [
        ("chr1", 1, 8, False),
        ("chr1", 15, 25, False),   # crosses a line break
        ("chr1", 17, 22, True),    # revcomp incl. N handling
        ("chr2", 1, 20, False),
        ("chr2", 5, 999, False),   # stop clamped
        ("chr1", 3, 2, False),     # empty region
    ]
    got = store.fetch_encode_batch(specs)
    for (seqid, start, stop, rc), arr in zip(specs, got):
        raw = store.get_sequence(seqid, start, stop)
        want = encode_dna(raw)
        if rc:
            want = revcomp_dna(want)
        np.testing.assert_array_equal(arr, want, err_msg=str((seqid, start, stop, rc)))


def test_fetch_encode_protein(tmp_path):
    fa = tmp_path / "ref.faa"
    fa.write_bytes(b">p1\nMKVLAWYZ\nXJ*\n")
    store = IndexedFastaStore(str(fa))
    got = store.fetch_encode_batch([("p1", 1, 11, False)], protein=True)
    from taxtk.refpack.store import encode_protein

    np.testing.assert_array_equal(got[0], encode_protein(b"MKVLAWYZXJ*"))


def test_native_myers_available():
    assert load_myers() is not None


def test_native_backend_aligner_matches_oracle():
    """BatchAligner(dna_backend="native") routes every DNA pair through the
    C++ work-stealing Myers batch and matches the oracle exactly (including
    empty pairs and the long-pattern sizes that would bypass device paths)."""
    from taxtk.engine.aligner import BatchAligner
    from taxtk.ops import oracle

    if load_myers() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    pairs = []
    for _ in range(40):
        la = int(rng.randint(0, 900))
        lb = int(rng.randint(1, 900))
        pairs.append(
            (
                rng.randint(0, 5, la).astype(np.uint8),
                rng.randint(0, 5, lb).astype(np.uint8),
            )
        )
    pairs.append((np.zeros(0, np.uint8), np.zeros(5, np.uint8)))
    # one pair past the device long-pattern threshold
    pairs.append(
        (
            rng.randint(0, 4, 7000).astype(np.uint8),
            rng.randint(0, 4, 7100).astype(np.uint8),
        )
    )
    al = BatchAligner("dna", dna_backend="native")
    vals = al.align_pairs(pairs)
    for (a, b), v in zip(pairs, vals):
        if len(a) == 0 or len(b) == 0:
            assert v.distance == max(len(a), len(b))
            continue
        r = oracle.dna_align(a, b)
        assert v.distance == np.float32(r.distance), (len(a), len(b))
        assert v.similarity == np.float32(r.similarity)
    assert al.cells_computed > 0
