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


def test_native_protein_nw_matches_seqan_golden():
    """The native protein CPU baseline (BLOSUM62 + linear-gap global NW,
    native/protein.cpp — the reference algorithm of
    taxonpredictionmodelsequence.hh:173-242) is bit-exact against the
    vendored-SeqAn golden corpus, mutual scores AND selfscores."""
    import os

    from taxtk.native import protein_nw_batch
    from taxtk.ops.blosum import AA_ORDER

    if load_myers() is None:
        pytest.skip("native toolchain unavailable")
    idx = {c: i for i, c in enumerate(AA_ORDER)}
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    pairs, exp_mutual, exp_self = [], [], []
    for name in ("seqan_golden.tsv", "seqan_golden_r2.tsv"):
        with open(os.path.join(fixtures, name)) as fh:
            for line in fh:
                if not line.startswith("prot"):
                    continue
                _, sa, sb, vals = line.rstrip("\n").split("\t")
                self_, mutual = map(int, vals.split(",")[:2])
                pairs.append(
                    (np.array([idx[c] for c in sa], np.uint8),
                     np.array([idx[c] for c in sb], np.uint8)))
                exp_mutual.append(mutual)
                exp_self.append(self_)
    assert len(pairs) > 1000
    got = protein_nw_batch(pairs, n_threads=1)
    assert got.tolist() == exp_mutual
    selfs = (protein_nw_batch([(a, a) for a, _ in pairs], n_threads=0)
             + protein_nw_batch([(b, b) for _, b in pairs], n_threads=0))
    assert selfs.tolist() == exp_self


def test_native_protein_nw_empty_and_threads():
    from taxtk.native import protein_nw_batch

    if load_myers() is None:
        pytest.skip("native toolchain unavailable")
    assert protein_nw_batch([], n_threads=1).tolist() == []
    a = np.array([0, 2, 3], np.uint8)
    empty = np.zeros(0, np.uint8)
    # empty side: pure gap run at -1/position
    assert protein_nw_batch([(a, empty)], n_threads=1).tolist() == [-3]
    rng = np.random.RandomState(3)
    pairs = [
        (rng.randint(0, 24, rng.randint(1, 60)).astype(np.uint8),
         rng.randint(0, 24, rng.randint(1, 60)).astype(np.uint8))
        for _ in range(40)
    ]
    st = protein_nw_batch(pairs, n_threads=1)
    mt = protein_nw_batch(pairs, n_threads=0)
    assert st.tolist() == mt.tolist()
