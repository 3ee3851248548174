"""Alignment kernel tests: JAX wavefront kernels vs NumPy oracle vs SeqAn.

The NumPy oracle itself was calibrated against the vendored SeqAn (reference
DNA kernel: MyersBitVector edit distance; protein kernel: Blosum62+LinearGaps
with traceback stats) — see tests/tools/seqan_oracle.cpp.
"""

import random
import subprocess

import numpy as np
import pytest

from taxtk.ops import oracle
from taxtk.ops.dna_align import batched_edit_distance, dna_alignment_stats
from taxtk.ops.protein_align import batched_protein_align
from taxtk.refpack.store import encode_dna, encode_protein

DNA = "ACGTN"
AA = "ACDEFGHIKLMNPQRSTVWY"


def _random_pairs(alphabet, n, lmin, lmax, seed, mutated=False):
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        if mutated:
            l = rng.randint(max(lmin, 2), lmax)
            base = [rng.choice(alphabet) for _ in range(l)]
            bl = list(base)
            for _ in range(rng.randint(0, max(2, l // 8))):
                op = rng.choice("smid")
                p = rng.randrange(len(bl)) if bl else 0
                if op == "s" and bl:
                    bl[p] = rng.choice(alphabet)
                elif op == "i":
                    bl.insert(p, rng.choice(alphabet))
                elif op == "d" and len(bl) > 1:
                    del bl[p]
            pairs.append(("".join(base), "".join(bl)))
        else:
            la, lb = rng.randint(lmin, lmax), rng.randint(lmin, lmax)
            pairs.append(
                (
                    "".join(rng.choice(alphabet) for _ in range(la)),
                    "".join(rng.choice(alphabet) for _ in range(lb)),
                )
            )
    return pairs


def _pad_batch(codes_list):
    n = len(codes_list)
    m = max((len(c) for c in codes_list), default=1) or 1
    out = np.zeros((n, m), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, c in enumerate(codes_list):
        out[i, : len(c)] = c
        lens[i] = len(c)
    return out, lens


class TestEditDistanceOracle:
    def test_basic(self):
        assert oracle.edit_distance(encode_dna("ACGT"), encode_dna("ACGT")) == 0
        assert oracle.edit_distance(encode_dna("ACGT"), encode_dna("ACTT")) == 1
        assert oracle.edit_distance(encode_dna("ACGT"), encode_dna("AGT")) == 1
        assert oracle.edit_distance(encode_dna(""), encode_dna("ACGT")) == 4
        # N matches N (SeqAn Dna5 code equality)
        assert oracle.edit_distance(encode_dna("NN"), encode_dna("NN")) == 0
        assert oracle.edit_distance(encode_dna("AN"), encode_dna("AA")) == 1

    def test_vs_python_dp(self):
        # independent O(nm) scalar DP as a second opinion
        def slow(a, b):
            m, n = len(a), len(b)
            D = [[0] * (n + 1) for _ in range(m + 1)]
            for i in range(m + 1):
                D[i][0] = i
            for j in range(n + 1):
                D[0][j] = j
            for i in range(1, m + 1):
                for j in range(1, n + 1):
                    D[i][j] = min(
                        D[i - 1][j] + 1,
                        D[i][j - 1] + 1,
                        D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return D[m][n]

        for a, b in _random_pairs(DNA, 40, 0, 30, seed=1):
            ea, eb = encode_dna(a), encode_dna(b)
            assert oracle.edit_distance(ea, eb) == slow(list(ea), list(eb))


class TestBatchedEditDistance:
    def test_vs_oracle_random(self):
        pairs = _random_pairs(DNA, 64, 1, 90, seed=7) + _random_pairs(
            DNA, 64, 5, 90, seed=8, mutated=True
        )
        a_codes, a_len = _pad_batch([encode_dna(a) for a, _ in pairs])
        b_codes, b_len = _pad_batch([encode_dna(b) for _, b in pairs])
        got = np.asarray(batched_edit_distance(a_codes, b_codes, a_len, b_len))
        want = np.array(
            [oracle.edit_distance(encode_dna(a), encode_dna(b)) for a, b in pairs]
        )
        np.testing.assert_array_equal(got, want)

    def test_empty_and_degenerate(self):
        a_codes, a_len = _pad_batch([encode_dna(""), encode_dna("ACG"), encode_dna("")])
        b_codes, b_len = _pad_batch([encode_dna("AC"), encode_dna(""), encode_dna("")])
        got = np.asarray(batched_edit_distance(a_codes, b_codes, a_len, b_len))
        np.testing.assert_array_equal(got, [2, 3, 0])

    def test_stats_convention(self):
        # reference approximate stats (taxonpredictionmodelsequence.hh:153-159)
        stats = dna_alignment_stats(np.array([3]), np.array([10]), np.array([8]))
        assert stats["gaps"][0] == 2
        assert stats["mismatches"][0] == 1
        assert stats["matches"][0] == 7
        assert stats["length"][0] == 10


class TestProteinAlign:
    def test_kernel_vs_oracle(self):
        pairs = _random_pairs(AA, 48, 1, 60, seed=11) + _random_pairs(
            AA, 48, 5, 60, seed=12, mutated=True
        )
        a_codes, a_len = _pad_batch([encode_protein(a) for a, _ in pairs])
        b_codes, b_len = _pad_batch([encode_protein(b) for _, b in pairs])
        got = batched_protein_align(a_codes, b_codes, a_len, b_len)
        for i, (a, b) in enumerate(pairs):
            want = oracle.protein_align(encode_protein(a), encode_protein(b))
            assert got["matches"][i] == want.matches, (a, b)
            assert got["mismatches"][i] == want.mismatches, (a, b)
            assert got["gaps"][i] == want.gaps, (a, b)
            assert got["distance"][i] == want.distance, (a, b)
            assert got["similarity"][i] == want.similarity, (a, b)

    def test_oracle_vs_seqan(self, seqan_oracle):
        if seqan_oracle is None:
            pytest.skip("SeqAn oracle unavailable")
        pairs = _random_pairs(AA, 60, 1, 50, seed=21) + _random_pairs(
            AA, 60, 5, 70, seed=22, mutated=True
        )
        inp = "".join(f"prot\t{a}\t{b}\n" for a, b in pairs)
        out = subprocess.run(
            [seqan_oracle], input=inp, capture_output=True, text=True
        ).stdout.strip().splitlines()
        for (a, b), line in zip(pairs, out):
            f = line.split("\t")
            self_, mutual, ma, mi, ga = map(int, f[1:6])
            ea, eb = encode_protein(a), encode_protein(b)
            r = oracle.protein_align(ea, eb)
            assert oracle.protein_selfscore(ea) + oracle.protein_selfscore(eb) == self_
            assert (r.matches, r.mismatches, r.gaps) == (ma, mi, ga), (a, b, f[6])

    def test_dna_oracle_vs_seqan(self, seqan_oracle):
        if seqan_oracle is None:
            pytest.skip("SeqAn oracle unavailable")
        pairs = _random_pairs(DNA, 80, 1, 80, seed=31) + _random_pairs(
            DNA, 40, 5, 120, seed=32, mutated=True
        )
        inp = "".join(f"dna\t{a}\t{b}\n" for a, b in pairs)
        out = subprocess.run(
            [seqan_oracle], input=inp, capture_output=True, text=True
        ).stdout.strip().splitlines()
        for (a, b), line in zip(pairs, out):
            want = int(line.split("\t")[1])
            assert oracle.edit_distance(encode_dna(a), encode_dna(b)) == want
