#!/usr/bin/env python
"""Generate the round-2 SeqAn golden corpus (VERDICT item 7): ~4000 pairs
covering the edge cases the round-1 fixture missed — long DNA (to 4 kbp),
heavy length asymmetry (the segment-extension shape), revcomp-structured
pairs, N/X-saturated inputs, identical pairs (zero-distance / selfscore
normalization edges), fully-dissimilar proteins (negative mutual scores)
and gap-dominated protein alignments.

Usage:
    python tests/tools/gen_golden.py pairs.tsv
    ./tests/tools/seqan_oracle < pairs.tsv > raw.tsv
    python tests/tools/gen_golden.py --merge pairs.tsv raw.tsv \
        tests/fixtures/seqan_golden_r2.tsv
"""

import random
import sys

DNA = "ACGTN"
AA = "ACDEFGHIKLMNPQRSTVWYBZX"  # SeqAn AminoAcid incl. ambiguity codes
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def rnd_dna(rng, n, n_frac=0.0):
    return "".join(
        "N" if rng.random() < n_frac else rng.choice("ACGT") for _ in range(n)
    )


def mutate_dna(rng, s, rate):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))  # substitution
            out.append(c) if rng.random() < 0.5 else None
        elif r < rate:
            out.append(c)
            out.append(rng.choice("ACGT"))  # insertion
        else:
            out.append(c)
    return "".join(out) or "A"


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def rnd_prot(rng, n, x_frac=0.0):
    return "".join(
        "X" if rng.random() < x_frac else rng.choice(AA[:20]) for _ in range(n)
    )


def mutate_prot(rng, s, rate):
    return "".join(
        rng.choice(AA[:20]) if rng.random() < rate else c for c in s
    ) or "A"


def gen(out):
    rng = random.Random(20260819)
    w = out.write

    # --- DNA ---------------------------------------------------------
    for _ in range(600):  # general randomized, mixed lengths
        la, lb = rng.randint(1, 300), rng.randint(1, 300)
        w(f"dna\t{rnd_dna(rng, la, 0.1)}\t{rnd_dna(rng, lb, 0.1)}\n")
    for _ in range(300):  # related pairs at varying divergence
        s = rnd_dna(rng, rng.randint(50, 500))
        w(f"dna\t{s}\t{mutate_dna(rng, s, rng.choice([0.01, 0.05, 0.2, 0.5]))}\n")
    for _ in range(150):  # long patterns (chunked-kernel territory)
        s = rnd_dna(rng, rng.randint(1500, 4096))
        w(f"dna\t{s}\t{mutate_dna(rng, s, 0.03)}\n")
    for _ in range(200):  # heavy length asymmetry (segment extension)
        s = rnd_dna(rng, rng.randint(400, 1200))
        off = rng.randint(0, len(s) // 2)
        ln = rng.randint(20, len(s) - off)
        w(f"dna\t{s}\t{mutate_dna(rng, s[off:off + ln], 0.05)}\n")
    for _ in range(150):  # revcomp-structured
        s = rnd_dna(rng, rng.randint(60, 400))
        w(f"dna\t{s}\t{revcomp(mutate_dna(rng, s, 0.05))}\n")
    for _ in range(100):  # identical + N-saturated + tiny
        s = rnd_dna(rng, rng.randint(1, 200), rng.choice([0.0, 0.5, 1.0]))
        w(f"dna\t{s}\t{s}\n")
    for _ in range(100):
        w(f"dna\t{rnd_dna(rng, rng.randint(1, 8))}\t{rnd_dna(rng, rng.randint(1, 8))}\n")

    # --- protein -----------------------------------------------------
    for _ in range(700):  # general randomized
        la, lb = rng.randint(1, 150), rng.randint(1, 150)
        w(f"prot\t{rnd_prot(rng, la, 0.05)}\t{rnd_prot(rng, lb, 0.05)}\n")
    for _ in range(400):  # related at varying divergence
        s = rnd_prot(rng, rng.randint(20, 250))
        w(f"prot\t{s}\t{mutate_prot(rng, s, rng.choice([0.02, 0.1, 0.3, 0.7]))}\n")
    for _ in range(200):  # identical (selfscore normalization -> dist 0)
        s = rnd_prot(rng, rng.randint(1, 300), rng.choice([0.0, 0.3]))
        w(f"prot\t{s}\t{s}\n")
    for _ in range(200):  # gap-dominated: big length asymmetry
        s = rnd_prot(rng, rng.randint(80, 300))
        off = rng.randint(0, len(s) // 2)
        ln = rng.randint(5, max(6, len(s) // 3))
        w(f"prot\t{s}\t{mutate_prot(rng, s[off:off + ln], 0.1)}\n")
    for _ in range(150):  # long proteins (ORF scale)
        s = rnd_prot(rng, rng.randint(250, 400))
        w(f"prot\t{s}\t{mutate_prot(rng, s, 0.05)}\n")
    for _ in range(150):  # tiny / single-residue / ambiguity-heavy
        w(f"prot\t{rnd_prot(rng, rng.randint(1, 5))}\t{rnd_prot(rng, rng.randint(1, 5))}\n")
    for _ in range(100):
        s = rnd_prot(rng, rng.randint(10, 60), 0.6)
        w(f"prot\t{s}\t{mutate_prot(rng, s, 0.2)}\n")


def merge(pairs_path, raw_path, out_path):
    """Join the input pairs with the oracle's outputs into fixture rows
    (the committed format of tests/fixtures/seqan_golden.tsv)."""
    with open(pairs_path) as pf, open(raw_path) as rf, open(out_path, "w") as out:
        out.write(
            "# type\tseqA\tseqB\toracle: dna->dist | "
            "prot->self,mutual,match,mismatch,gap\n"
        )
        for pline, rline in zip(pf, rf):
            t, a, b = pline.rstrip("\n").split("\t")
            rcols = rline.rstrip("\n").split("\t")
            assert rcols[0] == t, (pline, rline)
            if t == "dna":
                out.write(f"dna\t{a}\t{b}\t{rcols[1]}\n")
            else:
                self_, mutual, ma, mi, ga = rcols[1:6]
                out.write(f"prot\t{a}\t{b}\t{self_},{mutual},{ma},{mi},{ga}\n")


if __name__ == "__main__":
    if sys.argv[1] == "--merge":
        merge(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        with open(sys.argv[1], "w") as fh:
            gen(fh)
