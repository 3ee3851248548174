#!/usr/bin/env python
"""Protein kernel micro-benchmark: XLA wavefront vs Pallas, GCUPS on device.

Shapes follow the protein pipeline's production profile: ORF segments are
typically 100-300 aa (orfm default min 96 bp = 32 aa; blastp hit segments
rarely exceed ~500 aa), so the canonical launch shape is B pairs of M=N=256.

Usage: python benchmarks/bench_protein.py [--backend xla|pallas|both] [--b 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_pairs(B, M, N, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 20, size=(B, M)).astype(np.int32)
    # make b a mutated copy of a so alignments are realistic (not random-vs-random)
    b = a[:, :N].copy()
    mut = rng.random((B, N)) < 0.3
    b[mut] = rng.integers(0, 20, size=mut.sum())
    a_len = np.full(B, M, np.int32)
    b_len = np.full(B, N, np.int32)
    return a, b, a_len, b_len


def bench(fn, a, b, al, bl, rounds=5):
    # warm (compile)
    t0 = time.time()
    r = fn(a, b, al, bl)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(rounds):
        r = fn(a, b, al, bl)
    dt = (time.time() - t0) / rounds
    cells = int(al.astype(np.int64) @ bl.astype(np.int64))
    return cells / dt / 1e9, compile_s, r


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="both")
    p.add_argument("--b", type=int, default=512)
    p.add_argument("--m", type=int, default=256)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--rounds", type=int, default=5)
    args = p.parse_args()

    import jax
    print("devices:", jax.devices(), flush=True)
    a, b, al, bl = make_pairs(args.b, args.m, args.n)

    results = {}
    if args.backend in ("xla", "both"):
        from taxtk.ops.protein_align import batched_protein_align
        g, c, r = bench(batched_protein_align, a, b, al, bl, args.rounds)
        results["xla"] = (g, c, r)
        print(f"xla wavefront: {g:.3f} GCUPS (compile {c:.1f}s)", flush=True)
    if args.backend in ("pallas", "both"):
        from taxtk.ops.pallas_protein import batched_protein_align_pallas
        g, c, r = bench(batched_protein_align_pallas, a, b, al, bl, args.rounds)
        results["pallas"] = (g, c, r)
        print(f"pallas wavefront: {g:.3f} GCUPS (compile {c:.1f}s)", flush=True)
    if len(results) == 2:
        rx, rp = results["xla"][2], results["pallas"][2]
        ok = all(np.array_equal(rx[k], rp[k]) for k in ("mutual", "matches", "gaps"))
        print("agreement:", ok, flush=True)


if __name__ == "__main__":
    main()
