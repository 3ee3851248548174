#!/usr/bin/env python
"""Probe candidate bench.py shapes on the real chip: delivered GCUPS as a
function of per-launch cells (pattern length x pairs) and round count.
Used to choose the round-2 headline shape (VERDICT item 2)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from taxtk.ops import pallas_myers as pm
from taxtk.ops.myers_batch import _precompute


def stage(B, L, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 4, (B, L)).astype(np.uint8)
    b = rng.randint(0, 4, (B, L)).astype(np.uint8)
    al = np.full(B, L, np.int32)
    bl = np.full(B, L, np.int32)
    peq, text, hmask, m_len, n_len, K = _precompute(a, b, al, bl)
    K = pm._quantize_K(K)
    SUB = 8
    TILE = SUB * pm.LANE
    n_tiles = -(-B // TILE)
    Bp = n_tiles * TILE
    Tc = 512
    n_chunks = -(-text.shape[0] // Tc)
    n_chunks = pm._pow2(n_chunks)

    def tile_pairs(arr, fill, dtype):
        out = np.full(arr.shape[:-1] + (Bp,), fill, dtype)
        out[..., :B] = arr
        return out.reshape(arr.shape[:-1] + (n_tiles * SUB, pm.LANE))

    if K > peq.shape[0]:
        peq = np.concatenate(
            [peq, np.zeros((K - peq.shape[0],) + peq.shape[1:], np.uint32)]
        )
    peq_t = tile_pairs(peq, 0, np.uint32)
    mlen_t = tile_pairs(m_len[None, :], 1, np.int32)[0]
    nlen_t = tile_pairs(n_len[None, :], 1, np.int32)[0]
    Np = n_chunks * Tc
    text_t = pm._pack_text(text, text.shape[0], B, Np, Bp, n_tiles, SUB)
    d_args = [jnp.asarray(x) for x in (peq_t, text_t, nlen_t, mlen_t)]
    run = lambda: pm._call(*d_args, K, Tc, n_chunks, n_tiles, SUB)
    return run, float(B) * L * L, K, n_tiles, n_chunks


def measure(run, cells, rounds, label):
    out = run()
    _ = float(jnp.asarray(out).sum())  # warm
    for rep in range(3):
        t0 = time.time()
        outs = [run() for _ in range(rounds)]
        _ = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = time.time() - t0
        print(
            f"{label} rounds={rounds} rep{rep}: {dt:7.3f}s"
            f" = {rounds * cells / dt / 1e9:8.1f} GCUPS",
            flush=True,
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "512"):
        run, cells, K, nt, nc = stage(8192, 512)
        print(f"shape 8192x512 K={K} tiles={nt} chunks={nc}", flush=True)
        measure(run, cells, 32, "8192x512 ")
        measure(run, cells, 128, "8192x512 ")
    if which in ("all", "2048"):
        run, cells, K, nt, nc = stage(8192, 2048)
        print(f"shape 8192x2048 K={K} tiles={nt} chunks={nc}", flush=True)
        measure(run, cells, 4, "8192x2048")
        measure(run, cells, 16, "8192x2048")


if __name__ == "__main__":
    main()
