#!/usr/bin/env python
"""Honest protein-kernel timing: chain L data-dependent launches, sync
ONCE via np.asarray (block_until_ready does not synchronize on the axon
backend — see docs/DESIGN.md §7).  Reports per-launch kernel time and
GCUPS over the useful (al x bl) cells.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_protein import make_pairs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=512)
    p.add_argument("--m", type=int, default=256)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--chain", type=int, default=20)
    p.add_argument("--sub", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from taxtk.ops import pallas_protein as pp

    print("devices:", jax.devices(), flush=True)

    a, b, al, bl = make_pairs(args.b, args.m, args.n)
    cells = int(al.astype(np.int64) @ bl.astype(np.int64))

    B, M = a.shape
    N = b.shape[1]
    SUB = args.sub
    Mp, steps_end, fwd_w, n_tiles = pp._shapes(B, M, N, SUB)
    Bp = n_tiles * SUB
    acode = np.full((Bp, Mp), 255, np.uint8)
    acode[:B, 0:M] = a
    fwd = np.full((Bp, fwd_w), 255, np.uint8)
    fwd[:B, :N] = b
    ablen = np.ones(Bp, np.int32)
    ablen[:B] = al + bl
    alen_p = np.zeros(Bp, np.int32)
    alen_p[:B] = al

    dev = [jnp.asarray(v) for v in (acode, fwd, ablen, alen_p)]

    def chain(L, bump):
        # data-dependent chain: fold a byte of the previous result into the
        # target-length input so launches cannot overlap or CSE
        ab = dev[2]
        out = None
        for _ in range(L):
            out = pp._call(dev[0], dev[1], ab, dev[3], SUB, Mp, steps_end,
                           fwd_w, n_tiles)
            ab = dev[2] + (out[0, :1].astype(jnp.int32) & 0) + bump
            bump = bump * 0  # only perturb the first link
        return out

    # warm compile + one honest sync
    np.asarray(chain(2, jnp.ones((), jnp.int32))[0, 0])
    for L in (1, args.chain):
        t0 = time.time()
        np.asarray(chain(L, jnp.zeros((), jnp.int32))[0, 0])
        dt = time.time() - t0
        print(f"chain={L:3d}: total {dt*1000:8.1f} ms", flush=True)
        if L > 1:
            t1 = dt
    t0 = time.time()
    np.asarray(chain(1, jnp.zeros((), jnp.int32))[0, 0])
    base = time.time() - t0
    per = (t1 - base) / (args.chain - 1)
    print(
        f"per-launch: {per*1000:.2f} ms = {cells/per/1e9:.2f} GCUPS "
        f"(B={B} M={M} N={N} SUB={SUB} tiles={n_tiles} steps={steps_end})",
        flush=True,
    )


if __name__ == "__main__":
    main()
