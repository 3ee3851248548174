#!/usr/bin/env python
"""Device-only protein kernel timing (excludes D2H readback latency).

Separates three costs: bare D2H roundtrip latency, device kernel time
(block_until_ready, no transfer), and the full host-call path.
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
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--backend", default="pallas")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    # bare roundtrip latency
    x = jnp.zeros(8)
    np.asarray(x)
    t0 = time.time()
    for _ in range(5):
        np.asarray(x + 1)
    print(f"bare D2H roundtrip: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

    a, b, al, bl = make_pairs(args.b, args.m, args.n)
    cells = int(al.astype(np.int64) @ bl.astype(np.int64))

    if args.backend == "pallas":
        from taxtk.ops import pallas_protein as pp

        B, M = a.shape
        N = b.shape[1]
        SUB = int(os.environ.get("TAXTK_PROTEIN_SUB", "256"))
        Mp1 = pp._round_up(M + 1, pp.LANE)
        Npad = pp._round_up(max(N, 1), pp.LANE)
        steps = Mp1 + Npad
        fwd_w = pp._round_up(steps, 128)
        n_tiles = max(1, -(-B // SUB))
        Bp = n_tiles * SUB
        acode = np.full((Bp, Mp1), 255, np.uint8)
        acode[:B, 1 : M + 1] = a
        fwd = np.full((Bp, fwd_w), 255, np.uint8)
        fwd[:B, :N] = b
        ablen = np.ones(Bp, np.int32)
        ablen[:B] = al + bl
        alen_p = np.zeros(Bp, np.int32)
        alen_p[:B] = al

        dev = [jnp.asarray(v) for v in (acode, fwd, ablen, alen_p)]
        jax.block_until_ready(dev)

        run = lambda: pp._call(*dev, SUB, Mp1, steps, fwd_w, n_tiles)
        out = jax.block_until_ready(run())  # compile
        t0 = time.time()
        for _ in range(args.rounds):
            out = jax.block_until_ready(run())
        dt = (time.time() - t0) / args.rounds
        print(f"pallas device-only: {dt*1000:.1f} ms = {cells/dt/1e9:.2f} GCUPS", flush=True)
    else:
        from taxtk.ops import protein_align as pa

        M = a.shape[1]
        N = b.shape[1]
        a_ext = np.full((args.b, M + 1), 255, np.int32)
        a_ext[:, 1:] = a
        rbp = np.full((args.b, 2 * (M + 1) + N), 255, np.int32)
        for i in range(args.b):
            rbp[i, M + 1 + (N - bl[i]) : M + 1 + N] = b[i, : bl[i]][::-1]
        dev = [jnp.asarray(v) for v in (a_ext, rbp, al, bl)]
        jax.block_until_ready(dev)
        run = lambda: pa._protein_kernel(*dev)
        out = jax.block_until_ready(run())
        t0 = time.time()
        for _ in range(args.rounds):
            out = jax.block_until_ready(run())
        dt = (time.time() - t0) / args.rounds
        print(f"xla device-only: {dt*1000:.1f} ms = {cells/dt/1e9:.2f} GCUPS", flush=True)


if __name__ == "__main__":
    main()
