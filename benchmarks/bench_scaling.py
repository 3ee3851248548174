#!/usr/bin/env python
"""Data-parallel scaling efficiency on a virtual device mesh.

Measures the dp-sharded Myers alignment round (the engine's multi-chip
path, taxtk/engine/aligner.py::_myers_sharded) at 1..N devices with a
FIXED per-device workload (weak scaling): efficiency = t(1) / t(N) — the
pair batch is B_per_dev * N, so perfect dp scaling holds time constant.

Run on the CPU backend with a virtual mesh (no N-chip hardware here):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python benchmarks/bench_scaling.py

The same code path runs unchanged on a real N-chip mesh — shardings are
NamedSharding over a jax.sharding.Mesh, and the kernel has no cross-device
communication (the merge happens in the consensus stage).  On CPU the
"devices" share physical cores, so the printed efficiency is a LOWER
bound: real chips do not contend for compute.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-dev", type=int, default=512, help="pairs per device")
    p.add_argument("--len", type=int, default=512)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--real-devices", action="store_true",
                   help="use whatever jax.devices() gives (default: force "
                   "the CPU backend for a virtual 8-device mesh — the axon "
                   "sitecustomize overrides JAX_PLATFORMS)")
    args = p.parse_args()

    import jax

    if not args.real_devices:
        jax.config.update("jax_platforms", "cpu")

    from taxtk.engine.aligner import BatchAligner
    from taxtk.parallel.mesh import make_mesh

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", flush=True)
    rng = np.random.RandomState(0)
    L = args.len

    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = make_mesh(n_devices=n, tp=1)
        B = args.per_dev * n
        a = rng.randint(0, 4, (B, L)).astype(np.uint8)
        b = rng.randint(0, 4, (B, L)).astype(np.uint8)
        pairs = [(a[i], b[i]) for i in range(B)]
        al = BatchAligner(mode="dna", dna_backend="myers", mesh=mesh)
        al.align_pairs(pairs)  # warm/compile
        t0 = time.time()
        for _ in range(args.rounds):
            al.align_pairs(pairs)
        dt = (time.time() - t0) / args.rounds
        results[n] = dt
        eff = results[1] / dt if 1 in results else 1.0
        gcups = B * L * L / dt / 1e9
        print(
            f"dp={n}: {dt*1000:8.1f} ms/round  {gcups:7.2f} GCUPS total  "
            f"weak-scaling efficiency {eff:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
