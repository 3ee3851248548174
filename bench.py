#!/usr/bin/env python
"""Driver benchmark: RPA DNA alignment throughput on the accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the hot-path kernel of the whole framework — exact batched global
edit distance (the RPA realignment kernel, bit-parallel Myers) — in giga
DP-cell updates per second (GCUPS) on one chip at a production-shaped
workload (32k pairs x 512bp).  Inputs are staged on device once and R
kernel rounds are timed with a single device->host readback (this host's
tunnel has ~170 ms fixed D2H latency; the engine amortizes readbacks the
same way via macro-batching).

vs_baseline divides by the reference implementation's algorithm on the host
CPU: our native single-thread Myers bit-vector (taxtk/native/myers.cpp),
the same published algorithm SeqAn's MyersBitVector implements
(reference: taxonpredictionmodelsequence.hh:133-171).  The reference
publishes no absolute numbers (BASELINE.md), so the self-measured
single-core CPU baseline is the comparison point.
"""

import json
import time

import numpy as np

B, L, ROUNDS = 8192, 512, 32  # one canonical 8-tile kernel group per round;
# enough rounds that total device time swamps the remote service's ~0.77s
# synchronization quantum (see docs/DESIGN.md section 7)


def _run_with_watchdog(timeout_s=1500):
    """Run the device measurement in a subprocess so a hung remote TPU
    compile cannot stall the driver; fall back to the CPU backend."""
    import os
    import subprocess
    import sys

    if os.environ.get("TAXTK_BENCH_INNER") == "1":
        return None  # we ARE the inner process
    cmd = [sys.executable, os.path.abspath(__file__)]
    env = {**os.environ, "TAXTK_BENCH_INNER": "1"}
    try:
        r = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=timeout_s
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return True
    except subprocess.TimeoutExpired:
        pass
    # fallback: CPU backend (the axon sitecustomize ignores JAX_PLATFORMS,
    # so the inner process force-switches on this variable)
    env["TAXTK_FORCE_CPU"] = "1"
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=timeout_s)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            print(line)
            return True
    raise RuntimeError(f"bench failed: {r.stderr[-500:]}")


def main():
    import os

    import jax

    if os.environ.get("TAXTK_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform

    rng = np.random.RandomState(0)
    a = rng.randint(0, 4, (B, L)).astype(np.uint8)
    b = rng.randint(0, 4, (B, L)).astype(np.uint8)
    al = np.full(B, L, np.int32)
    bl = np.full(B, L, np.int32)
    cells = float(B) * L * L

    from taxtk.ops.myers_batch import _precompute, _myers_kernel

    peq, text, hmask, m_len, n_len, K = _precompute(a, b, al, bl)

    if platform == "cpu":
        run = lambda *args: _myers_kernel(*args)
        d_args = [jnp.asarray(x) for x in (peq, text, hmask, m_len, n_len)]
    else:
        from taxtk.ops import pallas_myers as pm

        SUB = 8
        TILE = SUB * pm.LANE
        n_tiles = -(-B // TILE)
        Bp = n_tiles * TILE
        Tc = 512
        n_chunks = -(-text.shape[0] // Tc)

        def tile_pairs(arr, fill, dtype):
            out = np.full(arr.shape[:-1] + (Bp,), fill, dtype)
            out[..., :B] = arr
            return out.reshape(arr.shape[:-1] + (n_tiles * SUB, pm.LANE))

        peq_t = tile_pairs(peq, 0, np.uint32)
        mlen_t = tile_pairs(m_len[None, :], 1, np.int32)[0]
        nlen_t = tile_pairs(n_len[None, :], 1, np.int32)[0]
        Np = n_chunks * Tc
        text_t = pm._pack_text(text, text.shape[0], B, Np, Bp, n_tiles, SUB)
        d_args = [jnp.asarray(x) for x in (peq_t, text_t, nlen_t, mlen_t)]
        run = lambda *args: pm._call(*args, K, Tc, n_chunks, n_tiles, SUB)

    # warm (compile) then timed rounds.  block_until_ready does not reliably
    # separate dispatch from execution on the remote axon backend, so the
    # timed section is closed by ONE tiny forced readback (a device-side
    # reduction over every round's output) — the only sync that counts.
    out = run(*d_args)
    _ = float(jnp.asarray(out).sum())
    t0 = time.time()
    outs = [run(*d_args) for _ in range(ROUNDS)]
    _chk = float(jnp.stack([jnp.asarray(o).sum() for o in outs]).sum())
    dt = time.time() - t0
    device_gcups = ROUNDS * cells / dt / 1e9
    device_result = np.asarray(outs[-1]).reshape(-1)[:B]
    device_result = np.where(m_len == 0, n_len, device_result)

    # CPU baseline: single-thread native Myers on a subsample
    from taxtk.native import myers_batch, load

    vs_baseline = 0.0
    if load() is not None:
        n = 2048
        pairs = [(a[i, : al[i]], b[i, : bl[i]]) for i in range(n)]
        sub_cells = float(sum(int(al[i]) * int(bl[i]) for i in range(n)))
        t0 = time.time()
        cpu_out = myers_batch(pairs, n_threads=1)  # single-core baseline
        cpu_gcups = sub_cells / (time.time() - t0) / 1e9
        vs_baseline = device_gcups / cpu_gcups
        assert (device_result[:n] == cpu_out).all(), "kernel vs native mismatch"

    print(
        json.dumps(
            {
                "metric": f"rpa_dna_alignment_throughput_{platform}",
                "value": round(device_gcups, 2),
                "unit": "GCUPS/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    import os

    if os.environ.get("TAXTK_BENCH_INNER") == "1":
        main()
    else:
        _run_with_watchdog()
