#!/usr/bin/env python
"""Scaling-efficiency harness (the BASELINE.json "scaling eff" metric).

Two modes, both runnable without N-chip hardware and unchanged on real
multi-host TPU:

  --mode procs (default): REAL multi-process weak scaling.  Launches N OS
      processes that join a jax.distributed group (CPU backend), each
      running a FIXED per-process RPA alignment workload between global
      barriers (benchmarks/scaling_worker.py).  This is the reference's
      split-files cluster contract (README.md FAQ#9-10) as a measured
      harness: efficiency(N) = t(1) / max_p t(N).  Emits ONE JSON line:
      {"metric": "scaling_efficiency", "value": eff@maxN, ...}.

      On one machine the N processes CONTEND for the same cores, so the
      printed efficiency is a LOWER bound for real multi-host hardware
      (where each process owns its chips and the align stage has no
      cross-host traffic at all).

  --mode mesh: single-process dp scaling over a virtual device mesh
      (XLA_FLAGS=--xla_force_host_platform_device_count=8) — measures the
      engine's dp-sharded Myers round (taxtk/engine/aligner.py) at
      1..8 devices with fixed per-device workload.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_procs(n, per_proc, length, rounds, workdir, timeout=600):
    """Launch n jax.distributed worker processes; return per-process
    seconds-per-round (barrier-bracketed)."""
    os.makedirs(workdir, exist_ok=True)
    port = _free_port()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scaling_worker.py")
    ncores = os.cpu_count() or 1
    import shutil

    taskset = shutil.which("taskset")
    # one core per process: each "host" owns its compute, like real
    # multi-host hardware; beyond ncores processes time-share a core
    xla_flags = (os.environ.get("XLA_FLAGS", "")
                 + " --xla_cpu_multi_thread_eigen=false"
                   " intra_op_parallelism_threads=1")
    procs = []
    for pid in range(n):
        env = {
            **os.environ,
            "TAXTK_COORDINATOR": f"127.0.0.1:{port}",
            "TAXTK_NUM_PROCESSES": str(n),
            "TAXTK_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": xla_flags,
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
        }
        # CPU-only children: keep the axon sitecustomize from registering
        # the remote TPU backend (its device-claim handshake can block
        # behind another process's tunnel session)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        cmd = [sys.executable, worker, workdir, str(per_proc), str(length),
               str(rounds)]
        if taskset:
            cmd = ["taskset", "-c", str(pid % ncores)] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed: {err[-1500:]}")
    times = []
    for pid in range(n):
        with open(os.path.join(workdir, f"t.{pid}.json")) as fh:
            times.append(json.load(fh)["seconds"])
    return times


def main_procs(args):
    import tempfile

    results = {}
    with tempfile.TemporaryDirectory() as d:
        for n in args.procs:
            wd = os.path.join(d, f"n{n}")
            times = run_procs(n, args.per_proc, args.len, args.rounds, wd)
            results[n] = times
            t1 = min(results[1]) if 1 in results else min(times)
            eff = t1 / max(times)
            cells = args.per_proc * args.len * args.len * n
            print(
                f"procs={n}: per-proc {max(times)*1000:8.1f} ms/round (max) "
                f"{cells/max(times)/1e9:7.2f} GCUPS aggregate  "
                f"weak-scaling efficiency {eff:.2f}",
                file=sys.stderr, flush=True,
            )
    ncores = os.cpu_count() or 1
    t1 = min(results[1]) if 1 in results else min(results[min(results)])
    eff_all = {n: t1 / max(ts) for n, ts in results.items()}
    # the headline is the largest n whose processes each own a core — true
    # hardware weak scaling; oversubscribed n are reported raw alongside
    hw_ns = [n for n in results if n <= ncores]
    head_n = max(hw_ns) if hw_ns else max(results)
    eff = eff_all[head_n]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"t(1)/t({head_n}) weak-scaling, jax.distributed procs, "
                f"1 core each",
        "vs_baseline": round(eff / 0.8, 3),  # BASELINE.json target >= 0.8
        "efficiency_by_n": {str(n): round(e, 3) for n, e in eff_all.items()},
        "per_proc_seconds": {str(n): [round(t, 4) for t in ts]
                             for n, ts in results.items()},
        "cores": ncores,
        "note": "n > cores rows are time-shared (raw, uncorrected); the "
                "align stage has no cross-host traffic, so real multi-host "
                "matches the n <= cores regime",
    }))


def main_mesh(args):
    import jax

    if not args.real_devices:
        jax.config.update("jax_platforms", "cpu")

    from taxtk.engine.aligner import BatchAligner
    from taxtk.parallel.mesh import make_mesh

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", file=sys.stderr)
    rng = np.random.RandomState(0)
    L = args.len

    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = make_mesh(n_devices=n, tp=1)
        B = args.per_proc * n
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
            file=sys.stderr, flush=True,
        )
    max_n = max(results)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(results[1] / results[max_n], 3),
        "unit": f"t(1)/t({max_n}) weak-scaling, virtual {max_n}-device mesh",
        "vs_baseline": round(results[1] / results[max_n] / 0.8, 3),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("procs", "mesh"), default="procs")
    p.add_argument("--procs", type=int, nargs="+", default=[1, 2, 4],
                   help="process counts for --mode procs")
    p.add_argument("--per-proc", type=int, default=512,
                   help="pairs per process/device")
    p.add_argument("--len", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--real-devices", action="store_true",
                   help="mesh mode: use whatever jax.devices() gives")
    args = p.parse_args()
    if args.mode == "procs":
        main_procs(args)
    else:
        main_mesh(args)


if __name__ == "__main__":
    main()
