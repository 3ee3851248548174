"""Per-process worker for the multi-process scaling harness
(benchmarks/bench_scaling.py --mode procs).

Joins the jax.distributed group (CPU backend here; identical code on real
multi-host TPU), runs a FIXED per-process RPA alignment workload (weak
scaling — the reference's split-files contract, README.md FAQ#9-10, is
data-parallel with no cross-host traffic in the align stage), and writes
its timing to <workdir>/t.<pid>.json.

Barriers bracket the timed region so every process measures the same
interval; efficiency is computed by the launcher as t(1) / max_p t(N).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1]
    per_proc = int(sys.argv[2])
    length = int(sys.argv[3])
    rounds = int(sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from taxtk.parallel.distributed import initialize

    pid = initialize()
    n = jax.process_count()

    from jax.experimental import multihost_utils

    from taxtk.engine.aligner import BatchAligner

    rng = np.random.RandomState(1234 + pid)
    a = rng.randint(0, 4, (per_proc, length)).astype(np.uint8)
    b = rng.randint(0, 4, (per_proc, length)).astype(np.uint8)
    pairs = [(a[i], b[i]) for i in range(per_proc)]

    al = BatchAligner(mode="dna", dna_backend="myers")
    al.align_pairs(pairs)  # warm/compile outside the timed region

    multihost_utils.sync_global_devices("taxtk-scaling-start")
    t0 = time.perf_counter()
    for _ in range(rounds):
        al.align_pairs(pairs)
    t_local = time.perf_counter() - t0
    multihost_utils.sync_global_devices("taxtk-scaling-stop")

    with open(os.path.join(workdir, f"t.{pid}.json"), "w") as fh:
        json.dump(
            {
                "pid": pid,
                "n": n,
                "seconds": t_local / rounds,
                "pairs": per_proc,
                "length": length,
            },
            fh,
        )


if __name__ == "__main__":
    main()
