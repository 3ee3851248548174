"""REAL multi-process distributed run: N OS processes (2, 4, and 8) join
a jax.distributed group (CPU backend), classify disjoint host shards of
the same workload, and the merged GFF3 equals a single-process run —
the reference's split-files workflow for arbitrary N (README.md
FAQ#9-10) as a tested contract.  Correctness only: the 2-core host
time-shares the processes, so wall-clock here says nothing (the scaling
harness benchmarks/bench_scaling.py owns the efficiency numbers)."""

import io
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize(
    "nprocs,n_queries", [(2, 8), (4, 8), (8, 24)]
)
def test_multi_process_jax_distributed_matches_single(
    tmp_path, nprocs, n_queries
):
    workdir = str(tmp_path)
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "tools", "dist_worker.py")
    procs = []
    for pid in range(nprocs):
        env = {
            **os.environ,
            "TAXTK_COORDINATOR": f"127.0.0.1:{port}",
            "TAXTK_NUM_PROCESSES": str(nprocs),
            "TAXTK_PROCESS_ID": str(pid),
            "TAXTK_TEST_NQ": str(n_queries),
            "JAX_PLATFORMS": "cpu",
        }
        # CPU-only children: keep the axon sitecustomize from registering
        # the remote TPU backend (its device-claim handshake can block
        # behind another process's tunnel session)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        d = os.path.join(workdir, f"w{pid}")
        os.makedirs(d)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, d],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240 + 60 * nprocs)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]

    # single-process reference on the same deterministic workload
    from test_refpack_shard import _mini_refpack, _run
    from taxtk.refpack.store import IndexedFastaStore, InMemoryFastaStore

    ref_dir = tmp_path / "single"
    os.makedirs(ref_dir)
    tax, fa, mp, qf, rows, mapping = _mini_refpack(
        ref_dir, n_queries=n_queries)
    expected = _run(tax, InMemoryFastaStore(qf), IndexedFastaStore(fa),
                    rows, mapping)

    from taxtk.parallel.distributed import merge_gff3_parts

    merged = os.path.join(workdir, "merged.gff3")
    merge_gff3_parts(
        [os.path.join(workdir, f"w{p}", f"part.{p}.gff3")
         for p in range(nprocs)],
        merged,
    )
    got = open(merged).read()

    # merge_gff3_parts output is sorted like the pipeline's `sort -k1,1`;
    # normalize the single-run output the same way for comparison
    def norm(text):
        lines = [l for l in text.splitlines() if l and not l.startswith("#")]
        return sorted(lines)

    assert norm(got) == norm(expected)
    assert len(norm(got)) > 0
