#!/usr/bin/env python
"""Driver benchmark: RPA DNA alignment throughput on the accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures the hot-path kernel of the whole framework — exact batched global
edit distance (the RPA realignment kernel, bit-parallel Myers) — in giga
DP-cell updates per second (GCUPS) on one chip at a production-shaped
workload: 8192 pairs x 2048 bp (K=64 pattern words, the register fast
path; the engine's long-segment bucket shape for config-4 contigs).

Protocol (round-2, controlled + regressable):
  * S=4 DISTINCT device-resident input sets cycled across rounds — repeat
    launches of identical inputs measure the remote service's caching, not
    the chip (benchmarks/probe_memoization.py)
  * thorough warmup (absorbs the remote service's scheduling quanta +
    compile), then NREP timed repetitions of R rounds each, every rep
    closed by ONE forced scalar readback (block_until_ready does not
    reliably synchronize on this backend — docs/DESIGN.md section 7)
  * value = MEDIAN over reps; iqr_pct reported for run-to-run spread

Roofline: see the ROOFLINE_GCUPS note below — round 3 falsified the
source-op-count model (the unrolled kernel delivered 117% of it), so the
bound now charges only the ~20 essential core-recurrence ops per 32-cell
word at the analytic VPU peak (~6.2e3 GCUPS); roofline_pct = value /
ROOFLINE_GCUPS.

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

B, L = 8192, 2048  # canonical 8-tile group, K=64 register fast path
SETS = 4  # distinct device-resident input sets, cycled
ROUNDS = 16  # launches per timed rep (~2.7e11 cells)
NREP = 5  # timed reps; report median + IQR
# Speed-of-light model, round-3 revision: the 2-char-unrolled kernel
# DELIVERED 117% of the old source-op-count roofline (3700 at ~33
# ops/word-step), falsifying that model — Mosaic fuses below the source
# op count (a dependency-free probe of the same op mix also sustains
# less than the kernel implies: benchmarks/probe_vpu_peak.py, 3.0e12
# op/s).  The bound now counts only the ~20 ESSENTIAL core-recurrence
# ops per 32-cell word (eq/xv/add(2)/xh(2)/ph(2)/mh/4 shifts+2 ors for
# state+carries/new_pv(3)/new_mv) at the analytic VPU peak (8x128 lanes
# x 4 ALUs x 0.94 GHz = 3.85e12 op/s), with peq select, harvest, loads
# and loop overhead assumed FREE: 3.85e12 / (20/32) = ~6.2e3 GCUPS.  No
# implementation of this algorithm beats it without shrinking the core
# recurrence itself.
#
# Round-5 ATTRIBUTION of the ~31% gap (benchmarks/probe_kernel_ablate.py
# — the real kernel timed with op groups removed; synthetic-probe SOLs
# were twice shown unreliable): the kernel runs at 88.9% of its own
# ESSENTIAL-ONLY variant (harvest ops cost 5.4%, peq selects 6.0%), and
# the essential-only variant itself reaches only ~67% of this analytic
# bound — i.e. about a third of the model's assumed issue rate is not
# sustainable on the serial-carry core even with every non-essential op
# removed.  The gap is therefore ~11% real auxiliary ops + ~22% model
# optimism about the carry-bound core, not an unexplained kernel
# deficiency.  ROOFLINE_GCUPS stays as the (deliberately unreachable)
# model bound for cross-round comparability.
ROOFLINE_GCUPS = 6160.0


def _run_with_watchdog(timeout_s=2400):
    """Run the device measurements in subprocesses so a hung remote TPU
    compile cannot stall the driver; fall back to the CPU backend.  The
    kernel bench and the e2e engine bench run in SEPARATE processes —
    measured same-session, the e2e read 2.3 Gbp/h inside the kernel
    bench's process vs 4.9-6.4 standalone (device queue/alloc state from
    16x8192x2048 kernel rounds contaminates the engine timing)."""
    import json as _json
    import os
    import subprocess
    import sys

    if os.environ.get("TAXTK_BENCH_INNER") == "1":
        return None  # we ARE the inner process

    last_stderr = [""]

    def _inner(mode, env_extra, t):
        cmd = [sys.executable, os.path.abspath(__file__)]
        env = {**os.environ, "TAXTK_BENCH_INNER": "1",
               "TAXTK_BENCH_MODE": mode, **env_extra}
        try:
            r = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=t
            )
        except subprocess.TimeoutExpired:
            last_stderr[0] = f"timeout after {t}s"
            return None
        last_stderr[0] = r.stderr[-500:] if r.stderr else f"rc={r.returncode}"
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                return _json.loads(line)
        return None

    result = _inner("kernel", {}, timeout_s)
    forced_cpu = {}
    if result is None:
        # fallback: CPU backend (the axon sitecustomize ignores
        # JAX_PLATFORMS, so the inner process switches on this variable)
        forced_cpu = {"TAXTK_FORCE_CPU": "1"}
        result = _inner("kernel", forced_cpu, timeout_s)
    if result is None:
        raise RuntimeError(
            f"bench failed: no kernel metric; stderr tail: {last_stderr[0]}"
        )
    # if the chip was unreachable for the kernel bench, don't burn up to
    # 2x2400s waiting for the e2e runs to hit the same hang — run them on
    # the same CPU fallback so the driver still gets every field
    e2e = _inner("e2e", forced_cpu, timeout_s)
    if e2e is None:
        e2e = {"e2e_error": f"no metric; stderr tail: {last_stderr[0]}"[:300]}
    result.update(e2e)
    prot = _inner("e2e-protein", forced_cpu, timeout_s)
    if prot is None:
        prot = {
            "protein_e2e_error":
            f"no metric; stderr tail: {last_stderr[0]}"[:300]
        }
    result.update(prot)
    _add_local_projection(result)
    print(_json.dumps(result))
    return True


def _add_local_projection(result):
    """Non-tunneled deployment projection (round-3 VERDICT weak #3): the
    e2e medians here ride a shared tunnel whose per-launch RTT and H2D
    seconds dominate device_wait.  A locally-attached chip would pay
    host_s (unchanged) + the pure kernel time for the run's DP cells at
    the same-session measured kernel rate + H2D at PCIe-class bandwidth
    (~10 GB/s, negligible at these byte counts).  This is a MODEL, not a
    measurement — fields are suffixed _projected and carry the formula."""
    kern = result.get("value")  # kernel GCUPS, same session
    if not kern or result.get("metric", "").endswith("cpu"):
        return
    for prefix in ("e2e", "e2e_config4"):
        cells = result.get(f"{prefix}_cells")
        qbp = result.get(f"{prefix}_qbp")
        host_s = result.get(f"{prefix}_host_s")
        if not cells or not qbp or host_s is None:
            continue
        h2d_mb = result.get(f"{prefix}_h2d_mb", 0.0)
        proj_s = host_s + cells / (kern * 1e9) + h2d_mb / 10_000.0
        result[f"{prefix}_projected_local_mbp_per_hour"] = round(
            qbp / 1e6 / (proj_s / 3600.0), 1)
    result["projection_model"] = (
        "host_s + cells/kernel_gcups + h2d_mb/10GBps — local-chip model, "
        "removes tunnel RTT/bandwidth from device_wait"
    )


def _stage_tpu(seed):
    """One device-resident input set at the canonical shape; returns
    (device_args, statics, raw host pair arrays)."""
    import jax.numpy as jnp

    from taxtk.ops import pallas_myers as pm
    from taxtk.ops.myers_batch import _precompute

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
    n_chunks = pm._pow2(-(-text.shape[0] // Tc))

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
    return d_args, (K, Tc, n_chunks, n_tiles, SUB), (a, b, al, bl)


def main():
    import os

    import jax

    if os.environ.get("TAXTK_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    cells = float(B) * L * L

    if platform == "cpu":
        from taxtk.ops.myers_batch import _precompute, _myers_kernel

        rng = np.random.RandomState(0)
        # CPU backend: small shape (this path only runs when the chip is
        # unreachable; it exists so the driver always gets a number)
        Bc, Lc = 512, 512
        a = rng.randint(0, 4, (Bc, Lc)).astype(np.uint8)
        b = rng.randint(0, 4, (Bc, Lc)).astype(np.uint8)
        al = np.full(Bc, Lc, np.int32)
        bl = np.full(Bc, Lc, np.int32)
        cells = float(Bc) * Lc * Lc
        peq, text, hmask, m_len, n_len, K = _precompute(a, b, al, bl)
        d_args = [jnp.asarray(x) for x in (peq, text, hmask, m_len, n_len)]
        sets = [d_args]
        run = lambda args: _myers_kernel(*args)
        raw = (a, b, al, bl)
        rounds, nrep = 4, 3
    else:
        from taxtk.ops import pallas_myers as pm

        staged = [_stage_tpu(seed) for seed in range(SETS)]
        statics = staged[0][1]
        sets = [s[0] for s in staged]
        raw = staged[0][2]
        run = lambda args: pm._call(*args, *statics)
        rounds, nrep = ROUNDS, NREP

    # warmup: compile + absorb the remote service's scheduling quanta
    for i in range(4):
        _ = float(jnp.asarray(run(sets[i % len(sets)])).sum())

    gcups = []
    for _rep in range(nrep):
        t0 = time.time()
        outs = [run(sets[i % len(sets)]) for i in range(rounds)]
        _chk = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = time.time() - t0
        gcups.append(rounds * cells / dt / 1e9)
    gcups.sort()
    value = gcups[len(gcups) // 2]
    q1 = gcups[len(gcups) // 4]
    q3 = gcups[(3 * len(gcups)) // 4]
    iqr_pct = 100.0 * (q3 - q1) / value if value else 0.0

    device_result = np.asarray(run(sets[0])).reshape(-1)[:B]

    # CPU baseline: single-thread native Myers on a subsample + correctness
    from taxtk.native import myers_batch, load

    a, b, al, bl = raw
    vs_baseline = 0.0
    if load() is not None:
        n = min(256, len(al))
        pairs = [(a[i, : al[i]], b[i, : bl[i]]) for i in range(n)]
        sub_cells = float(sum(int(al[i]) * int(bl[i]) for i in range(n)))
        t0 = time.time()
        cpu_out = myers_batch(pairs, n_threads=1)  # single-core baseline
        cpu_gcups = sub_cells / (time.time() - t0) / 1e9
        vs_baseline = value / cpu_gcups
        assert (device_result[:n] == cpu_out).all(), "kernel vs native mismatch"

    result = {
        "metric": f"rpa_dna_alignment_throughput_{platform}",
        "value": round(value, 1),
        "unit": "GCUPS/chip",
        "vs_baseline": round(vs_baseline, 1),
        "protocol": f"median of {nrep} reps x {rounds} rounds, "
                    f"{len(sets)} distinct input sets, one-sync",
        "shape": f"{B}x{L}" if platform != "cpu" else "512x512",
        "iqr_pct": round(iqr_pct, 1),
        "roofline_pct": round(100.0 * value / ROOFLINE_GCUPS, 1)
        if platform != "cpu"
        else None,
    }
    print(json.dumps(result))


class _H2DMeter:
    """Counts host->device ship bytes/seconds by wrapping jnp.asarray +
    jax.device_put for the duration of a run (the mechanism
    benchmarks/probe_e2e_device_breakdown.py validated).  Separating the
    code-determined term (bytes) from the link-determined term (seconds)
    makes tunnel-vs-code regression attribution mechanical: bytes moved
    -> code changed; same bytes, more seconds -> the link."""

    def __init__(self):
        self.bytes = 0
        self.seconds = 0.0

    def __enter__(self):
        import time as _t

        import jax
        import jax.numpy as jnp

        self._jnp, self._jax = jnp, jax
        self._orig_asarray = jnp.asarray
        self._orig_put = jax.device_put

        def _wrap(fn):
            def inner(x, *a, **kw):
                t0 = _t.time()
                out = fn(x, *a, **kw)
                # count only genuine host->device ships: an input that is
                # already a committed jax.Array moves no link bytes (and
                # asarray may delegate to device_put, which would double
                # count) — round-4 advisor finding
                if hasattr(x, "nbytes") and not isinstance(x, jax.Array):
                    self.bytes += x.nbytes
                self.seconds += _t.time() - t0
                return out

            return inner

        jnp.asarray = _wrap(self._orig_asarray)
        jax.device_put = _wrap(self._orig_put)
        return self

    def __exit__(self, *exc):
        self._jnp.asarray = self._orig_asarray
        self._jax.device_put = self._orig_put
        return False

    def take(self):
        b, s = self.bytes, self.seconds
        self.bytes, self.seconds = 0, 0.0
        return b, s


def _e2e_runs(runner, reps):
    """One warm-up + `reps` timed engine runs with per-run H2D metering;
    returns the timed run dicts, each annotated with h2d_mb/h2d_s."""
    runs = []
    with _H2DMeter() as meter:
        for rep in range(reps + 1):  # first run = warm-up/compile
            meter.take()
            r = runner()
            b, s = meter.take()
            if rep > 0:
                r["h2d_mb"] = b / 1e6
                r["h2d_s"] = s
                runs.append(r)
    return runs


def _breakdown_fields(med_run, prefix):
    """The median run's device/host/H2D stage breakdown (tunnel-vs-code
    attribution, see _H2DMeter)."""
    al = med_run.get("aligner", {})
    mt = med_run.get("metrics", {})
    host_s = (al.get("stage_batch", 0.0) + al.get("host_long", 0.0)
              + al.get("collect", 0.0) + mt.get("replay", 0.0)
              + mt.get("fetch", 0.0))
    return {
        f"{prefix}_engine_s": round(med_run["engine_s"], 2),
        f"{prefix}_device_s": round(al.get("device", 0.0), 2),
        f"{prefix}_device_wait_s": round(al.get("device_wait", 0.0), 2),
        f"{prefix}_host_s": round(host_s, 2),
        f"{prefix}_h2d_mb": round(med_run.get("h2d_mb", 0.0), 1),
        f"{prefix}_h2d_s": round(med_run.get("h2d_s", 0.0), 2),
        f"{prefix}_cells": med_run.get("cells", 0),
        f"{prefix}_qbp": med_run.get("total_qbp", 0),
    }


def _summarize_e2e(runs, prefix, unit="mbp"):
    """Median/best/spread + the median run's stage breakdown; unit
    names the per-hour field (mbp for DNA, maa for protein).

    Round-4 VERDICT item 4: at 40%+ min-max spread a median of 5 cannot
    resolve a <15% round-over-round change, so the headline spread is
    now TRIMMED (drop the fastest and slowest rep when >= 5 reps — the
    shared tunnel's congestion spikes hit single reps); the raw min-max
    spread is kept as *_minmax_spread_pct for the tunnel-health record.
    The congestion-insensitive companion is *_projected_local_* (code-
    determined terms only, see _add_local_projection)."""
    key = lambda r: r["total_qbp"] / 1e6 / (r["engine_s"] / 3600.0)
    runs = sorted(runs, key=key)
    mbph = [key(r) for r in runs]
    med_run = runs[len(runs) // 2]
    med = mbph[len(mbph) // 2]
    minmax = 100.0 * (mbph[-1] - mbph[0]) / med if med else 0.0
    inner = mbph[1:-1] if len(mbph) >= 5 else mbph
    spread = 100.0 * (inner[-1] - inner[0]) / med if med else 0.0
    out = {
        f"{prefix}_{unit}_per_hour": round(med, 1),
        f"{prefix}_best_{unit}_per_hour": round(mbph[-1], 1),
        f"{prefix}_spread_pct": round(spread, 1),
        f"{prefix}_minmax_spread_pct": round(minmax, 1),
    }
    out.update(_breakdown_fields(med_run, prefix))
    return out


def _bench_e2e(platform):
    """End-to-end engine throughput (the BASELINE.json north-star metric:
    Mbp classified/hour) with the kernel bench's protocol: fixed synthetic
    config-4-style workload (300 contigs 1-20 kbp, segment splits, revcomp,
    skewed candidate counts), one warm-up engine run, then E2E_REPS timed
    runs; report the MEDIAN, the full min-max spread, and the best rep (the shared tunnel's
    congestion spikes make the median a lower bound on chip capability —
    measured same-day spreads of 2-10 Gbp/h with identical code).  Each
    metric family carries the median run's device/device_wait/host/H2D
    breakdown so a tunnel regression is distinguishable from a code one.
    On TPU additionally runs the config-4 surrogate: 1-100 kbp contigs
    (BASELINE config 4's length mix scaled to the bench budget — the full
    10k-contig run is ~800x the DP cells), which exercises the long-pair
    chunked path and the >96 kbp host fallback.  Returns an error field
    on failure so the kernel metric is never lost."""
    import os
    import sys
    import tempfile

    # rep counts raised round 5 (runs got ~2.5x faster with the shared
    # pool cache, so 7/5 reps still fit the budget) — more reps + the
    # trimmed spread make single-rep tunnel spikes non-events
    E2E_CONTIGS, E2E_REPS = 300, 7
    C4_CONTIGS, C4_REPS = 350, 5
    out = {}
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import bench_e2e

        from taxtk.constants import DEFAULT_RANKS

        backend = "native" if platform == "cpu" else None
        ranks = list(DEFAULT_RANKS)
        with tempfile.TemporaryDirectory() as d:
            paths = bench_e2e.make_workload(d, E2E_CONTIGS)
            runs = _e2e_runs(
                lambda: bench_e2e.run_once(paths, ranks, backend),
                E2E_REPS)
        out.update(_summarize_e2e(runs, "e2e"))
        out["e2e_protocol"] = (
            f"median of {E2E_REPS} warm engine runs, "
            f"{E2E_CONTIGS} contigs 1-20kbp, "
            f"{runs[0]['cells']:.2e} DP cells/run"
        )
        if platform != "cpu":  # config-4 surrogate: too slow on CPU
            with tempfile.TemporaryDirectory() as d:
                paths4 = bench_e2e.make_workload(
                    d, C4_CONTIGS, max_len=100_000)
                runs4 = _e2e_runs(
                    lambda: bench_e2e.run_once(paths4, ranks, backend),
                    C4_REPS)
            out.update(_summarize_e2e(runs4, "e2e_config4"))
            out["e2e_config4_protocol"] = (
                f"median of {C4_REPS} warm engine runs, "
                f"{C4_CONTIGS} contigs 1-100kbp (config-4 surrogate), "
                f"{runs4[0]['cells']:.2e} DP cells/run"
            )
    except Exception as e:  # pragma: no cover - environment-specific
        out["e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def _bench_protein_kernel(platform):
    """Protein kernel GCUPS + protein_vs_baseline: the TPU wavefront at
    the canonical 512x256x256 launch vs the reference's algorithm
    (BLOSUM62 + linear-gap global NW, taxonpredictionmodelsequence.hh:
    173-242) on ONE CPU core (taxtk/native/protein.cpp — score-only
    mutual DP, generously excluding the reference's two extra self-DPs
    and traceback, so the ratio is conservative).  Correctness: kernel
    mutual scores must equal the native scores on a subsample."""
    import time as _t

    import numpy as np

    Bp, Mp, Np = 512, 256, 256
    rng = np.random.RandomState(7)
    from taxtk.ops.blosum import AA_ORDER

    std = np.array([AA_ORDER.index(c) for c in "ACDEFGHIKLMNPQRSTVWY"],
                   np.uint8)
    a = std[rng.randint(0, 20, (Bp, Mp))]
    b = std[rng.randint(0, 20, (Bp, Np))]
    al = np.full(Bp, Mp, np.int32)
    bl = np.full(Bp, Np, np.int32)
    out = {}
    try:
        if platform == "cpu":
            from taxtk.ops.protein_align import batched_protein_align as run

            res = run(a, b, al, bl)  # warm-up + correctness harvest
            CHAIN = 2
            gc = []
            for _ in range(3):
                t0 = _t.time()
                fins = [run(a, b, al, bl, lazy=True) for _ in range(CHAIN)]
                for f in fins:
                    f()
                gc.append(CHAIN * Bp * Mp * Np / (_t.time() - t0) / 1e9)
        else:
            # device-staged chained one-sync — the SAME protocol as the
            # DNA kernel metric: per-call host pack + H2D + readback
            # through the tunnel costs ~100+ ms, which capped the naive
            # protocol at ~1-3 GCUPS regardless of the kernel (measured,
            # BENCH r4 runs 1-2); stage the wire arrays on device once,
            # chain launches, one readback wave per rep
            import jax.numpy as jnp

            from taxtk.ops import pallas_protein as pp
            from taxtk.ops.pallas_protein import (
                batched_protein_align_pallas as run,
            )

            res = run(a, b, al, bl)  # warm-up + correctness harvest
            Mp2, steps_end, fwd_w, n_tiles = pp._shapes(Bp, Mp, Np, 256)
            Bpad = n_tiles * 256
            acode = np.full((Bpad, Mp2), 255, np.uint8)
            acode[:Bp, :Mp] = a
            fwd = np.full((Bpad, fwd_w), 255, np.uint8)
            fwd[:Bp, :Np] = b
            ablen = np.ones(Bpad, np.int32)
            ablen[:Bp] = al + bl
            alen_p = np.zeros(Bpad, np.int32)
            alen_p[:Bp] = al
            d_args = [jnp.asarray(x) for x in (acode, fwd, ablen, alen_p)]
            statics = (256, Mp2, steps_end, fwd_w, n_tiles)
            _ = float(jnp.asarray(pp._call(*d_args, *statics)).sum())
            # the canonical launch is ~1.5 ms of kernel; one tunnel sync
            # is ~50-170 ms, so short chains measure the sync (r3: 5.6
            # GCUPS at CHAIN=8) — amortize over a long chain like the
            # DNA metric's 16x137ms rounds do
            CHAIN = 128
            gc = []
            for _ in range(7):  # 7 reps: single bad tunnel windows moved
                #                 the 5-rep median by 35% (round-5 capture)
                t0 = _t.time()
                outs = [pp._call(*d_args, *statics) for _ in range(CHAIN)]
                _chk = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
                gc.append(CHAIN * Bp * Mp * Np / (_t.time() - t0) / 1e9)
            # SWAR 2x16 kernel (v6, non-default): the round-4 probe
            # predicted 2.16x but the real kernel measured ~1.0-1.06x
            # (docs/STATUS.md round 5) — record its rate each round so
            # the falsification stays visible and a toolchain shift
            # would be noticed.  Best measured config: SUB=128.
            try:
                SUBS = 128
                Mp2s, steps_s, fwd_ws, _nt = pp._shapes(Bp, Mp, Np, SUBS)
                nts = max(1, -(-Bp // (2 * SUBS)))
                Bps = 2 * nts * SUBS
                acs = np.full((Bps, Mp2s), 255, np.uint8)
                acs[:Bp, :Mp] = a
                fws = np.full((Bps, fwd_ws), 255, np.uint8)
                fws[:Bp, :Np] = b
                abls = np.ones(Bps, np.int32)
                abls[:Bp] = al + bl
                alps = np.zeros(Bps, np.int32)
                alps[:Bp] = al
                d_s = [jnp.asarray(x) for x in (acs, fws, abls, alps)]
                st_s = (SUBS, Mp2s, steps_s, fwd_ws, nts)
                _ = float(jnp.asarray(pp._call_swar(*d_s, *st_s)).sum())
                gs = []
                for _ in range(3):
                    t0 = _t.time()
                    outs = [pp._call_swar(*d_s, *st_s)
                            for _ in range(CHAIN)]
                    _chk = float(
                        jnp.stack([jnp.sum(o) for o in outs]).sum())
                    gs.append(CHAIN * Bp * Mp * Np / (_t.time() - t0) / 1e9)
                gs.sort()
                out["protein_kernel_swar_gcups"] = round(
                    gs[len(gs) // 2], 2)
            except Exception:  # pragma: no cover - device-specific
                pass
        gc.sort()
        out["protein_kernel_gcups"] = round(gc[len(gc) // 2], 2)

        from taxtk.native import load, protein_nw_batch

        if load() is not None:
            # same discipline as every other metric here: warm-up call,
            # then median of reps (a single ~4 ms shot swung the ratio
            # by tens of percent with scheduler jitter)
            n = 64
            pairs = [(a[i], b[i]) for i in range(n)]
            cpu = protein_nw_batch(pairs, n_threads=1)  # warm-up
            cpu_t = []
            for _ in range(3):
                t0 = _t.time()
                protein_nw_batch(pairs, n_threads=1)
                cpu_t.append(_t.time() - t0)
            cpu_t.sort()
            cpu_gcups = n * Mp * Np / cpu_t[len(cpu_t) // 2] / 1e9
            out["protein_vs_baseline"] = round(
                out["protein_kernel_gcups"] / cpu_gcups, 2)
            assert (np.asarray(res["mutual"][:n], np.int32) == cpu).all(), \
                "protein kernel vs native NW mismatch"
    except Exception as e:  # pragma: no cover - environment-specific
        out["protein_kernel_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def _bench_e2e_protein(platform):
    """Protein engine throughput (Maa classified/hour): blastp-style ORF
    workload through the full protein RPA path, same protocol as the DNA
    e2e (warm-up run + timed reps, median/best/min-max spread), plus the
    protein kernel + CPU-baseline metrics (_bench_protein_kernel)."""
    import os
    import sys
    import tempfile

    P_ORFS, P_REPS = 2000, 7
    out = _bench_protein_kernel(platform)
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import bench_e2e

        from taxtk.constants import DEFAULT_RANKS

        backend = "wavefront" if platform == "cpu" else None
        ranks = list(DEFAULT_RANKS)
        with tempfile.TemporaryDirectory() as d:
            paths = bench_e2e.make_workload_protein(d, P_ORFS)
            runs = _e2e_runs(
                lambda: bench_e2e.run_once(
                    paths, ranks, protein=True, protein_backend=backend),
                P_REPS)
        out.update(_summarize_e2e(runs, "protein_e2e", unit="maa"))
        out["protein_e2e_protocol"] = (
            f"median of {P_REPS} warm engine runs, {P_ORFS} ORFs, "
            f"{runs[0]['pairs']} realignments/run"
        )
    except Exception as e:  # pragma: no cover - environment-specific
        out["protein_e2e_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


if __name__ == "__main__":
    import os

    if os.environ.get("TAXTK_BENCH_INNER") == "1":
        mode = os.environ.get("TAXTK_BENCH_MODE")
        if mode in ("e2e", "e2e-protein"):
            import jax as _jax

            if os.environ.get("TAXTK_FORCE_CPU") == "1":
                _jax.config.update("jax_platforms", "cpu")
            fn = _bench_e2e if mode == "e2e" else _bench_e2e_protein
            print(json.dumps(fn(_jax.devices()[0].platform)))
        else:
            main()
    else:
        _run_with_watchdog()
