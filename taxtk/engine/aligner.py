"""Batched alignment service: ragged pair lists -> bucketed device batches.

This is the TPU replacement for the reference's one-pair-at-a-time SeqAn
calls (reference: taxonpredictionmodelsequence.hh:526,:630,:778): the RPA
executor gathers every pair the current macro-batch of record sets needs,
buckets them by padded shape (powers of two), and runs one wavefront-DP
kernel launch per bucket.  Results are exact — bucketing only changes
padding, never values.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.rpa import AlignValue, f32
from ..ops.dna_align import batched_edit_distance
from ..ops.myers_batch import batched_edit_distance_myers
from ..ops.protein_align import batched_protein_align


def _pow2ceil(x: int, minimum: int = 16) -> int:
    n = minimum
    while n < x:
        n <<= 1
    return n


def _on_accelerator() -> bool:
    try:
        import jax

        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _default_dna_backend() -> str:
    return "myers-pallas" if _on_accelerator() else "myers"


def _default_protein_backend() -> str:
    # measured on v5e (benchmarks/bench_protein_device.py): pallas 1.11
    # GCUPS vs XLA wavefront 0.09 GCUPS device-only, identical outputs
    return "wavefront-pallas" if _on_accelerator() else "wavefront"


class _DevPending:
    """A dispatched device bucket: dev (device array, D2H copy already
    started), post (host-array -> values), fill (values -> results),
    fallback (host recompute on device failure)."""

    __slots__ = ("dev", "post", "fill", "fallback")

    def __init__(self, dev, post, fill, fallback):
        self.dev = dev
        self.post = post
        self.fill = fill
        self.fallback = fallback

    def run(self, aligner):
        try:
            value = self.post(np.asarray(self.dev))
        except Exception as e:  # pragma: no cover - device-specific
            aligner._warn_fallback(e, "host recompute")
            value = self.fallback()
        self.fill(value)


class BatchAligner:
    """mode: "dna" (edit distance + approximate stats) or "protein"
    (BLOSUM62 NW + traceback stats).

    dna_backend: "myers" (XLA bit-parallel, portable), "myers-pallas"
    (TPU kernel), "native" (C++ work-stealing host batch — fastest with
    no accelerator), or "wavefront" (anti-diagonal scan).  All are exact;
    see ops/myers_batch.py for the algorithmic comparison.
    """

    # align_pairs(deferred=True) returns a finish() callable (the engine's
    # macro-batch pipeline feature-detects this attribute)
    supports_deferred = True

    def __init__(
        self,
        mode: str = "dna",
        max_batch_cells: int = 1 << 28,
        dna_backend: str | None = None,
        protein_backend: str | None = None,
        mesh=None,
        pallas_interpret: bool = False,
    ):
        # pallas_interpret: run the pallas kernels in interpreter mode (CPU
        # tests of the production TPU path, incl. the device pool cache)
        self.pallas_interpret = pallas_interpret
        # mesh: optional jax.sharding.Mesh with a "dp" axis — alignment
        # batches shard over it (pure data parallelism, no collectives);
        # applies to the XLA myers backend
        self.mesh = mesh
        assert mode in ("dna", "protein")
        self.mode = mode
        self.dna_backend = dna_backend or _default_dna_backend()
        # protein: "wavefront-pallas" (TPU default) or "wavefront"
        # (XLA scan, portable; CPU default)
        self.protein_backend = protein_backend or _default_protein_backend()
        # cap on batch * M * N cells per launch to bound device memory
        self.max_batch_cells = max_batch_cells
        # patterns longer than this leave the per-pow2-bucket short path.
        # XLA backend: 6144 = its VMEM-bound single-launch cap (beyond ->
        # host).  Pallas backend: 2048 = the single-launch kernel's
        # CHUNK_KC cap — the short entry would redirect such pairs to the
        # chunked kernel anyway, but as isolated cell-budget chunks padded
        # to the 1024-lane tile (measured 6-25% lane fill on the config-4
        # surrogate); routing them into the sorted long stream instead
        # lets the slot-packed systolic kernel batch them densely
        from ..ops.pallas_myers import CHUNK_KC, WORD

        self.long_pattern_threshold = (
            CHUNK_KC * WORD if self.dna_backend == "myers-pallas" else 6144
        )
        # chunked-kernel caps (see ops/pallas_myers.py): patterns up to
        # 96kbp / texts up to 256kbp stay on device; beyond -> host C++
        from ..ops.pallas_myers import LONG_PATTERN_CAP, LONG_TEXT_CAP

        self.tpu_long_pattern_cap = LONG_PATTERN_CAP
        self.tpu_long_text_cap = LONG_TEXT_CAP
        # long chunks below this pair count route to the block-systolic
        # kernel.  Round-5 measurement: the systolic path wins at EVERY
        # pair count, not just small rounds — the pair-tile chunked kernel
        # runs uniform [Bp, Kp, Np] launches whose fill over the sorted
        # config-4 stream measured 24.9% (ragged pattern/text lengths
        # inside each 1024-pair cut), while slot packing holds ~60%:
        # interleaved e2e A/B 8,620 -> 13,572 Mbp/h, GFF3 byte-identical.
        # The chunked kernel remains as the oversized-round fallback.
        self.systolic_max_pairs = 1 << 30
        self.pairs_aligned = 0
        self.cells_computed = 0
        self.stage_seconds = {}  # per-phase accounting (kernel vs staging)
        # cross-round device-resident sequence pool (ops/seqpool.py): RPA's
        # pass-1/2 rounds re-align the segments pass 0 already shipped
        # (~48% of pool H2D bytes are re-ships, benchmarks/probe_pool_reuse
        # .py).  The cache is PROCESS-SHARED per device by default: pools
        # are content-addressed, so repeated engine runs against the same
        # refpack ship each unique row once per process, not once per run
        # (the round-4 config-4 cold wire was 154.5 MB/run of re-ships)
        self.pool_cache = None
        if (self.mode == "dna" and self.dna_backend == "myers-pallas") or (
            self.mode == "protein"
            and self.protein_backend == "wavefront-pallas"
        ):
            from ..ops.seqpool import shared_pool_cache

            self.pool_cache = shared_pool_cache()
        # interpret mode defaults pool_gather off; force it on so the pool
        # (and pool cache) paths are exercised exactly as on TPU
        self._pallas_kw = (
            dict(interpret=True, pool_gather=True)
            if self.pallas_interpret
            else {}
        )
        # dp×tp engine backend (parallel/engine_mesh.py), set by RpaEngine
        # when a mesh is in play: alignment batches then run per-device
        # (pairs on their refpack shard's tp column, dp rows within it)
        # through the full production dispatch path
        self.mesh_backend = None
        self._pool_caches: Dict[object, object] = {}  # per-device (mesh mode)

    def _tick(self, name, t0):
        import time

        self.stage_seconds[name] = self.stage_seconds.get(name, 0.0) + (
            time.time() - t0
        )

    def _run_host_long(self, pairs, idxs, results):
        # NOTE: cells_computed for these pairs is counted by the CALLER
        # (align_pairs) before the worker thread starts — incrementing the
        # shared counter from this thread would race the main thread's
        # bucket increments (stats-only, but it silently undercounts)
        try:
            from ..native import myers_batch, load

            if load() is not None:
                dists = myers_batch([pairs[k] for k in idxs])
            else:
                raise RuntimeError
        except Exception:
            from ..ops import oracle

            dists = [oracle.edit_distance(*pairs[k]) for k in idxs]
        for k, d in zip(idxs, dists):
            a, b = pairs[k]
            dist = int(d)
            lendiff = abs(len(a) - len(b))
            matches = min(len(a), len(b)) - (dist - lendiff)
            results[k] = AlignValue(distance=f32(dist), similarity=f32(matches))

    def align_pairs(
        self,
        pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
        shard_ids: Optional[Sequence[int]] = None,
        deferred: bool = False,
    ) -> List[AlignValue]:
        """pairs: list of (a_codes, b_codes) uint8 arrays (A = first argument
        of the reference getAlignment call — order matters for protein).

        shard_ids: optional tp-shard assignment per pair (the refpack shard
        owning the pair's reference segment); with a mesh backend attached,
        DNA pairs then run as ONE tp×dp-sharded SPMD launch instead of the
        single-device bucket ladder.

        deferred=True dispatches all device work and returns a zero-arg
        finish() callable that blocks on the readbacks and returns the
        results list (used by the macro-batch pipeline to overlap this
        round's device wait with another batch's host replay)."""
        results: List[AlignValue] = [None] * len(pairs)  # type: ignore

        # degenerate pairs resolved on host; very long DNA patterns (peq
        # would exceed the VMEM budget) route to the native host Myers
        native_all = self.mode == "dna" and self.dna_backend == "native"
        work: List[int] = []
        tpu_long: List[int] = []
        host_long: List[int] = []
        for k, (a, b) in enumerate(pairs):
            if len(a) == 0 or len(b) == 0:
                results[k] = self._empty_pair(len(a), len(b))
            elif native_all:
                # "native" backend: the whole DNA batch through the C++
                # work-stealing Myers (taxtk/native/myers.cpp) on the host
                # thread pool — the fastest path when no accelerator is
                # attached (CPU pipelines, config-5 scale runs)
                host_long.append(k)
            elif (
                self.mode == "dna"
                and self.dna_backend in ("myers", "myers-pallas")
                and min(len(a), len(b)) > self.long_pattern_threshold
            ):
                # pattern exceeds the single-launch VMEM budget; the
                # pattern-block-chunked pallas kernel handles it on device
                # up to the caps, beyond which the native host path runs
                if (
                    self.dna_backend == "myers-pallas"
                    and min(len(a), len(b)) <= self.tpu_long_pattern_cap
                    and max(len(a), len(b)) <= self.tpu_long_text_cap
                ):
                    tpu_long.append(k)
                else:
                    host_long.append(k)
            else:
                work.append(k)

        host_thread = None
        if host_long:
            # run the native host path CONCURRENTLY with the device buckets:
            # the C++ batch releases the GIL and work-steals across cores,
            # so long-segment host alignment hides behind device rounds
            import threading

            for k in host_long:
                a, b = pairs[k]
                self.cells_computed += len(a) * len(b)
            t_start = _time.time()

            def _host_work():
                self._run_host_long(pairs, host_long, results)
                self._tick("host_long", t_start)

            host_thread = threading.Thread(target=_host_work)
            host_thread.start()

        # dispatch every bucket before blocking on any readback: kernels are
        # queued asynchronously and D2H copies start as each finishes, so
        # the ~170 ms/transfer tunnel latency overlaps with compute instead
        # of serializing one bucket at a time
        finishers = []

        if self.mesh_backend is not None:
            # dp×tp mesh round: every pair runs on the device owning its
            # refpack shard's tp column (dp rows split within a column),
            # through the FULL production dispatch path — same bucket
            # ladder, 2-bit wire, device-built peq and per-device pool
            # cache as single-chip; distances need no collectives (they
            # are disjoint), so the parallelism is independent per-device
            # programs dispatched asynchronously (the pass-0 reductions
            # are the collective part, parallel/engine_mesh.py)
            if shard_ids is None:  # tp=1: all pairs on column 0, dp spreads
                shard_ids = [0] * len(pairs)
            self._dispatch_mesh(
                pairs, work, tpu_long, shard_ids, results, finishers
            )
        else:
            self._dispatch_set(
                pairs, work, tpu_long, results, finishers, self.pool_cache
            )

        def finish():
            t0 = _time.time()
            # Wait for every dispatched bucket WITHOUT a readback: polling
            # is_ready() is a local future check, so the wait costs no
            # tunnel round-trip (the per-bucket copy_to_host_async copies
            # were started at dispatch and land during the same window).
            # The old flush (float of a stacked sum) paid one extra D2H
            # round-trip (~0.1 s through the tunnel) per align round.
            devs = [f.dev for f in finishers if isinstance(f, _DevPending)]
            if devs:
                try:
                    pending = list(devs)
                    while pending:
                        pending = [d for d in pending if not d.is_ready()]
                        if pending:
                            _time.sleep(0.002)
                except Exception:  # pragma: no cover - device-specific
                    # fall back to the scalar flush sync
                    try:
                        import jax.numpy as jnp

                        float(jnp.stack([jnp.sum(d) for d in devs]).sum())
                    except Exception:
                        pass
            self._tick("device_wait", t0)
            t0 = _time.time()
            for fin in finishers:
                if isinstance(fin, _DevPending):
                    fin.run(self)
                else:
                    fin()
            self._tick("collect", t0)
            if host_thread is not None:
                host_thread.join()
            self.pairs_aligned += len(pairs)
            return results

        if deferred:
            # everything is dispatched; the caller decides when to block
            # (RpaEngine overlaps this wait with another macro-batch's host
            # replay, engine/executor.py)
            return finish
        return finish()

    def _dispatch_set(self, pairs, work, tpu_long, results, finishers,
                      pool_cache):
        """Dispatch one device's worth of pairs: long pairs through the
        pattern-block-chunked kernel, everything else through the shape
        buckets.  Runs under whatever jax default device is active."""
        if tpu_long:
            self._dispatch_tpu_long(
                pairs, tpu_long, results, finishers, pool_cache
            )
        buckets: Dict[Tuple[int, int], List[int]] = {}
        if self.mode == "dna" and self.dna_backend in ("myers", "myers-pallas"):
            # Myers cost is pairs x text x ceil(pattern/32): only the text
            # length needs bucketing; everything else pads internally.  Far
            # fewer buckets => fewer kernel rounds and device readbacks.
            for k in work:
                a, b = pairs[k]
                key = (0, _pow2ceil(max(len(a), len(b))))
                buckets.setdefault(key, []).append(k)
        else:
            # protein: one square bucket per pow2 of the max dimension —
            # the wavefront kernel is cheap at these lengths and every
            # extra bucket is another launch + H2D through the tunnel
            for k in work:
                a, b = pairs[k]
                L = _pow2ceil(max(len(a), len(b)))
                buckets.setdefault((L, L), []).append(k)

        for (M, N), idxs in buckets.items():
            if M == 0:
                # Myers bucket: word-packed cost is ~cells/32.  Floor at one
                # full pair tile (1024): the kernel ships [text, 1024]-wide
                # arrays regardless of the real pair count, so filling the
                # tile amortizes the H2D bytes over up to 32x more pairs
                M = N
                # floor: one full pair tile; cap: the canonical 8-tile
                # group, keeping the compiled-shape set at two points
                max_pairs = min(
                    8192,
                    max(1024, self.max_batch_cells // max(1, (M * N) // 32)),
                )
            else:
                max_pairs = max(1, self.max_batch_cells // (M * N))
            for off in range(0, len(idxs), max_pairs):
                chunk = idxs[off : off + max_pairs]
                self._run_bucket(
                    pairs, chunk, M, N, results, finishers, pool_cache
                )

    def _dispatch_mesh(self, pairs, work, tpu_long, shard_ids, results,
                       finishers):
        """Partition pairs over the dp×tp device grid (tp column = refpack
        shard owning the pair's reference, dp row by a STABLE content hash
        of the pair's text side) and run the production dispatch per
        device.  Each device keeps its own cross-round pool cache; the
        stable row assignment keeps a segment's re-alignments (pass 1/2
        re-use pass-0 segments) on the same device across rounds, so rows
        stay pool-resident — an arrival-order round-robin scattered each
        segment over all dp rows and made every row's pool ship nearly
        everything."""
        import jax
        import zlib

        grid = self.mesh_backend.mesh.devices  # [dp, tp]
        dp, tp = grid.shape

        def dp_row(k):
            if dp == 1:
                return 0
            a, b = pairs[k]
            t = b if len(b) >= len(a) else a  # text side (longer)
            # cheap content-stable key: crc of length + boundary bytes
            # (deterministic across processes, unlike hash())
            key = b"%d:%s:%s" % (
                len(t), t[:16].tobytes(), t[-16:].tobytes()
            )
            return zlib.crc32(key) % dp

        per_dev: Dict[Tuple[int, int], Tuple[List[int], List[int]]] = {}
        for lst, slot in ((work, 0), (tpu_long, 1)):
            for k in lst:
                c = shard_ids[k]
                per_dev.setdefault((dp_row(k), c), ([], []))[slot].append(k)
        if dp > 1:
            self._balance_dp_rows(per_dev, dp, tp)
        for (r, c) in sorted(per_dev):
            w, tl = per_dev[(r, c)]
            dev = grid[r][c]
            with jax.default_device(dev):
                self._dispatch_set(
                    pairs, w, tl, results, finishers, self._device_pool(dev)
                )

    @staticmethod
    def _balance_dp_rows(per_dev, dp, tp):
        """Cap per-row load within each tp column at fair share + half a
        fair share and spill the overflow to the least-loaded rows
        (deterministic order).  The content-stable dp_row routing keeps
        segments pool-resident, but a workload where one segment is the
        text of many pairs would land the whole set on one row and idle
        the others; spilling only the overflow fraction bounds the
        imbalance while keeping locality for everything under the cap.
        (cap = 1.5x fair share, NOT 2x: at dp=2 a fully skewed column is
        exactly 2x fair share, so a 2x cap never binds there — round-4
        advisor finding.)"""
        for c in range(tp):
            rows = {r: per_dev.get((r, c)) for r in range(dp)}
            loads = {
                r: (len(v[0]) + len(v[1])) if v else 0
                for r, v in rows.items()
            }
            total = sum(loads.values())
            if not total:
                continue
            fair = -(-total // dp)
            # floor of 2: moving a lone pair off a 2-pair row buys nothing
            # (launch overhead dominates) and would unsettle pool locality
            cap = max(2, fair + total // (2 * dp))
            spill: List[Tuple[int, int]] = []  # (k, slot)
            for r in sorted(rows):
                v = rows[r]
                if v is None or loads[r] <= cap:
                    continue
                excess = loads[r] - cap
                # drain short-bucket work (slot 0) before long pairs,
                # taking from each list's tail (keeps the head — oldest,
                # most likely pool-resident — in place)
                for slot in (0, 1):
                    while excess and v[slot]:
                        spill.append((v[slot].pop(), slot))
                        excess -= 1
                        loads[r] -= 1
                    if not excess:
                        break
            for k, slot in spill:
                r = min(sorted(loads), key=lambda x: loads[x])
                per_dev.setdefault((r, c), ([], []))[slot].append(k)
                loads[r] += 1

    def _device_pool(self, dev):
        """Per-device cross-round pool cache (mesh mode): each device's
        pool lives in its own HBM (process-shared per device, like the
        single-device cache)."""
        if self.pool_cache is None:
            return None
        p = self._pool_caches.get(dev)
        if p is None:
            from ..ops.seqpool import shared_pool_cache

            p = self._pool_caches[dev] = shared_pool_cache(dev)
        return p

    def _dispatch_tpu_long(self, pairs, idxs_all, results, finishers,
                           pool_cache=None):
        """Long-pattern pairs through the pattern-block-chunked pallas
        kernel (ops/pallas_myers.py): one length-sorted stream cut into
        full pair-tile chunks (see the fill-factor note below); falls
        back to the host batch on any device failure."""
        from ..ops.pallas_myers import batched_edit_distance_pallas_myers_long

        # ONE sorted stream instead of per-pow2-class buckets: the kernel
        # pads every launch to a full pair tile (1024 lanes), so
        # fragmenting long pairs across text classes ran mostly-empty
        # tiles — measured on the config-4 surrogate (BENCH r4 run 1) the
        # effective rate was ~15% of the kernel's.  The long entry
        # computes K/Np from each batch's own maxima, so sorting by text
        # length descending and cutting full 1024-pair chunks gives every
        # launch a high fill factor AND a near-tight pow2 pad (neighbors
        # in the sorted order have similar lengths); per-pow2 compiled
        # variants are unchanged (the block kernel is shape-keyed by
        # (Tc, n_chunks) only).  Small rounds (< 1 tile of long pairs)
        # still pay the tile floor — inherent to pairs-across-lanes.
        idxs = sorted(
            idxs_all,
            key=lambda k: -max(len(pairs[k][0]), len(pairs[k][1])),
        )
        for off in range(0, len(idxs), 1024):
            chunk = idxs[off : off + 1024]
            t0 = _time.time()
            B = len(chunk)
            maxa = max(len(pairs[k][0]) for k in chunk)
            maxb = max(len(pairs[k][1]) for k in chunk)
            a_codes = np.zeros((B, maxa), np.uint8)
            b_codes = np.zeros((B, maxb), np.uint8)
            a_len = np.zeros(B, np.int32)
            b_len = np.zeros(B, np.int32)
            for r, k in enumerate(chunk):
                a, b = pairs[k]
                a_codes[r, : len(a)] = a
                b_codes[r, : len(b)] = b
                a_len[r] = len(a)
                b_len[r] = len(b)
            self.cells_computed += int((a_len.astype(np.int64) * b_len).sum())
            self._tick("stage_batch", t0)
            t0 = _time.time()

            def fill_long(dist, chunk=chunk, a_len=a_len, b_len=b_len):
                for r, k in enumerate(chunk):
                    d = int(dist[r])
                    lendiff = abs(int(a_len[r]) - int(b_len[r]))
                    matches = min(int(a_len[r]), int(b_len[r])) - (d - lendiff)
                    results[k] = AlignValue(
                        distance=f32(d), similarity=f32(matches)
                    )

            def fallback_long(chunk=chunk):
                from ..native import myers_batch, load

                if load() is not None:
                    return myers_batch([pairs[k] for k in chunk])
                from ..ops import oracle

                return [oracle.edit_distance(*pairs[k]) for k in chunk]

            try:
                if B < self.systolic_max_pairs:
                    # sub-half-tile chunks: the block-SYSTOLIC kernel maps
                    # (pair, pattern-block) slots to lanes, so lane fill
                    # scales with pairs x blocks — measured on chip 3.1x /
                    # 17.7x / 53x over the pair-tile chunked path at
                    # 64x25k / 16x50k / 4x98k (benchmarks/
                    # probe_long_kernel.py --systolic, KC=32)
                    from ..ops.pallas_myers_systolic import (
                        batched_edit_distance_systolic,
                    )

                    dev, post = batched_edit_distance_systolic(
                        a_codes, b_codes, a_len, b_len, lazy="device",
                        interpret=self.pallas_interpret,
                        pool_cache=pool_cache,
                    )
                else:
                    dev, post = batched_edit_distance_pallas_myers_long(
                        a_codes, b_codes, a_len, b_len, lazy="device",
                        pool_cache=pool_cache, **self._pallas_kw,
                    )
            except Exception as e:  # pragma: no cover - device-specific
                self._warn_fallback(e, "host myers")
                fill_long(fallback_long())
                self._tick("device", t0)
                continue
            from ..ops.myers_batch import start_host_copy

            finishers.append(
                _DevPending(
                    start_host_copy(dev), post, fill_long, fallback_long
                )
            )
            self._tick("device", t0)

    def _run_bucket(self, pairs, idxs, M, N, results, finishers=None,
                    pool_cache=None):
        import time

        t0 = time.time()
        B = len(idxs)
        Bpad = _pow2ceil(B, minimum=8)
        a_codes = np.zeros((Bpad, M), dtype=np.uint8)
        b_codes = np.zeros((Bpad, N), dtype=np.uint8)
        a_len = np.zeros(Bpad, dtype=np.int32)
        b_len = np.zeros(Bpad, dtype=np.int32)
        for r, k in enumerate(idxs):
            a, b = pairs[k]
            a_codes[r, : len(a)] = a
            b_codes[r, : len(b)] = b
            a_len[r] = len(a)
            b_len[r] = len(b)
        a_len[B:] = 1  # dummy rows
        b_len[B:] = 1
        self.cells_computed += int(a_len.sum() * 0 + (a_len * b_len).sum())
        self._tick("stage_batch", t0)
        t0 = time.time()

        from ..ops.myers_batch import start_host_copy

        if self.mode == "dna":
            def fill_dna(dist, idxs=idxs, a_len=a_len, b_len=b_len):
                lendiff = np.abs(a_len - b_len)
                mismatches = dist - lendiff
                matches = np.minimum(a_len, b_len) - mismatches
                # pre-cast once; indexing a float32 array yields np.float32
                # scalars, so no per-pair cast calls in the hot loop
                dist32 = np.asarray(dist).astype(np.float32)
                matches32 = matches.astype(np.float32)
                for r, k in enumerate(idxs):
                    results[k] = AlignValue(dist32[r], matches32[r])

            def fallback_dna(a_codes=a_codes, b_codes=b_codes,
                             a_len=a_len, b_len=b_len):
                return batched_edit_distance_myers(a_codes, b_codes, a_len, b_len)

            pending = None
            if self.dna_backend == "myers":
                # dp-only shard_map path for a bare BatchAligner(mesh=...)
                # without the engine backend; with a mesh_backend attached,
                # _dispatch_mesh already owns device placement
                if self.mesh is not None and self.mesh_backend is None:
                    fill_dna(self._myers_sharded(a_codes, b_codes, a_len, b_len))
                else:
                    dev, post = batched_edit_distance_myers(
                        a_codes, b_codes, a_len, b_len, lazy="device"
                    )
                    pending = _DevPending(
                        start_host_copy(dev), post, fill_dna, fallback_dna
                    )
            elif self.dna_backend == "myers-pallas":
                from ..ops.pallas_myers import batched_edit_distance_pallas_myers

                try:
                    dev, post = batched_edit_distance_pallas_myers(
                        a_codes, b_codes, a_len, b_len, lazy="device",
                        pool_cache=pool_cache, **self._pallas_kw,
                    )
                except Exception as e:  # pragma: no cover - device-specific
                    # graceful degradation: a kernel that cannot compile or
                    # launch (e.g. VMEM pressure on an unusual shape) must
                    # not kill the run — the XLA formulation always works
                    self._warn_fallback(e, "XLA myers")
                    dev, post = batched_edit_distance_myers(
                        a_codes, b_codes, a_len, b_len, lazy="device"
                    )
                pending = _DevPending(
                    start_host_copy(dev), post, fill_dna, fallback_dna
                )
            else:
                fill_dna(
                    np.asarray(
                        batched_edit_distance(a_codes, b_codes, a_len, b_len)
                    )
                )
            self._tick("device", t0)
            if pending is not None:
                if finishers is None:
                    pending.run(self)
                else:
                    finishers.append(pending)
        else:
            def fill_protein(out, idxs=idxs):
                dist = out["distance"]  # already float32 (post() math)
                sim = out["similarity"]
                for r, k in enumerate(idxs):
                    results[k] = AlignValue(dist[r], sim[r])

            def fallback_protein(a_codes=a_codes, b_codes=b_codes,
                                 a_len=a_len, b_len=b_len):
                return batched_protein_align(a_codes, b_codes, a_len, b_len)

            if self.protein_backend == "wavefront-pallas":
                from ..ops.pallas_protein import batched_protein_align_pallas

                try:
                    dev, post = batched_protein_align_pallas(
                        a_codes, b_codes, a_len, b_len, lazy="device",
                        interpret=self.pallas_interpret,
                        pool_cache=pool_cache,
                    )
                except Exception as e:  # pragma: no cover - device-specific
                    # same graceful degradation as the DNA pallas path
                    self._warn_fallback(e, "XLA wavefront")
                    dev, post = batched_protein_align(
                        a_codes, b_codes, a_len, b_len, lazy="device"
                    )
            else:
                dev, post = batched_protein_align(
                    a_codes, b_codes, a_len, b_len, lazy="device"
                )
            pending = _DevPending(
                start_host_copy(dev), post, fill_protein, fallback_protein
            )
            self._tick("device", t0)
            if finishers is None:
                pending.run(self)
            else:
                finishers.append(pending)

    def _warn_fallback(self, e, what):  # pragma: no cover - device-specific
        if not getattr(self, "_pallas_warned", False):
            import sys

            print(
                f"taxtk: pallas kernel fallback ({type(e).__name__}); "
                f"using {what} for this bucket",
                file=sys.stderr,
            )
            self._pallas_warned = True

    def _myers_sharded(self, a_codes, b_codes, a_len, b_len):
        """Myers kernel with the pair batch sharded over the mesh "dp" axis
        (each device computes its slice; no cross-device communication)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.myers_batch import _precompute, _myers_kernel

        dp = self.mesh.shape["dp"]
        B = len(a_len)
        Bp = -(-B // dp) * dp
        pad = Bp - B

        def padb(x, fill):
            if pad == 0:
                return np.asarray(x)
            x = np.asarray(x)
            extra = np.full((pad,) + x.shape[1:], fill, x.dtype)
            return np.concatenate([x, extra])

        peq, text, hmask, m_len, n_len, K = _precompute(
            padb(a_codes, 0),
            padb(b_codes, 0),
            padb(a_len, 1),
            padb(b_len, 1),
        )
        shard_b = NamedSharding(self.mesh, P(None, None, "dp"))
        shard_nb = NamedSharding(self.mesh, P(None, "dp"))
        shard_1 = NamedSharding(self.mesh, P("dp"))
        args = (
            jax.device_put(jnp.asarray(peq), shard_b),
            jax.device_put(jnp.asarray(text), shard_nb),
            jax.device_put(jnp.asarray(hmask), shard_nb),
            jax.device_put(jnp.asarray(m_len), shard_1),
            jax.device_put(jnp.asarray(n_len), shard_1),
        )
        out = np.asarray(_myers_kernel(*args))[:B]
        return np.where(m_len[:B] == 0, n_len[:B], out)

    def _empty_pair(self, la: int, lb: int) -> AlignValue:
        if self.mode == "dna":
            dist = max(la, lb)
            matches = 0
            return AlignValue(distance=f32(dist), similarity=f32(matches))
        # protein with an empty side: all-gap alignment
        return AlignValue(distance=f32(0.0), similarity=f32(0.0))
