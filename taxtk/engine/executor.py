"""Macro-batched RPA execution: stream record sets, batch alignments, emit GFF3.

Pipeline per macro-batch of record sets (reference equivalent: the serial
predict loop, taxator.cpp:50-77, and the producer/consumer pool :181-210 —
here the parallel axis is the DEVICE batch, not threads, and output order is
always input order, i.e. serial-mode semantics):

  1. prepare():       classify tasks, collect pass-0 pairs     -> device round
  2. replay_pass0():  pass-0 bookkeeping, pass-1 pair superset -> device round
  3. replay_pass1():  anchors/outgroup, pass-2 pair superset   -> device round
  4. replay_pass2():  final taxon ranges -> GFF3 lines in input order
"""

from __future__ import annotations

import sys
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..formats.gff3 import PredictionRecord, GFF3_HEADER
from ..models.rpa import RpaTask, AlignValue, PairKey
from ..refpack.store import encode_dna, encode_protein, revcomp_dna
from ..taxonomy.flat import FlatTaxonomy
from .aligner import BatchAligner


class SegmentCache:
    """Lazy per-task sequence fetch + encode, mirroring RPA getSequence
    (reference: taxonpredictionmodelsequence.hh:856-880): reference segments
    are extended by the query overhangs; swapped reference coordinates mean
    reverse complement (DNA only)."""

    def __init__(self, task: RpaTask, query_store, db_store, protein: bool):
        self.task = task
        self.query_store = query_store
        self.db_store = db_store
        self.protein = protein
        self._qrseq: Optional[np.ndarray] = None
        self._segments: Dict[int, np.ndarray] = {}

    def _encode(self, raw: bytes) -> np.ndarray:
        return encode_protein(raw) if self.protein else encode_dna(raw)

    def qrseq(self) -> np.ndarray:
        if self._qrseq is None:
            raw = self.query_store.get_sequence(
                self.task.qid, self.task.qrstart, self.task.qrstop
            )
            self._qrseq = self._encode(raw)
        return self._qrseq

    def segment_spec(self, i: int):
        """(refid, start, stop, revcomp) with query-overhang extension
        (reference: taxonpredictionmodelsequence.hh:856-880)."""
        rec = self.task.records[i]
        left_ext = rec.query_start - self.task.qrstart
        right_ext = self.task.qrstop - rec.query_stop
        start, stop = rec.reference_start, rec.reference_stop
        if not self.protein and start > stop:
            # reverse complement: swapped coords (doc/fileformats.md:30)
            newstart = stop - right_ext if right_ext < stop else 1
            newstop = start + left_ext
            return (rec.reference_identifier, newstart, newstop, True)
        newstart = start - left_ext if left_ext < start else 1
        newstop = stop + right_ext
        return (rec.reference_identifier, newstart, newstop, False)

    def segment(self, i: int) -> np.ndarray:
        seg = self._segments.get(i)
        if seg is None:
            refid, newstart, newstop, rc = self.segment_spec(i)
            raw = self.db_store.get_sequence(refid, newstart, newstop)
            seg = self._encode(raw)
            if rc:
                seg = revcomp_dna(seg)
            self._segments[i] = seg
        return seg

    def missing_segments(self, keys) -> List[int]:
        need = set()
        for kind, i, j in keys:
            if i not in self._segments:
                need.add(i)
            if kind == "s" and j not in self._segments:
                need.add(j)
        return sorted(need)

    def store_segments(self, idxs, arrays):
        for i, arr in zip(idxs, arrays):
            self._segments[i] = arr

    def pair_sequences(self, key: PairKey) -> Tuple[np.ndarray, np.ndarray]:
        kind, i, j = key
        if kind == "q":
            return self.segment(i), self.qrseq()
        return self.segment(i), self.segment(j)


def drive_sync(gen):
    """Run a stage generator (see RpaEngine._stages) to completion inline:
    each yielded device finish() is called immediately and its values sent
    back.  Returns the generator's return value."""
    try:
        finish = next(gen)
        while True:
            finish = gen.send(finish())
    except StopIteration as stop:
        return stop.value


class RpaEngine:
    def __init__(
        self,
        tax: FlatTaxonomy,
        query_store,
        db_store,
        protein: bool = False,
        exclude_factor: float = 0.5,
        toppercent: float = 0.05,
        macro_batch: Optional[int] = None,
        aligner: Optional[BatchAligner] = None,
        logsink=None,
        mesh=None,
    ):
        if macro_batch is None:
            import os

            env = os.environ.get("TAXTK_MACRO_BATCH")
            if env:
                macro_batch = int(env)
            else:
                # Batch large enough to amortize the per-round dispatch/
                # readback latency, small enough that streams split into
                # multiple batches and the depth-2 pipeline in run() overlaps
                # one batch's device waits with the other's host replay.
                # Measured on the 2000-set protein e2e (readiness-poll
                # flush): 2x1024 median 1460 Maa/h vs 1x2000 1340 vs 4x512
                # 1270 — more batches help until the extra sync round-trips
                # outgrow the host work available to hide them.
                macro_batch = 1024
        self.tax = tax
        self.query_store = query_store
        self.db_store = db_store
        self.protein = protein
        self.exclude_factor = exclude_factor
        self.toppercent = toppercent
        self.macro_batch = macro_batch
        self.aligner = aligner or BatchAligner(
            "protein" if protein else "dna", mesh=mesh
        )
        self.logsink = logsink
        # dp×tp mesh: candidate pairs shard over the tp (refpack) axis and
        # pass-0 reductions merge via collectives (parallel/engine_mesh.py)
        self.mesh_backend = None
        if mesh is not None:
            from ..parallel.engine_mesh import MeshEngineBackend

            self.mesh_backend = MeshEngineBackend(mesh, tax.path)
            self.aligner.mesh_backend = self.mesh_backend
        from .metrics import EngineMetrics

        self.metrics = EngineMetrics()

    def run(self, recordsets: Iterable[list], out=sys.stdout) -> None:
        """Stream record sets -> GFF3 on `out` (serial-mode byte parity:
        single persistent PredictionRecord, see models/rpa.py quirk notes).

        Two-level overlap (the TPU-native analog of the reference's
        producer/consumer pool, taxator.cpp:100-122, with the macro-batch
        as the unit):

        * the next macro-batch is parsed on a background thread while the
          current ones run, and
        * up to two macro-batches are processed as a software PIPELINE —
          each batch's device rounds (dispatch -> readback) run via
          deferred aligner finishes on a waiter thread, so one batch's
          device wait (kernel time + tunnel round-trip) hides behind the
          other batch's host replay.  GFF3 emission stays input-ordered.
        """
        import threading
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from queue import Queue

        out.write(GFF3_HEADER + "\n")
        prec = PredictionRecord(self.tax)  # persistent across records

        q: "Queue" = Queue(maxsize=2)

        def producer():
            batch: List[list] = []
            try:
                for rset in recordsets:
                    batch.append(rset)
                    if len(batch) >= self.macro_batch:
                        q.put(batch)
                        batch = []
                if batch:
                    q.put(batch)
                q.put(None)
            except BaseException as e:  # propagate parse errors to consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        class _Entry:
            __slots__ = ("gen", "fut", "tasks")

            def __init__(self, gen):
                self.gen = gen
                self.fut = None
                self.tasks = None

        def _advance(e: "_Entry") -> bool:
            """Send the finished round's values into the generator and run
            its host work up to the next device round (or completion).
            Returns True while the entry still has device work in flight."""
            values = e.fut.result() if e.fut is not None else None
            e.fut = None
            try:
                finish = e.gen.send(values) if values is not None else next(e.gen)
            except StopIteration as stop:
                e.tasks = stop.value
                return False
            e.fut = waiter.submit(finish)
            return True

        active: "deque[_Entry]" = deque()
        with ThreadPoolExecutor(1) as waiter:
            done = False
            while not done or active:
                # emit leading completed batches (input order)
                while active and active[0].tasks is not None:
                    self._emit(active.popleft().tasks, prec, out)
                # admit the next batch when there is pipeline room
                if not done and len(active) < 2:
                    item = q.get()
                    if item is None:
                        done = True
                    elif isinstance(item, BaseException):
                        raise item
                    else:
                        e = _Entry(self._stages(item))
                        if _advance(e):  # prepare + dispatch round 0
                            active.append(e)
                        else:  # degenerate batch: no device rounds
                            self._emit(e.tasks, prec, out)
                    continue
                # advance an entry whose device round has landed; if none,
                # block on the oldest in-flight one (emission order anyway)
                in_flight = [e for e in active if e.fut is not None]
                if not in_flight:
                    continue  # completed entries emit at loop top
                target = next((e for e in in_flight if e.fut.done()),
                              in_flight[0])
                _advance(target)
        t.join()

    def _emit(self, tasks: List[RpaTask], prec: PredictionRecord, out) -> None:
        for task in tasks:
            task.fill_prediction(prec)
            out.write(prec.print_line() + "\n")
            if self.logsink is not None and task.log_lines:
                self.logsink.write("\n".join(task.log_lines) + "\n")

    def process_batch(self, recordsets: List[list]) -> List[RpaTask]:
        """Synchronous single-batch processing (pipeline depth 1)."""
        return drive_sync(self._stages(recordsets))

    def _stages(self, recordsets: List[list]):
        """Generator over one macro-batch: yields a zero-arg device finish()
        at each align round (the driver blocks on it — possibly on a waiter
        thread — and sends the values list back in); returns the finished
        tasks.  All host work (replay, fetch, dispatch) runs on the caller's
        thread."""
        tasks = [
            RpaTask(self.tax, rs, self.exclude_factor, self.toppercent)
            for rs in recordsets
        ]
        if self.logsink is not None:
            for t in tasks:
                t.logging = True
        caches = [
            SegmentCache(t, self.query_store, self.db_store, self.protein)
            for t in tasks
        ]
        pair_caches: List[Dict[PairKey, AlignValue]] = [dict() for _ in tasks]
        m = self.metrics
        m.record_sets += len(tasks)

        with m.stage("replay"):
            reqs = [t.prepare() for t in tasks]
        yield from self._align_round(tasks, caches, pair_caches, reqs)
        merged_by_task: Dict[int, dict] = {}
        if self.mesh_backend is not None:
            with m.stage("merge"):
                merged_by_task = self._pass0_collective_merge(tasks, pair_caches)
        # replay passes run batched through the native dispatcher (one C
        # call per pass per macro-batch, models/replay_dispatch.py); tasks
        # that must stay on the Python replay (decision logging, mesh
        # merge, library unavailable) fall back inside it per task
        from ..models import replay_dispatch as rd

        with m.stage("replay"):
            reqs = rd.run_pass0(tasks, pair_caches, merged_by_task)
        yield from self._align_round(tasks, caches, pair_caches, reqs)
        with m.stage("replay"):
            reqs = rd.run_pass1(tasks, pair_caches)
        yield from self._align_round(tasks, caches, pair_caches, reqs)
        with m.stage("replay"):
            rd.run_pass2(tasks, pair_caches)
        m.pairs = self.aligner.pairs_aligned
        return tasks

    def _align_round(self, tasks, caches, pair_caches, reqs_per_task):
        """Sub-generator: fetch + dispatch this round's new pairs, yield the
        aligner's deferred finish() (the driver sends the values back), then
        fill the pair caches."""
        flat: List[Tuple[int, PairKey]] = []
        for ti, reqs in enumerate(reqs_per_task):
            seen = pair_caches[ti]
            for key in reqs:
                if key not in seen:
                    seen[key] = None  # reserve to dedupe within the round
                    flat.append((ti, key))
        if not flat:
            return
        with self.metrics.stage("fetch"):
            self._prefetch_segments(caches, flat)
            pairs = [caches[ti].pair_sequences(key) for ti, key in flat]
        shard_ids = None
        if self.mesh_backend is not None and self.mesh_backend.tp > 1:
            # route each pair to the tp column owning its reference sequence
            # (same stable hash that shards the refpack on disk)
            from ..parallel.refpack import refpack_shard_of

            tp = self.mesh_backend.tp
            shard_ids = [
                refpack_shard_of(
                    tasks[ti].records[key[1]].reference_identifier, tp
                )
                for ti, key in flat
            ]
        with self.metrics.stage("align"):
            if getattr(self.aligner, "supports_deferred", False):
                finish = self.aligner.align_pairs(
                    pairs, shard_ids=shard_ids, deferred=True
                )
            else:  # test stubs / simple aligners: resolve inline
                vals = self.aligner.align_pairs(pairs, shard_ids=shard_ids)
                finish = lambda: vals  # noqa: E731
        if self.logsink is not None and self.protein:
            # protein -l streams the SeqAn alignment art per +ALN line;
            # stash each logged pair's code arrays on its task (mirror
            # keys store the SWAPPED orientation: the reference re-aligns
            # (seg_i, seg_anchor) fresh at each site, so art must render
            # in the looked-up order, not the computed one)
            for (ti, key), pr in zip(flat, pairs):
                t = tasks[ti]
                if t.art_seqs is None:
                    t.art_seqs = {}
                t.art_seqs[key] = pr
                if key[0] == "s":
                    t.art_seqs.setdefault(
                        (key[0], key[2], key[1]), (pr[1], pr[0])
                    )
        values = yield finish
        for (ti, key), val in zip(flat, values):
            pair_caches[ti][key] = val
            if key[0] == "s":
                # AlignValue is symmetric in the pair (edit distance and the
                # normalized protein distance/similarity are both invariant
                # under operand swap), so one computation serves both key
                # orders — replay passes look pairs up in anchor order
                pair_caches[ti].setdefault((key[0], key[2], key[1]), val)

    def _pass0_collective_merge(self, tasks, pair_caches) -> Dict[int, dict]:
        """Assemble the per-record candidate tables (sharded over tp by the
        refpack hash) and run the collective pass-0 merge; returns per-task
        merged reductions keyed by task index (see MeshEngineBackend)."""
        from ..parallel.refpack import refpack_shard_of

        live = [(ti, t) for ti, t in enumerate(tasks) if t.result is None]
        if not live:
            return {}
        tp = self.mesh_backend.tp
        per_shard: List[List[tuple]] = [[] for _ in range(tp)]
        for seg, (ti, t) in enumerate(live):
            # vectorized table (models/rpa.py pass0_table_arrays): the
            # per-record Python loop here was 17-20% of mesh engine time
            dists, sims, nodes = t.pass0_table_arrays(pair_caches[ti])
            scores32 = t._native_arrays()[0].astype(np.float32)
            shards = [
                refpack_shard_of(rec.reference_identifier, tp)
                for rec in t.records
            ]
            for i, sh in enumerate(shards):
                per_shard[sh].append(
                    (seg, dists[i], sims[i], scores32[i], i, int(nodes[i]))
                )
        out = self.mesh_backend.pass0_merge(per_shard, len(live))
        return {
            ti: {k: v[seg] for k, v in out.items()}
            for seg, (ti, _) in enumerate(live)
        }

    def _prefetch_segments(self, caches, flat) -> None:
        """Batch all missing reference-segment fetches of this round through
        the store's native batched fetcher when available."""
        if not hasattr(self.db_store, "fetch_encode_batch"):
            return
        specs = []
        owners: List[Tuple[int, int]] = []
        seen = set()
        for ti, (kind, i, j) in flat:
            segs = caches[ti]._segments
            if i not in segs:
                k = (ti, i)
                if k not in seen:
                    seen.add(k)
                    specs.append(caches[ti].segment_spec(i))
                    owners.append(k)
            if kind == "s" and j not in segs:
                k = (ti, j)
                if k not in seen:
                    seen.add(k)
                    specs.append(caches[ti].segment_spec(j))
                    owners.append(k)
        if not specs:
            return
        arrays = self.db_store.fetch_encode_batch(specs, protein=self.protein)
        for (ti, i), arr in zip(owners, arrays):
            caches[ti]._segments[i] = arr
