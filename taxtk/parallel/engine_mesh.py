"""Collective pass-0 merge for the dp×tp mesh RPA engine.

This is the production integration of the dp×tp mesh into `RpaEngine` (the
round-1 `mesh.py` demo step, now load-bearing).  The division of labor:

1. **Alignment rounds** need no collectives — every pair's distance is
   disjoint — so they run as independent per-device programs through the
   FULL single-chip production dispatch (bucket ladder, 2-bit wire,
   device-built peq, per-device pool cache): see
   ``BatchAligner._dispatch_mesh`` (engine/aligner.py), which routes each
   pair to the tp column owning its reference sequence
   (``refpack_shard_of``, the same stable hash that shards the refpack
   itself) and round-robins over dp rows within the column.

2. **Pass-0 collective merge** — the reference reduces pass-0 candidates
   sequentially: the best candidate under the (distance asc, similarity
   desc, score desc, input order asc) tie-break
   (reference: taxonpredictionmodelsequence.hh:542-546), the LCA over
   co-optimal references (:553-562 → ``rtax``), the LCA over all reference
   nodes and the max support (:547-549).  Here the per-record tables live
   sharded over the mesh (records on their refpack shard's tp column, and
   over dp within a column) and the reductions run as *collectives*:
   staged ``pmin``/``pmax`` over both mesh axes for the lexicographic
   tie-break, and pmin/pmax over ancestor-path-matrix columns for the
   set-LCAs (the LCA of a set is the deepest depth where min(path) ==
   max(path)).  The host replay consumes these merged values — the device
   is authoritative for the pass-0 reductions.

All reductions are exact (f32 equality on the identical values the host
would compare; edit distances are integers), so the engine's GFF3 output is
byte-identical to the single-device run — tested on the virtual 8-device
mesh at tp=2 and tp=4 (tests/test_engine_mesh.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 promotes shard_map out of experimental
    shard_map = functools.partial(jax.shard_map, check_vma=False)
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

FLT_MAX = np.float32(np.finfo(np.float32).max)
_BIG_I32 = np.int32(1 << 30)


def _pow2ceil(x: int, minimum: int = 1) -> int:
    n = minimum
    while n < x:
        n <<= 1
    return n


class MeshEngineBackend:
    """Holds the mesh, the device-resident taxonomy path matrix, and the
    compiled sharded steps (cached per launch shape)."""

    def __init__(self, mesh: Mesh, path_matrix: np.ndarray):
        self.mesh = mesh
        self.dp = int(mesh.shape["dp"])
        self.tp = int(mesh.shape["tp"])
        self._paths_host = np.asarray(path_matrix, np.int32)
        self._paths_dev = None  # replicated device copy, lazily placed
        self._merge_cache: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------ util
    def _put(self, arr, spec):
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _paths(self):
        if self._paths_dev is None:
            self._paths_dev = self._put(self._paths_host, P(None, None))
        return self._paths_dev

    # ------------------------------------------------------- pass-0 merge step
    def _merge_step(self, Tp: int, Rp: int):
        key = (Tp, Rp)
        fn = self._merge_cache.get(key)
        if fn is not None:
            return fn

        T1 = Tp + 1  # segment Tp collects padding rows and is dropped
        axes = ("tp", "dp")
        big = jnp.int32(_BIG_I32)
        neg = -jnp.float32(FLT_MAX)

        def local(paths, dist, sim, score, slot, node, task):
            dist = dist.reshape(-1)
            sim = sim.reshape(-1)
            score = score.reshape(-1)
            slot = slot.reshape(-1)
            node = node.reshape(-1)
            seg = task.reshape(-1)

            smin = functools.partial(jax.ops.segment_min, num_segments=T1)
            smax = functools.partial(jax.ops.segment_max, num_segments=T1)

            # staged lexicographic tie-break (dist asc, sim desc, score desc,
            # slot asc) — reference taxonpredictionmodelsequence.hh:542-546
            d_best = jax.lax.pmin(smin(dist, seg), axes)
            m1 = dist == d_best[seg]
            s_best = jax.lax.pmax(smax(jnp.where(m1, sim, -1.0), seg), axes)
            m2 = m1 & (sim == s_best[seg])
            sc_best = jax.lax.pmax(smax(jnp.where(m2, score, neg), seg), axes)
            m3 = m2 & (score == sc_best[seg])
            slot_best = jax.lax.pmin(smin(jnp.where(m3, slot, big), seg), axes)

            p = paths[node]  # [r, D]

            def lca_over(mask):
                pmin_t = jax.lax.pmin(
                    smin(jnp.where(mask[:, None], p, big), seg), axes
                )
                pmax_t = jax.lax.pmax(
                    smax(jnp.where(mask[:, None], p, -1), seg), axes
                )
                agree = (pmin_t == pmax_t) & (pmin_t >= 0)
                lca_d = jnp.maximum(
                    jnp.cumprod(agree, axis=1).sum(axis=1) - 1, 0
                )
                return jnp.take_along_axis(pmin_t, lca_d[:, None], axis=1)[:, 0]

            rtax = lca_over(m3)  # LCA over co-optimal refs (:553-562)
            valid = seg < Tp
            allnodes = lca_over(valid)  # LCA over all reference nodes (:548)
            support = jax.lax.pmax(  # max int-truncated similarity (:547)
                smax(
                    jnp.where(valid, jnp.floor(sim).astype(jnp.int32), -1), seg
                ),
                axes,
            )
            return d_best, s_best, sc_best, slot_best, rtax, allnodes, support

        fn = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(
                    P(None, None),  # paths: replicated
                    P("tp", "dp"),
                    P("tp", "dp"),
                    P("tp", "dp"),
                    P("tp", "dp"),
                    P("tp", "dp"),
                    P("tp", "dp"),
                ),
                out_specs=(P(None),) * 7,
            )
        )
        self._merge_cache[key] = fn
        return fn

    def pass0_merge(
        self, per_shard_rows: Sequence[List[tuple]], T: int
    ) -> Dict[str, np.ndarray]:
        """per_shard_rows[t] = rows (seg, dist, sim, score, slot, node) of
        the candidate records living on tp shard t; seg in [0, T).
        Returns per-task arrays (sliced to T): best_dist/best_sim/best_score,
        best_slot, rtax, lca_allnodes, support."""
        tp, dp = self.tp, self.dp
        assert len(per_shard_rows) == tp
        Tp = _pow2ceil(max(T, 1))
        Rp = _pow2ceil(max(max((len(r) for r in per_shard_rows), default=1), 1))
        Rp = max(Rp, dp)
        if Rp % dp:
            Rp = -(-Rp // dp) * dp

        dist = np.full((tp, Rp), FLT_MAX, np.float32)
        sim = np.full((tp, Rp), -1.0, np.float32)
        score = np.full((tp, Rp), -FLT_MAX, np.float32)
        slot = np.full((tp, Rp), _BIG_I32, np.int32)
        node = np.zeros((tp, Rp), np.int32)
        task = np.full((tp, Rp), Tp, np.int32)  # padding -> dummy segment
        for t, rows in enumerate(per_shard_rows):
            for j, (seg, d, s, sc, sl, nd) in enumerate(rows):
                dist[t, j] = d
                sim[t, j] = s
                score[t, j] = sc
                slot[t, j] = sl
                node[t, j] = nd
                task[t, j] = seg

        step = self._merge_step(Tp, Rp)
        outs = step(
            self._paths(),
            self._put(dist, P("tp", "dp")),
            self._put(sim, P("tp", "dp")),
            self._put(score, P("tp", "dp")),
            self._put(slot, P("tp", "dp")),
            self._put(node, P("tp", "dp")),
            self._put(task, P("tp", "dp")),
        )
        d, s, sc, sl, rtax, alln, sup = (np.asarray(o)[:T] for o in outs)
        return dict(
            best_dist=d,
            best_sim=s,
            best_score=sc,
            best_slot=sl,
            rtax=rtax,
            lca_allnodes=alln,
            support=sup,
        )
