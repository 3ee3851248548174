"""Multi-chip sharding for the classification engine.

The reference scales by file splitting + GNU parallel (reference: README.md
FAQ#9-10, extended/bin/lastal-parallel) — process-level data parallelism
with no communication.  The TPU-native design makes both axes first class:

  dp  (query/data parallel)   — record-set batches shard over mesh axis
                                "dp"; no cross-talk.
  tp  (refpack parallel)      — candidate segments shard over mesh axis
                                "tp" (the model-parallel analog: each shard
                                holds part of the refpack); per-shard
                                distances merge with collectives before
                                placement.

The collective merge implements the reference's sequential reductions:
  * best-candidate selection with the (distance asc, similarity desc,
    score desc, input order asc) tie-break
    (taxonpredictionmodelsequence.hh:542-546) via a packed key pmin;
  * LCA over candidate taxa as pmin/pmax over ancestor-path columns — the
    LCA of a set is the deepest depth at which min(path) == max(path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental
    import functools as _functools

    # disable varying-manual-axes checking (same semantics as the old
    # check_rep=False): the kernel scans carry unsharded initial values
    shard_map = _functools.partial(jax.shard_map, check_vma=False)
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.dna_align import _edit_distance_kernel


def make_mesh(
    n_devices: Optional[int] = None, tp: Optional[int] = None, devices=None
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _pairwise_distances(queries, refs, q_len, r_len):
    """queries [b, L], refs [b, s, L] -> distances [b, s] (int32)."""
    b, s, L = refs.shape
    a = jnp.repeat(queries, s, axis=0)  # [b*s, L]
    al = jnp.repeat(q_len, s, axis=0)
    rv = refs.reshape(b * s, L)
    rl = r_len.reshape(b * s)
    a_ext = jnp.concatenate([jnp.zeros((b * s, 1), jnp.int32), a.astype(jnp.int32)], axis=1)
    rb = jnp.flip(rv, axis=1).astype(jnp.int32)
    pad = jnp.full((b * s, L + 1), 255, jnp.int32)
    rbp = jnp.concatenate([pad, rb, pad], axis=1)
    dist = _edit_distance_kernel(a_ext, rbp, al.astype(jnp.int32), rl.astype(jnp.int32))
    return dist.reshape(b, s)


def distributed_classify_step(mesh: Mesh, path_matrix: np.ndarray):
    """Builds the jitted multi-chip classification step.

    Inputs (global shapes):
      queries  [B, L]    uint8 codes, sharded P("dp", None)
      q_len    [B]       int32,       sharded P("dp")
      refs     [B, S, L] uint8 codes, sharded P("dp", "tp", None)
      r_len    [B, S]    int32,       sharded P("dp", "tp")
      r_node   [B, S]    int32 taxon indices, sharded P("dp", "tp")
      r_ident  [B, S]    int32 search identities, sharded P("dp", "tp")

    Returns per query: best distance, best (global) candidate slot, and the
    LCA over candidates within the best distance — computed with pmin/pmax
    collectives over the refpack axis.
    """
    paths = jnp.asarray(path_matrix, dtype=jnp.int32)  # [n_nodes, D]
    D = paths.shape[1]

    def local_step(queries, q_len, refs, r_len, r_node, r_ident):
        b, s, L = refs.shape
        dist = _pairwise_distances(queries, refs, q_len, r_len)  # [b, s]

        # ---- best candidate: staged collective reductions implementing the
        # (distance asc, identities desc, slot asc) tie-break
        tp_idx = jax.lax.axis_index("tp")
        slot = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1) + tp_idx * s
        big = jnp.int32(1 << 30)
        best_dist = jax.lax.pmin(jnp.min(dist, axis=1), "tp")  # [b]
        m1 = dist == best_dist[:, None]
        best_ident = jax.lax.pmax(
            jnp.max(jnp.where(m1, r_ident, -1), axis=1), "tp"
        )
        m2 = m1 & (r_ident == best_ident[:, None])
        best_slot = jax.lax.pmin(
            jnp.min(jnp.where(m2, slot, big), axis=1), "tp"
        )

        # ---- LCA over candidates with dist <= best_dist (co-optimal set)
        cand_paths = paths[r_node]  # [b, s, D]
        mask = (dist <= best_dist[:, None])[..., None]  # [b, s, 1]
        big = jnp.int32(1 << 30)
        pmin_local = jnp.min(jnp.where(mask, cand_paths, big), axis=1)  # [b, D]
        pmax_local = jnp.max(jnp.where(mask, cand_paths, -1), axis=1)
        pmin_all = jax.lax.pmin(pmin_local, "tp")
        pmax_all = jax.lax.pmax(pmax_local, "tp")
        agree = (pmin_all == pmax_all) & (pmin_all >= 0)
        lca_d = jnp.cumprod(agree, axis=1).sum(axis=1) - 1
        lca = jnp.take_along_axis(pmin_all, lca_d[:, None], axis=1)[:, 0]
        return best_dist, best_slot, lca

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("dp"),
            P("dp", "tp", None),
            P("dp", "tp"),
            P("dp", "tp"),
            P("dp", "tp"),
        ),
        out_specs=(P("dp"), P("dp"), P("dp")),
    )
    return jax.jit(sharded)


def dryrun_step(mesh: Mesh, path_matrix: np.ndarray, B=None, S=None, L=32):
    """Run one tiny distributed classification step on the given mesh."""
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    B = B or dp * 2
    S = S or tp * 2
    rng = np.random.RandomState(0)
    queries = rng.randint(0, 4, (B, L)).astype(np.uint8)
    q_len = np.full(B, L, np.int32)
    refs = rng.randint(0, 4, (B, S, L)).astype(np.uint8)
    r_len = np.full((B, S), L, np.int32)
    n_nodes = path_matrix.shape[0]
    r_node = rng.randint(0, n_nodes, (B, S)).astype(np.int32)
    r_ident = rng.randint(1, L, (B, S)).astype(np.int32)

    step = distributed_classify_step(mesh, path_matrix)
    # pin inputs to the mesh's devices explicitly: the process default
    # backend may be a different platform (e.g. the single TPU chip while
    # the mesh is the virtual CPU mesh)
    from jax.sharding import NamedSharding

    specs = (
        P("dp", None),
        P("dp"),
        P("dp", "tp", None),
        P("dp", "tp"),
        P("dp", "tp"),
        P("dp", "tp"),
    )
    args = [
        jax.device_put(a, NamedSharding(mesh, s))
        for a, s in zip((queries, q_len, refs, r_len, r_node, r_ident), specs)
    ]
    with mesh:
        best_dist, best_slot, lca = step(*args)
    return (
        np.asarray(best_dist),
        np.asarray(best_slot),
        np.asarray(lca),
        dict(queries=queries, q_len=q_len, refs=refs, r_len=r_len, r_node=r_node, r_ident=r_ident),
    )
