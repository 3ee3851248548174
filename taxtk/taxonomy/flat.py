"""Flattened NCBI taxonomy: arrays instead of pointer trees.

The reference stores the taxonomy as an n-ary pointer tree with nested-set
annotations and answers LCA/parent queries by pointer chasing
(reference: core/src/taxontree.hh:46-224, core/src/taxonomyinterface.cpp).
A TPU-native design wants the taxonomy as dense arrays so that LCA, path
support scoring and rank lookups become vectorized gathers/reductions over
index arrays — computable for whole batches at once, on host (NumPy) or on
device (jnp, the arrays are directly device-puttable).

Per-node arrays (node index is a dense int, root = 0):
  parent[i]        parent node index (root points to itself)
  depth[i]         root-path length (reference: Taxon::root_pathlength)
  left[i]/right[i] nested-set interval (reference: Taxon::leftvalue/rightvalue)
                   -> isParentOf(A,B) is two comparisons, vectorized
  rank_id[i]       index into the interned rank string table
  unclassified[i]  name or ancestor name contains "unclassified"
                   (reference: ncbidata.cpp:119-126)

Derived on demand:
  path[i, d]       ancestor of i at depth d (or -1) -> O(1) vectorized LCA by
                   first-divergence position (replaces pointer walk in
                   reference taxonomyinterface.cpp:67-77)

Behavioural parity notes:
  * `prune_to_marked_ranks` mirrors deleteUnmarkedNodes + recalcDistToRoot
    (reference: taxontree.cpp:55-70): unmarked nodes are removed with
    children reparented, and *their taxids become unknown* to getNode.
  * is_unclassified propagates root-down during construction exactly like
    the reference DFS (ncbidata.cpp:119-126).
"""

from __future__ import annotations

import gzip
import io
import os
import sys
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from ..constants import DEFAULT_RANKS, ENVVAR_TAXONOMY_NCBI
from ..utils.errors import TaxonNotFound, FileError


def _open_maybe_gzip(path: str):
    # transparent gzip like the reference's zstr streams (ncbidata.cpp:41,58)
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, "r", encoding="utf-8")


@dataclass
class FlatTaxonomy:
    parent: np.ndarray
    depth: np.ndarray
    left: np.ndarray
    right: np.ndarray
    rank_id: np.ndarray
    unclassified: np.ndarray
    taxids: List[str]
    names: List[str]
    ranks: List[str]  # interned rank table
    taxid2idx: Dict[str, int]
    max_depth: int
    version: str = ""
    # lazily built ancestor-path matrix [n, max_depth+1]
    _path: Optional[np.ndarray] = field(default=None, repr=False)
    # first_child/next_sibling arrays for tree walks (lazily built)
    _children: Optional[List[np.ndarray]] = field(default=None, repr=False)

    # ------------------------------------------------------------------ basics
    @property
    def size(self) -> int:
        return len(self.taxids)

    ROOT = 0

    def node(self, taxid: str) -> int:
        """taxid string -> node index; raises like reference getNode
        (taxonomyinterface.cpp:8-12)."""
        try:
            return self.taxid2idx[taxid]
        except KeyError:
            raise TaxonNotFound("taxon not found", taxid=taxid) from None

    def has_taxid(self, taxid: str) -> bool:
        return taxid in self.taxid2idx

    def name_of(self, idx) -> str:
        return self.names[int(idx)]

    def rank_of(self, idx) -> str:
        return self.ranks[int(self.rank_id[int(idx)])]

    def taxid_of(self, idx) -> str:
        return self.taxids[int(idx)]

    def rank_index(self, rankname: str) -> int:
        """Index of an interned rank, -1 if unknown (reference
        getRankInternal returns the empty string then)."""
        try:
            return self.ranks.index(rankname)
        except ValueError:
            return -1

    # ------------------------------------------------------- vectorized queries
    def is_parent_of(self, a, b):
        """True where node a is a strict ancestor of node b; vectorized.
        (reference: taxonomyinterface.cpp:52-55 — two comparisons)"""
        a = np.asarray(a)
        b = np.asarray(b)
        return (self.right[a] > self.left[b]) & (self.left[a] < self.left[b])

    @property
    def path(self) -> np.ndarray:
        """Ancestor-path matrix path[i, d] = ancestor of i at depth d, -1 beyond."""
        if self._path is None:
            n = self.size
            D = int(self.max_depth) + 1
            path = np.full((n, D), -1, dtype=np.int32)
            idx = np.arange(n, dtype=np.int32)
            path[idx, self.depth] = idx
            # fill upwards: level-by-level copy from parents
            order = np.argsort(self.depth, kind="stable")
            depths = self.depth[order]
            for d in range(1, D):
                nodes = order[depths == d]
                if nodes.size:
                    path[nodes, :d] = path[self.parent[nodes], :d]
            self._path = path
        return self._path

    def lca(self, a, b):
        """Vectorized LCA via first divergence of ancestor paths.
        Replaces the reference's nested-set pointer walk
        (taxonomyinterface.cpp:67-77) with a dense scan that batches."""
        p = self.path
        pa = p[np.asarray(a)]
        pb = p[np.asarray(b)]
        eq = (pa == pb) & (pa >= 0)
        # deepest d such that all of eq[..., :d+1] holds
        lca_d = np.cumprod(eq, axis=-1).sum(axis=-1) - 1
        return np.take_along_axis(pa, lca_d[..., None], axis=-1)[..., 0]

    def lca_scalar(self, a: int, b: int) -> int:
        """Scalar LCA via the nested-set parent walk (the reference's own
        algorithm, taxonomyinterface.cpp:67-77) on plain Python ints —
        ~50x faster than the vectorized path for single pairs.  Memoized:
        the RPA replay asks for the same node pairs constantly (bounded to
        1M entries as a runaway guard)."""
        cache = getattr(self, "_lca_cache", None)
        if cache is None:
            cache = self._lca_cache = {}
        key = (a, b)
        v = cache.get(key)
        if v is not None:
            return v
        left, right, parent = self._py_lists()
        left_min = min(left[a], right[b])
        right_max = max(right[a], right[b])
        n = a
        while left[n] > left_min or right[n] < right_max:
            n = parent[n]
        if len(cache) < 1_000_000:
            cache[key] = n
        return n

    def _py_lists(self):
        lists = getattr(self, "_py", None)
        if lists is None:
            lists = (
                self.left.tolist(),
                self.right.tolist(),
                self.parent.tolist(),
            )
            self._py = lists
        return lists

    def lca_reduce(self, nodes) -> int:
        """LCA of a set of nodes (reference: taxonomyinterface.hh:62-74)."""
        nodes = np.asarray(nodes, dtype=np.int64)
        if nodes.size == 0:
            raise ValueError("lca_reduce of empty node set")
        p = self.path[nodes]
        eq = np.all((p == p[0]) & (p >= 0), axis=0)
        lca_d = int(np.cumprod(eq).sum()) - 1
        return int(p[0, lca_d])

    def lcc(self, a: int, b: int) -> int:
        """Lowest common concept (reference: taxonomyinterface.cpp:89-97):
        if one contains the other return the lower one, else the LCA."""
        if self.is_parent_of(b, a):
            return int(a)
        if self.is_parent_of(a, b):
            return int(b)
        return int(self.lca(a, b))

    def lcc_reduce(self, nodes) -> int:
        """Reference container LCC (taxonomyinterface.hh:78-95): start with the
        deepest node (last max wins), fold getLCC over the container."""
        nodes = list(int(x) for x in nodes)
        if not nodes:
            raise ValueError("lcc_reduce of empty node set")
        lowest = nodes[0]
        for n in nodes:
            if self.depth[n] >= self.depth[lowest]:
                lowest = n
        acc = lowest
        for n in nodes:
            acc = self.lcc(acc, n)
        return acc

    def path_length(self, a: int, b: int):
        """(steps from B down to LCA-side, steps from A) — reference
        getPathLength semantics (taxonomyinterface.cpp:109-123)."""
        a, b = int(a), int(b)
        if a == b:
            return (0, 0)
        if self.is_parent_of(a, b):
            return (int(self.depth[b]) - int(self.depth[a]), 0)
        if self.is_parent_of(b, a):
            return (0, int(self.depth[a]) - int(self.depth[b]))
        lca = int(self.lca(a, b))
        return (
            int(self.depth[b]) - int(self.depth[lca]),
            int(self.depth[a]) - int(self.depth[lca]),
        )

    def inter_distances(self, a: int, b: int):
        """(dist A->LCA, LCA depth, dist B->LCA) — reference
        getInterDistances (taxonomyinterface.cpp:135-149)."""
        a, b = int(a), int(b)
        if a == b:
            return (0, int(self.depth[a]), 0)
        if self.is_parent_of(b, a):
            return (int(self.depth[a]) - int(self.depth[b]), int(self.depth[b]), 0)
        if self.is_parent_of(a, b):
            return (0, int(self.depth[a]), int(self.depth[b]) - int(self.depth[a]))
        lca = int(self.lca(a, b))
        return (
            int(self.depth[a]) - int(self.depth[lca]),
            int(self.depth[lca]),
            int(self.depth[b]) - int(self.depth[lca]),
        )

    def name_at_rank(self, idx: int, rank: str) -> str:
        """Name of the ancestor at the given rank, or the root's name
        (reference: taxonomyinterface.cpp:174-189)."""
        node = int(idx)
        while node != self.ROOT:
            if self.rank_of(node) == rank:
                return self.name_of(node)
            node = int(self.parent[node])
        return self.name_of(node)

    def map_unclassified(self, idx: int) -> int:
        """Walk up until a classified node (taxonomyinterface.cpp:193-197)."""
        idx = int(idx)
        while self.unclassified[idx] and idx != self.ROOT:
            idx = int(self.parent[idx])
        return idx

    def iclca_reduce(self, nodes) -> int:
        """getICLCA (taxonomyinterface.hh:100-109): map unclassified nodes up,
        dedupe, then LCC-reduce."""
        mapped = sorted({self.map_unclassified(n) for n in nodes})
        return self.lcc_reduce(mapped)

    def ancestor_at_depth(self, idx, d):
        """Vectorized: ancestor of node(s) idx at depth d (or -1)."""
        return self.path[np.asarray(idx), np.asarray(d)]

    def path_up(self, idx: int) -> List[int]:
        """Node chain idx -> root inclusive (reference PathUpIterator)."""
        out = [int(idx)]
        while out[-1] != self.ROOT:
            out.append(int(self.parent[out[-1]]))
        return out

    def path_down(self, idx: int, start: int = ROOT) -> List[int]:
        """Node chain start -> idx inclusive (reference CPathDownIterator)."""
        p = self.path[int(idx)]
        d0 = int(self.depth[int(start)])
        return [int(x) for x in p[d0 : int(self.depth[int(idx)]) + 1]]

    def is_leaf(self, idx: int) -> bool:
        # leaf <=> nested-set interval spans no other node
        return bool(self.right[int(idx)] == self.left[int(idx)] + 1)

    # ------------------------------------------------------------ tree editing
    def prune_to_marked_ranks(self, ranks: Sequence[str]) -> "FlatTaxonomy":
        """Collapse the taxonomy to nodes whose rank is in `ranks` (+ root).

        Mirrors deleteUnmarkedNodes + recalcDistToRoot
        (reference: taxontree.cpp:55-70): children are reparented to the
        nearest kept ancestor, depths shrink to pruned-tree distances, and the
        taxids of removed nodes are forgotten (getNode will raise).
        """
        rankset = set(ranks)
        keep = np.zeros(self.size, dtype=bool)
        keep[self.ROOT] = True
        kept_rank_ids = {i for i, r in enumerate(self.ranks) if r in rankset}
        if kept_rank_ids:
            keep |= np.isin(self.rank_id, np.fromiter(kept_rank_ids, dtype=np.int64))

        # nearest kept ancestor by pointer jumping
        new_parent = self.parent.copy()
        for _ in range(int(self.max_depth) + 2):
            bad = ~keep[new_parent]
            if not bad.any():
                break
            new_parent[bad] = self.parent[new_parent[bad]]

        kept_idx = np.flatnonzero(keep)
        remap = np.full(self.size, -1, dtype=np.int64)
        remap[kept_idx] = np.arange(kept_idx.size)

        parent2 = remap[new_parent[kept_idx]].astype(np.int32)
        # depths in the pruned tree: process in old-depth order so parents first
        depth2 = np.zeros(kept_idx.size, dtype=np.int32)
        order = np.argsort(self.depth[kept_idx], kind="stable")
        for j in order:
            if kept_idx[j] != self.ROOT:
                depth2[j] = depth2[parent2[j]] + 1

        left2, right2 = _nested_set(parent2, depth2)

        taxids2 = [self.taxids[i] for i in kept_idx]
        return FlatTaxonomy(
            parent=parent2,
            depth=depth2.astype(np.uint8),
            left=left2,
            right=right2,
            rank_id=self.rank_id[kept_idx].copy(),
            unclassified=self.unclassified[kept_idx].copy(),
            taxids=taxids2,
            names=[self.names[i] for i in kept_idx],
            ranks=list(self.ranks),
            taxid2idx={t: j for j, t in enumerate(taxids2)},
            max_depth=int(depth2.max(initial=0)),
            version=self.version,
        )

    def set_rank_distances(self, ranklist: Sequence[str]) -> None:
        """Normalize depths so a node with rank ranklist[k] sits at depth k+1,
        inserting virtual depth for skipped ranks.

        Functional equivalent of the reference's running-index walk
        (taxontree.cpp:74-144): nodes sharing their parent's rank (buggy NCBI
        dumps) inherit the parent's depth.
        """
        pos = {r: k for k, r in enumerate(ranklist)}
        order = np.argsort(self.depth, kind="stable")
        depth = self.depth.astype(np.int32).copy()
        for i in order:
            i = int(i)
            if i == self.ROOT:
                depth[i] = 0
                continue
            p = int(self.parent[i])
            if self.rank_id[i] == self.rank_id[p]:
                depth[i] = depth[p]
                continue
            k = pos.get(self.rank_of(i))
            if k is not None:
                depth[i] = k + 1
            else:
                depth[i] = depth[p] + 1
        self.depth = depth.astype(np.uint8)
        self.max_depth = int(depth.max(initial=0))
        self._path = None


def _nested_set(parent: np.ndarray, depth: np.ndarray):
    """Compute nested-set left/right values via an iterative DFS over the
    parent array (children visited in index order)."""
    n = parent.shape[0]
    children: List[List[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        children[int(parent[i])].append(i)
    left = np.zeros(n, dtype=np.int64)
    right = np.zeros(n, dtype=np.int64)
    counter = 0
    # iterative DFS
    stack = [(0, False)]
    while stack:
        node, done = stack.pop()
        if done:
            counter += 1
            right[node] = counter
        else:
            counter += 1
            left[node] = counter
            stack.append((node, True))
            for c in reversed(children[node]):
                stack.append((c, False))
    return left, right


def parse_ncbi_flat_files(
    nodes_filename: str,
    names_filename: str,
    version: str = "",
    ranks_to_mark: Optional[Sequence[str]] = None,
) -> FlatTaxonomy:
    """Parse NCBI nodes.dmp/names.dmp (optionally .gz) into a FlatTaxonomy.

    Mirrors reference parseNCBIFlatFiles (ncbidata.cpp:17-167): tree rooted at
    taxid "1", is_unclassified propagation, rank interning.  The interned rank
    table always contains "" (rank-not-found sentinel, taxontree.hh:84).
    """
    parents_of: Dict[str, str] = {}
    rank_of: Dict[str, str] = {}
    names_of: Dict[str, str] = {}
    children: Dict[str, List[str]] = {}

    with _open_maybe_gzip(nodes_filename) as fh:
        for line in fh:
            # NCBI row format: taxid\t|\tparent\t|\trank\t|\t...
            fields = line.split("\t|\t", 3)
            if len(fields) < 3:
                continue
            taxid, parent_taxid, rank = fields[0], fields[1], fields[2]
            parents_of[taxid] = parent_taxid
            rank_of[taxid] = rank
            children.setdefault(parent_taxid, []).append(taxid)

    with _open_maybe_gzip(names_filename) as fh:
        for line in fh:
            fields = line.split("\t|\t", 3)
            if len(fields) >= 4 and fields[3].startswith("scientific name"):
                names_of[fields[0]] = fields[1]

    root_taxid = "1"
    if root_taxid in children:
        # remove the root self-link (ncbidata.cpp:80-85)
        children[root_taxid] = [c for c in children[root_taxid] if c != root_taxid]

    # DFS ordering (preorder) from the root
    order: List[str] = []
    parent_idx: List[int] = []
    depth_list: List[int] = []
    uncls_list: List[bool] = []
    idx_of: Dict[str, int] = {}

    stack = [(root_taxid, -1, 0, False)]
    while stack:
        taxid, pidx, d, parent_uncls = stack.pop()
        idx = len(order)
        idx_of[taxid] = idx
        order.append(taxid)
        parent_idx.append(pidx if pidx >= 0 else 0)
        depth_list.append(d)
        name = names_of.get(taxid, "")
        uncls = parent_uncls or ("unclassified" in name)
        uncls_list.append(uncls)
        for c in reversed(children.get(taxid, ())):
            stack.append((c, idx, d + 1, uncls))

    n = len(order)
    parent = np.asarray(parent_idx, dtype=np.int32)
    depth = np.asarray(depth_list, dtype=np.int32)

    ranks: List[str] = [""]
    rank_idx: Dict[str, int] = {"": 0}
    rank_id = np.zeros(n, dtype=np.int32)
    for i, taxid in enumerate(order):
        r = rank_of.get(taxid, "")
        j = rank_idx.get(r)
        if j is None:
            j = len(ranks)
            ranks.append(r)
            rank_idx[r] = j
        rank_id[i] = j

    if ranks_to_mark:
        for r in ranks_to_mark:
            if r not in rank_idx:
                rank_idx[r] = len(ranks)
                ranks.append(r)

    left, right = _nested_set(parent, depth)

    return FlatTaxonomy(
        parent=parent,
        depth=depth.astype(np.uint8) if depth.max(initial=0) < 256 else depth,
        left=left,
        right=right,
        rank_id=rank_id,
        unclassified=np.asarray(uncls_list, dtype=bool),
        taxids=order,
        names=[names_of.get(t, "") for t in order],
        ranks=ranks,
        taxid2idx=idx_of,
        max_depth=int(depth.max(initial=0)),
        version=version,
    )


def load_taxonomy_from_environment(
    ranks_to_mark: Optional[Sequence[str]] = DEFAULT_RANKS,
) -> Optional[FlatTaxonomy]:
    """Locate the NCBI dump via $TAXATORTK_TAXONOMY_NCBI and load it.

    Mirrors reference loadTaxonomyFromEnvironment (ncbidata.cpp:171-209):
    prefers .gz files, reads optional version.txt, returns None (with a
    message on stderr) when the environment is not set up.
    """
    env = os.environ.get(ENVVAR_TAXONOMY_NCBI)
    if env is None:
        print(
            "Specify the folder containing the NCBI taxonomy dump files as "
            f"{ENVVAR_TAXONOMY_NCBI} environment variable",
            file=sys.stderr,
        )
        return None

    def resolve(base: str) -> Optional[str]:
        plain = os.path.join(env, base)
        compressed = plain + ".gz"
        if os.path.exists(compressed):
            return compressed
        if os.path.exists(plain):
            return plain
        print(f' "{plain}" not found', file=sys.stderr)
        return None

    nodes = resolve("nodes.dmp")
    names = resolve("names.dmp")
    if nodes is None or names is None:
        return None

    version = ""
    version_file = os.path.join(env, "version.txt")
    if os.path.exists(version_file):
        with open(version_file) as fh:
            version = fh.readline().rstrip("\n")

    return parse_ncbi_flat_files(nodes, names, version, ranks_to_mark)
