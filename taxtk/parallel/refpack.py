"""Refpack sharding: split the reference database across hosts.

The reference scales out by replicating the whole refpack per process and
trimming it with a whitelist (`-w`, core/taxator.cpp:294) or by paging
through an on-disk `.fai` store (core/src/sequencestorage.hh:319-406).
The TPU-native analog (SURVEY §2.4) is model-parallel-style *data
placement*: the reference FASTA is partitioned across hosts by a stable
hash of the sequence identifier, each host serves segment fetches for its
local shard, and only the tiny encoded segments (not the database) travel
to the aligner.  Queries are replicated (they are the activations in this
analogy); per-candidate distances are merged by the query's owner, which
in-process is just dict insertion and across hosts rides the same
deterministic-merge machinery as query sharding
(taxtk.parallel.distributed.merge_gff3_parts).

`ShardedRefpackStore` implements the engine's store protocol
(`get_sequence` / `sequence_length` / `fetch_encode_batch`), so an engine
pointed at N shard stores needs no code changes: batched fetches are
grouped per shard — one native batched read per shard, exactly what each
host would execute locally — and reassembled in request order.
"""

from __future__ import annotations

import os
import zlib
from typing import Iterable, List, Optional, Sequence, Tuple


def refpack_shard_of(seqid: str, num_shards: int) -> int:
    """Stable shard assignment (crc32, same convention as
    taxtk.parallel.distributed.shard_of for queries)."""
    return zlib.crc32(seqid.encode()) % num_shards


def split_refpack(
    fasta_path: str,
    num_shards: int,
    outdir: str,
    mapping_path: Optional[str] = None,
) -> List[Tuple[str, Optional[str]]]:
    """Partition a refpack FASTA (and optionally its seqid→taxid mapping)
    into per-shard files `refdata.<k>.fna` / `mapping.<k>.tax`.

    Routing is by the FIRST TOKEN of the header — the identifier every
    indexed store and the alignment stream use (doc/fileformats.md:15).
    Returns [(fasta_k, mapping_k or None), ...].
    """
    os.makedirs(outdir, exist_ok=True)
    fas = [
        open(os.path.join(outdir, f"refdata.{k}.fna"), "w")
        for k in range(num_shards)
    ]
    try:
        shard = 0
        with open(fasta_path) as f:
            for line in f:
                if line.startswith(">"):
                    seqid = line[1:].split(None, 1)[0].strip()
                    shard = refpack_shard_of(seqid, num_shards)
                fas[shard].write(line)
    finally:
        for f in fas:
            f.close()

    maps: List[Optional[str]] = [None] * num_shards
    if mapping_path is not None:
        outs = [
            open(os.path.join(outdir, f"mapping.{k}.tax"), "w")
            for k in range(num_shards)
        ]
        try:
            with open(mapping_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    seqid = line.split("\t", 1)[0]
                    outs[refpack_shard_of(seqid, num_shards)].write(line)
        finally:
            for f in outs:
                f.close()
        maps = [os.path.join(outdir, f"mapping.{k}.tax") for k in range(num_shards)]
    return [
        (os.path.join(outdir, f"refdata.{k}.fna"), maps[k])
        for k in range(num_shards)
    ]


class ShardedRefpackStore:
    """Routes the engine's sequence fetches across N per-shard stores.

    Drop-in for a monolithic store: implements `sequence_length`,
    `get_sequence`, and — when every shard store has it — the native
    `fetch_encode_batch`, which it executes as one grouped batch per
    shard (the per-host local read) and reassembles in request order
    (the gather)."""

    def __init__(self, stores: Sequence):
        if not stores:
            raise ValueError("need at least one shard store")
        self.stores = list(stores)

    def _route(self, seqid: str):
        return self.stores[refpack_shard_of(seqid, len(self.stores))]

    def sequence_length(self, seqid: str) -> int:
        return self._route(seqid).sequence_length(seqid)

    def get_sequence(self, seqid: str, start: int, stop: int) -> bytes:
        return self._route(seqid).get_sequence(seqid, start, stop)

    def fetch_encode_batch(self, specs, protein: bool = False):
        n = len(self.stores)
        groups: List[List[int]] = [[] for _ in range(n)]
        for i, spec in enumerate(specs):
            groups[refpack_shard_of(spec[0], n)].append(i)
        out: List = [None] * len(specs)
        for k, idxs in enumerate(groups):
            if not idxs:
                continue
            store = self.stores[k]
            shard_specs = [specs[i] for i in idxs]
            if hasattr(store, "fetch_encode_batch"):
                arrays = store.fetch_encode_batch(shard_specs, protein=protein)
            else:
                arrays = [
                    _encode_spec(store, s, protein) for s in shard_specs
                ]
            for i, arr in zip(idxs, arrays):
                out[i] = arr
        return out


def _encode_spec(store, spec, protein: bool):
    """Scalar fallback matching IndexedFastaStore.fetch_encode_batch
    semantics for shard stores without the native batched fetcher."""
    from ..refpack.store import encode_dna, encode_protein, revcomp_dna

    seqid, start, stop, revcomp = spec
    raw = store.get_sequence(seqid, start, stop)
    codes = encode_protein(raw) if protein else encode_dna(raw)
    if revcomp and not protein:
        codes = revcomp_dna(codes)
    return codes
