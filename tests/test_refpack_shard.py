"""Refpack sharding (SURVEY §2.4 model-parallel analog): the reference
database partitioned across N per-host stores must yield byte-identical
GFF3 to the monolithic refpack — fetch routing + per-shard batched reads
+ in-order gather are exercised end-to-end through the engine."""

import io
import random

import numpy as np
import pytest

from fixture_tax import make_taxonomy
from taxtk.engine.executor import RpaEngine
from taxtk.engine.recordsets import iter_record_sets
from taxtk.formats.alignments import parse_alignment_line
from taxtk.ops import oracle
from taxtk.parallel.refpack import (
    ShardedRefpackStore,
    refpack_shard_of,
    split_refpack,
)
from taxtk.refpack.store import FaiIndex, IndexedFastaStore, InMemoryFastaStore


def _mini_refpack(tmp_path, n_refs=6, n_queries=4, seed=11):
    rng = random.Random(seed)
    tax = make_taxonomy(tmp_path, prune=True)
    taxids = ["2111111", "2111112", "2111121", "2211111", "2111111", "2111121"]
    base = "".join(rng.choice("ACGT") for _ in range(700))

    def mutate(s, rate):
        return "".join(c if rng.random() > rate else rng.choice("ACGT") for c in s)

    genomes = {
        f"ref{i}": mutate(base, 0.03 * i) for i in range(n_refs)
    }
    mapping = {f"ref{i}": taxids[i % len(taxids)] for i in range(n_refs)}
    fa = tmp_path / "refdata.fna"
    with open(fa, "w") as fh:
        for rid, seq in genomes.items():
            fh.write(f">{rid}\n{seq}\n")
    mp = tmp_path / "mapping.tax"
    with open(mp, "w") as fh:
        for rid, tid in mapping.items():
            fh.write(f"{rid}\t{tid}\n")

    queries, rows = {}, []
    for q in range(n_queries):
        start = rng.randrange(0, 300)
        length = rng.randrange(120, 280)
        qid = f"contig{q}"
        qseq = mutate(base[start : start + length], 0.02)
        queries[qid] = qseq
        qlen = len(qseq)
        for rid, g in genomes.items():
            d = oracle.edit_distance(
                np.frombuffer(qseq.encode(), np.uint8),
                np.frombuffer(g[start : start + qlen].encode(), np.uint8),
            )
            ident = max(0, qlen - d)
            if ident < qlen * 0.55:
                continue
            rows.append(
                f"{qid}\t1\t{qlen}\t{qlen}\t{rid}\t{start+1}\t{start+qlen}\t"
                f"{2.0 * ident - qlen:.1f}\t1e-10\t{ident}\t{qlen}"
            )
    qf = tmp_path / "query.fna"
    with open(qf, "w") as fh:
        for qid, seq in queries.items():
            fh.write(f">{qid}\n{seq}\n")
    return tax, str(fa), str(mp), str(qf), rows, mapping


def _run(tax, query_store, db_store, rows, mapping):
    records = []
    for ln in rows:
        r = parse_alignment_line(ln)
        r.reference_node = tax.node(mapping[r.reference_identifier])
        records.append(r)
    out = io.StringIO()
    eng = RpaEngine(tax, query_store, db_store)
    eng.run(iter_record_sets(iter(records)), out)
    return out.getvalue()


@pytest.mark.parametrize("n_shards", [2, 3])
def test_sharded_store_matches_monolithic(tmp_path, n_shards):
    tax, fa, mp, qf, rows, mapping = _mini_refpack(tmp_path)
    qstore = InMemoryFastaStore(qf)

    mono = IndexedFastaStore(fa)
    expected = _run(tax, qstore, mono, rows, mapping)
    assert expected.count("\n") > 1

    parts = split_refpack(fa, n_shards, str(tmp_path / "shards"), mapping_path=mp)
    # every reference lands in exactly one shard, on its hash shard
    shard_ids = []
    for k, (part_fa, part_mp) in enumerate(parts):
        idx = FaiIndex.build(part_fa)
        idx.save(part_fa + ".fai")
        for name in idx.names:
            assert refpack_shard_of(name, n_shards) == k
            shard_ids.append(name)
        with open(part_mp) as fh:
            for line in fh:
                rid, tid = line.split("\t")
                assert mapping[rid] == tid.strip()
    assert sorted(shard_ids) == sorted(mapping)

    sharded = ShardedRefpackStore(
        [IndexedFastaStore(p) for p, _ in parts]
    )
    assert _run(tax, qstore, sharded, rows, mapping) == expected


def test_sharded_store_scalar_fallback(tmp_path):
    """Shard stores without the native batched fetcher (in-memory stores)
    go through the python per-spec fallback, same results."""
    tax, fa, mp, qf, rows, mapping = _mini_refpack(tmp_path, seed=5)
    qstore = InMemoryFastaStore(qf)
    expected = _run(tax, qstore, IndexedFastaStore(fa), rows, mapping)

    parts = split_refpack(fa, 2, str(tmp_path / "shards"))
    sharded = ShardedRefpackStore([InMemoryFastaStore(p) for p, _ in parts])
    assert _run(tax, qstore, sharded, rows, mapping) == expected


def test_split_refpack_cli(tmp_path, capsys):
    from taxtk.cli import tools as tools_cli

    _, fa, mp, _, _, mapping = _mini_refpack(tmp_path, seed=3)
    rc = tools_cli.main(
        ["split-refpack", fa, str(tmp_path / "out"), "-n", "2",
         "-g", mp, "--index"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    total = 0
    for ln in lines:
        part_fa, part_mp = ln.split("\t")
        idx = FaiIndex.load(part_fa + ".fai")
        total += len(idx)
    assert total == len(mapping)


def test_taxator_cli_repeated_f(tmp_path, monkeypatch, capsys):
    """`taxator -f shard0 -i i0 -f shard1 -i i1 ...` == single `-f`
    byte-for-byte; mismatched -f/-i counts are a clean fatal error."""
    import sys as _sys
    from taxtk.cli import taxator as taxator_cli

    tax, fa, mp, qf, rows, mapping = _mini_refpack(tmp_path, seed=9)
    monkeypatch.setenv("TAXATORTK_TAXONOMY_NCBI", str(tmp_path))
    aln = "\n".join(rows) + "\n"

    def run(argv):
        monkeypatch.setattr(_sys, "stdin", io.StringIO(aln))
        rc = taxator_cli.main(argv)
        return rc, capsys.readouterr().out

    rc, mono = run(["-a", "rpa", "-g", mp, "-q", qf, "-f", fa])
    assert rc == 0

    parts = split_refpack(fa, 3, str(tmp_path / "sh"))
    argv = ["-a", "rpa", "-g", mp, "-q", qf]
    for part_fa, _ in parts:
        FaiIndex.build(part_fa).save(part_fa + ".fai")
        argv += ["-f", part_fa, "-i", part_fa + ".fai"]
    rc, sharded = run(argv)
    assert rc == 0
    assert sharded == mono

    rc, _ = run(["-a", "rpa", "-g", mp, "-q", qf,
                 "-f", parts[0][0], "-f", parts[1][0],
                 "-i", parts[0][0] + ".fai"])
    assert rc == 1
