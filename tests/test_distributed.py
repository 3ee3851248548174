"""Host-sharding contract tests (single-process simulation of multi-host)."""

import io

from taxtk.parallel.distributed import host_shard, shard_of, merge_gff3_parts
from taxtk.formats.alignments import parse_alignment_line


def _rset(qid):
    r = parse_alignment_line(f"{qid}\t1\t50\t100\tr1\t1\t50\t60\t0\t45\t50")
    return [r]


def test_shards_partition_completely():
    qids = [f"contig{i}" for i in range(200)]
    rsets = [_rset(q) for q in qids]
    n = 4
    shards = [list(host_shard(iter(rsets), p, n)) for p in range(n)]
    total = sum(len(s) for s in shards)
    assert total == len(rsets)
    seen = {rs[0].query_identifier for s in shards for rs in s}
    assert seen == set(qids)
    # stability
    for q in qids:
        assert shard_of(q, n) == shard_of(q, n)


def test_merge_gff3_parts(tmp_path):
    p1 = tmp_path / "a.gff3"
    p2 = tmp_path / "b.gff3"
    p1.write_text("##gff-version 3\nzeta\tx\ty\t1\t2\t0\t.\t.\tk=v\n")
    p2.write_text("##gff-version 3\nalpha\tx\ty\t1\t2\t0\t.\t.\tk=v\n")
    out = tmp_path / "m.gff3"
    merge_gff3_parts([str(p1), str(p2)], str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "##gff-version 3"
    assert lines[1].startswith("alpha") and lines[2].startswith("zeta")
