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


def test_two_host_shards_merge_equals_single_run(tmp_path):
    """Simulate the reference's split-classify-concatenate workflow
    (FAQ#9): two host shards produce, after merge+sort, byte-identical
    GFF3 to a single-host run."""
    import io
    import random
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixture_tax import make_taxonomy
    from test_rpa import _synthesize_case, DictStore, run_engine

    tax = make_taxonomy(tmp_path, prune=True)
    rng = random.Random(55)
    recordsets, qseqs, refseqs = [], {}, {}
    for case in range(8):
        made = _synthesize_case(rng, tax)
        if made is None:
            continue
        refs, qs, records = made
        qid = f"q{case}"
        for r in records:
            r.query_identifier = qid
            r.reference_identifier = f"c{case}_" + r.reference_identifier
        refseqs.update({f"c{case}_" + k: v for k, v in refs.items()})
        qseqs[qid] = qs["q0"]
        recordsets.append(records)

    qstore, dbstore = DictStore(qseqs), DictStore(refseqs)
    full = run_engine(tax, qstore, dbstore, recordsets)
    full_sorted = sorted(
        l for l in full.splitlines() if l and not l.startswith("#")
    )

    parts = []
    for p in range(2):
        shard = list(host_shard(iter(recordsets), p, 2))
        out = run_engine(tax, qstore, dbstore, shard)
        path = tmp_path / f"part{p}.gff3"
        path.write_text(out)
        parts.append(str(path))
    merged = tmp_path / "merged.gff3"
    merge_gff3_parts(parts, str(merged))
    merged_lines = [
        l for l in merged.read_text().splitlines() if not l.startswith("#")
    ]
    assert merged_lines == sorted(full_sorted, key=lambda l: l.split("\t", 1)[0])


def test_merge_gff3_parts_bounded_memory_external_sort(tmp_path):
    """Config-5-scale contract for the MULTI-host merge (round-3 VERDICT
    item 6): with chunk_lines far below the line count, the merge must
    spill sorted runs to tempfiles and k-way-merge them — never holding
    the body in memory — and the output must equal `LC_ALL=C sort -k1,1`
    of the concatenated bodies (binning-blast.bash:113 semantics)."""
    import random

    rng = random.Random(7)
    n_parts, per_part = 4, 5000
    paths, all_lines = [], []
    for p in range(n_parts):
        lines = []
        for i in range(per_part):
            qid = f"contig_{rng.randrange(10_000):05d}"
            line = f"{qid}\ttaxtk\tseq\t1\t{rng.randrange(1, 999)}\t0\t.\t.\tID=q{p}_{i}"
            lines.append(line)
        all_lines.extend(lines)
        f = tmp_path / f"part.{p}.gff3"
        f.write_text("##gff-version 3\n" + "\n".join(lines) + "\n")
        paths.append(str(f))

    spills = []
    from taxtk.pipeline import workflows as wf

    orig = wf._MergeSortWriter._spill

    def counting_spill(self):
        if self.buf:
            spills.append(len(self.buf))
        return orig(self)

    wf._MergeSortWriter._spill = counting_spill
    try:
        out = tmp_path / "merged.gff3"
        merge_gff3_parts(paths, str(out), chunk_lines=1024)
    finally:
        wf._MergeSortWriter._spill = orig

    got = out.read_text().splitlines()
    assert got[0] == "##gff-version 3"
    # byte-equal to coreutils sort -k1,1 semantics (key, then whole line)
    expected = sorted(all_lines, key=lambda l: (l.split("\t", 1)[0], l))
    assert got[1:] == expected
    # the external sort actually engaged: many spills, all bounded
    assert len(spills) >= (n_parts * per_part) // 1024 - 1
    assert max(spills) <= 1024
