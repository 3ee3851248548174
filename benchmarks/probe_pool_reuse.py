#!/usr/bin/env python
"""Measure cross-round sequence-pool reuse in the RPA engine.

The pallas Myers path dedupes each align round's pair sides into a pool
and ships it to device (ops/pallas_myers.py _dedupe_pool).  Across the
three rounds of one macro-batch, pass-1/2 re-align the SAME segments that
pass 0 already shipped — this probe quantifies how many pool rows (and
bytes) of rounds 1-2 were already on device after round 0, i.e. the H2D
saved by a device-resident cross-round pool.

Runs the bench_e2e workload on CPU with a recording aligner wrapper; no
TPU needed (the pool economics are backend-independent).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main(n_contigs=100):
    from bench_e2e import make_workload
    from taxtk.constants import DEFAULT_RANKS
    from taxtk.engine.aligner import BatchAligner
    from taxtk.engine.executor import RpaEngine
    from taxtk.engine.recordsets import iter_record_sets
    from taxtk.formats.alignments import iter_alignment_records
    from taxtk.formats.mapping import load_seqid_taxid_mapping
    from taxtk.refpack.store import IndexedFastaStore
    from taxtk.taxonomy.flat import load_taxonomy_from_environment

    with tempfile.TemporaryDirectory() as d:
        paths = make_workload(d, n_contigs)
        aln_path, query_fa, ref_fa, map_path, tax_dir, _ = paths
        os.environ["TAXATORTK_TAXONOMY_NCBI"] = tax_dir
        tax = load_taxonomy_from_environment(list(DEFAULT_RANKS))
        tax = tax.prune_to_marked_ranks(list(DEFAULT_RANKS))
        seqid2taxid = load_seqid_taxid_mapping(map_path)
        recs = []
        with open(aln_path) as f:
            for _, rec in iter_alignment_records(f):
                rec.reference_node = tax.node(seqid2taxid[rec.reference_identifier])
                recs.append(rec)

        rounds = []  # list of dict key->bytes per round

        class RecordingAligner(BatchAligner):
            def align_pairs(self, pairs, shard_ids=None, deferred=False):
                pool = {}
                for a, b in pairs:
                    for s in (a, b):
                        # full-content key, matching the real _dedupe_pool
                        # (a Python-hash key could conflate distinct rows
                        # and overstate reuse)
                        k = (len(s), s.tobytes())
                        pool[k] = len(s)
                rounds.append(pool)
                return super().align_pairs(pairs, shard_ids, deferred)

        aligner = RecordingAligner("dna", dna_backend="myers")
        engine = RpaEngine(
            tax,
            IndexedFastaStore(query_fa),
            IndexedFastaStore(ref_fa),
            aligner=aligner,
            macro_batch=1 << 30,  # single macro-batch: rounds == passes
        )
        import io

        engine.run(iter_record_sets(iter(recs), True, False), io.StringIO())

        seen = {}
        print(f"{'round':>5} {'rows':>8} {'new rows':>8} {'bytes':>12} "
              f"{'new bytes':>12} {'reuse %':>8}")
        for r, pool in enumerate(rounds):
            rows = len(pool)
            by = sum(pool.values())
            new = {k: v for k, v in pool.items() if k not in seen}
            nb = sum(new.values())
            reuse = 100.0 * (1 - nb / by) if by else 0.0
            print(f"{r:>5} {rows:>8} {len(new):>8} {by:>12} {nb:>12} "
                  f"{reuse:>7.1f}%")
            seen.update(pool)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
