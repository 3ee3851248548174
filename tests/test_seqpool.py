"""Cross-round device-resident sequence pool (taxtk/ops/seqpool.py).

VERDICT round-2 item 1: the pool cache is correctness-critical hot-path
state (a stale or aliased slot silently corrupts edit distances), so these
tests drive it three ways:

  * unit level: slot reuse, capacity growth, budget reset, rollback on
    pack/append failure, 2-bit vs 4-bit routing — with packed column
    content verified against _pack_text_pool;
  * kernel level: multi-round batched_edit_distance_pallas_myers (single
    and pattern-block-chunked entry points) in interpret mode with a live
    pool_cache, against the XLA Myers oracle;
  * engine level: full RPA round-trips on CPU with the pool cache active,
    byte-identical GFF3 vs the per-pair oracle aligner.
"""

import random

import numpy as np
import pytest

from taxtk.ops import seqpool
from taxtk.ops.seqpool import DevicePoolCache
from taxtk.ops.myers_batch import batched_edit_distance_myers
from taxtk.ops.pallas_myers import (
    _pack_text_pool,
    batched_edit_distance_pallas_myers,
    batched_edit_distance_pallas_myers_long,
)

from fixture_tax import make_taxonomy
from test_rpa import DictStore, OracleAligner, _synthesize_case, run_engine


def _rows(rng, n, lo=20, hi=90, alpha=4):
    return [
        rng.randint(0, alpha, rng.randint(lo, hi)).astype(np.uint8)
        for _ in range(n)
    ]


def _keys(rows):
    return [(len(r), r.tobytes()) for r in rows]


def _lens(rows):
    return np.asarray([len(r) for r in rows], np.int32)


def _expected_column(row, Hc, bits):
    return np.asarray(
        _pack_text_pool([row], np.asarray([len(row)], np.int32),
                        np.ones(1, bool), Hc, 1, bits)
    )[:, 0]


def _check_pool_contents(cache, bits, Hc, rows_by_key):
    """Every committed slot's packed column equals the packing of the row
    the key claims it holds."""
    p = cache.pools[(bits, Hc)]
    dev = np.asarray(p.dev)
    for key, slot in p.slots.items():
        row = rows_by_key[key]
        np.testing.assert_array_equal(
            dev[:, slot], _expected_column(row, Hc, bits),
            err_msg=f"slot {slot} does not hold its claimed row",
        )


class TestEnsureUnit:
    def test_slot_reuse_across_rounds(self):
        rng = np.random.RandomState(0)
        cache = DevicePoolCache()
        bits, Hc = 4, 128
        rows1 = _rows(rng, 10)
        _, slots1 = cache.ensure(bits, Hc, _keys(rows1), rows1, _lens(rows1))
        assert cache.misses == 10 and cache.hits == 0
        # second round: 6 repeats + 4 new rows
        rows2 = rows1[2:8] + _rows(rng, 4)
        _, slots2 = cache.ensure(bits, Hc, _keys(rows2), rows2, _lens(rows2))
        assert cache.hits == 6
        assert cache.misses == 14
        # repeated rows keep their original slots
        np.testing.assert_array_equal(slots2[:6], slots1[2:8])
        # new slots are contiguous after the committed count (not pow2-padded)
        assert sorted(slots2[6:]) == [10, 11, 12, 13]
        rows_by_key = {k: r for k, r in zip(_keys(rows1 + rows2), rows1 + rows2)}
        _check_pool_contents(cache, bits, Hc, rows_by_key)

    def test_capacity_growth_preserves_rows(self):
        rng = np.random.RandomState(1)
        cache = DevicePoolCache()
        bits, Hc = 4, 128
        all_rows = []
        # 3 rounds x 300 unique rows forces growth past the 512 start cap
        for _ in range(3):
            rows = _rows(rng, 300)
            all_rows.extend(rows)
            cache.ensure(bits, Hc, _keys(rows), rows, _lens(rows))
        p = cache.pools[(bits, Hc)]
        assert p.cap >= 900 and p.n_used == 900
        assert cache.resets == 0
        rows_by_key = {k: r for k, r in zip(_keys(all_rows), all_rows)}
        _check_pool_contents(cache, bits, Hc, rows_by_key)

    def test_budget_reset(self):
        rng = np.random.RandomState(2)
        bits, Hc = 4, 128
        # budget below two default pools: the second pool's first append
        # (or the first pool's growth) triggers a wholesale reset
        cache = DevicePoolCache(budget_bytes=(Hc // 2) * 600)
        rows1 = _rows(rng, 10)
        cache.ensure(bits, Hc, _keys(rows1), rows1, _lens(rows1))
        rows2 = _rows(rng, 550)  # growth to 1024 columns exceeds the budget
        dev2, slots2 = cache.ensure(bits, Hc, _keys(rows2), rows2, _lens(rows2))
        assert cache.resets == 1
        # after the reset every row of the round is freshly shipped from 0
        np.testing.assert_array_equal(np.sort(slots2), np.arange(550))
        assert (len(cache.pools), cache.pools[(bits, Hc)].n_used) == (1, 550)
        rows_by_key = {k: r for k, r in zip(_keys(rows2), rows2)}
        _check_pool_contents(cache, bits, Hc, rows_by_key)
        # rows from before the reset are re-shipped on their next use; the
        # pool is still over budget (nothing smaller can hold the round),
        # so the next append resets again and ships from slot 0
        _, slots1b = cache.ensure(bits, Hc, _keys(rows1), rows1, _lens(rows1))
        assert cache.resets == 2
        np.testing.assert_array_equal(slots1b, np.arange(10))
        _check_pool_contents(
            cache, bits, Hc, {k: r for k, r in zip(_keys(rows1), rows1)}
        )

    def test_rollback_on_pack_failure(self, monkeypatch):
        """A pack failure must not commit slots pointing at never-shipped
        columns (ADVICE round-2: two keys would alias one column)."""
        rng = np.random.RandomState(3)
        cache = DevicePoolCache()
        bits, Hc = 4, 128
        rows1 = _rows(rng, 5)
        cache.ensure(bits, Hc, _keys(rows1), rows1, _lens(rows1))

        import taxtk.ops.pallas_myers as pm

        real_pack = pm._pack_text_pool

        def boom(*a, **k):
            raise RuntimeError("injected pack failure")

        rows2 = _rows(rng, 5)
        monkeypatch.setattr(pm, "_pack_text_pool", boom)
        with pytest.raises(RuntimeError):
            cache.ensure(bits, Hc, _keys(rows2), rows2, _lens(rows2))
        monkeypatch.setattr(pm, "_pack_text_pool", real_pack)
        p = cache.pools[(bits, Hc)]
        assert p.n_used == 5 and len(p.slots) == 5  # nothing committed
        # the failed rows ship cleanly on retry, no aliasing
        _, slots2 = cache.ensure(bits, Hc, _keys(rows2), rows2, _lens(rows2))
        assert sorted(slots2) == [5, 6, 7, 8, 9]
        allrows = rows1 + rows2
        _check_pool_contents(
            cache, bits, Hc, {k: r for k, r in zip(_keys(allrows), allrows)}
        )

    def test_pool_dropped_on_append_failure(self, monkeypatch):
        """grow/append donate the pool buffer; on failure the pool is
        dropped wholesale so no dead buffer is ever read."""
        rng = np.random.RandomState(4)
        cache = DevicePoolCache()
        bits, Hc = 4, 128
        rows1 = _rows(rng, 5)
        cache.ensure(bits, Hc, _keys(rows1), rows1, _lens(rows1))

        def boom(*a, **k):
            raise RuntimeError("injected append failure")

        monkeypatch.setattr(seqpool, "_pool_append", boom)
        rows2 = _rows(rng, 5)
        with pytest.raises(RuntimeError):
            cache.ensure(bits, Hc, _keys(rows2), rows2, _lens(rows2))
        assert (bits, Hc) not in cache.pools
        monkeypatch.undo()
        both = rows1 + rows2
        _, slots = cache.ensure(bits, Hc, _keys(both), both, _lens(both))
        _check_pool_contents(
            cache, bits, Hc, {k: r for k, r in zip(_keys(both), both)}
        )

    def test_bits_are_separate_pools(self):
        rng = np.random.RandomState(5)
        cache = DevicePoolCache()
        rows = _rows(rng, 4)
        cache.ensure(2, 128, _keys(rows), rows, _lens(rows))
        cache.ensure(4, 128, _keys(rows), rows, _lens(rows))
        assert set(cache.pools) == {(2, 128), (4, 128)}
        _check_pool_contents(
            cache, 2, 128, {k: r for k, r in zip(_keys(rows), rows)}
        )
        _check_pool_contents(
            cache, 4, 128, {k: r for k, r in zip(_keys(rows), rows)}
        )


def _pad_pairs(pairs):
    B = len(pairs)
    M = max(len(a) for a, _ in pairs)
    N = max(len(b) for _, b in pairs)
    a_codes = np.zeros((B, M), np.uint8)
    b_codes = np.zeros((B, N), np.uint8)
    a_len = np.zeros(B, np.int32)
    b_len = np.zeros(B, np.int32)
    for r, (a, b) in enumerate(pairs):
        a_codes[r, : len(a)] = a
        b_codes[r, : len(b)] = b
        a_len[r], b_len[r] = len(a), len(b)
    return a_codes, b_codes, a_len, b_len


class TestKernelWithPoolCache:
    @pytest.mark.parametrize("alpha", [4, 5])  # 2-bit (N-free) and 4-bit
    def test_multi_round_single_launch(self, alpha):
        rng = np.random.RandomState(10)
        cache = DevicePoolCache()
        seqs = _rows(rng, 12, lo=30, hi=120, alpha=alpha)
        for rnd in range(3):
            pairs = [
                (seqs[rng.randint(len(seqs))], seqs[rng.randint(len(seqs))])
                for _ in range(8)
            ]
            args = _pad_pairs(pairs)
            got = batched_edit_distance_pallas_myers(
                *args, interpret=True, pool_gather=True, pool_cache=cache
            )
            want = batched_edit_distance_myers(*args)
            np.testing.assert_array_equal(got, want, err_msg=f"round {rnd}")
        assert cache.hits > 0  # later rounds actually reused resident rows
        bits = 2 if alpha == 4 else 4
        assert any(k[0] == bits for k in cache.pools)

    def test_multi_round_chunked_launch(self):
        """Pattern-block-chunked path (long pairs) through the pool cache."""
        rng = np.random.RandomState(11)
        cache = DevicePoolCache()
        seqs = _rows(rng, 6, lo=200, hi=400, alpha=4)
        for rnd in range(2):
            pairs = [
                (seqs[rng.randint(len(seqs))], seqs[rng.randint(len(seqs))])
                for _ in range(5)
            ]
            args = _pad_pairs(pairs)
            got = batched_edit_distance_pallas_myers_long(
                *args, interpret=True, pool_gather=True, pool_cache=cache,
                text_chunk=64, block_words=4,
            )
            want = batched_edit_distance_myers(*args)
            np.testing.assert_array_equal(got, want, err_msg=f"round {rnd}")
        assert cache.hits > 0

    def test_dense_unique_bucket_reuses_cache(self):
        """A bucket of all-unique pairs (dense: pool no narrower than the
        pair group) must still take the pool path when a cache is attached
        — the compiled entry drops the max_rows bail so pass-1 candidates
        already resident from pass 0 are not re-shipped (the dense fallback
        also paid a ~0.1 s/bucket host peq build at config-4 shapes)."""
        rng = np.random.RandomState(13)
        cache = DevicePoolCache()
        seqs = _rows(rng, 40, lo=30, hi=100, alpha=4)
        # round 1: 20 pairs, all 40 rows unique (2B rows == pool rows)
        pairs = [(seqs[2 * i], seqs[2 * i + 1]) for i in range(20)]
        args = _pad_pairs(pairs)
        got = batched_edit_distance_pallas_myers(
            *args, interpret=True, pool_gather=True, pool_cache=cache
        )
        np.testing.assert_array_equal(got, batched_edit_distance_myers(*args))
        assert cache.hits == 0
        # round 2: same rows re-paired -> every row hits the resident pool
        pairs2 = [(seqs[2 * i + 1], seqs[2 * i]) for i in range(20)]
        args2 = _pad_pairs(pairs2)
        got2 = batched_edit_distance_pallas_myers(
            *args2, interpret=True, pool_gather=True, pool_cache=cache
        )
        np.testing.assert_array_equal(
            got2, batched_edit_distance_myers(*args2)
        )
        assert cache.hits == 40  # zero re-ships in round 2

    def test_budget_reset_mid_stream_is_exact(self):
        """Forcing resets between kernel rounds must not change results."""
        rng = np.random.RandomState(12)
        cache = DevicePoolCache(budget_bytes=1)  # every round resets
        seqs = _rows(rng, 10, lo=30, hi=80, alpha=4)
        for rnd in range(3):
            pairs = [
                (seqs[rng.randint(len(seqs))], seqs[rng.randint(len(seqs))])
                for _ in range(6)
            ]
            args = _pad_pairs(pairs)
            got = batched_edit_distance_pallas_myers(
                *args, interpret=True, pool_gather=True, pool_cache=cache
            )
            np.testing.assert_array_equal(
                got, batched_edit_distance_myers(*args)
            )
        assert cache.resets >= 2


class TestProteinPoolCache:
    def test_multi_round_parity_and_reuse(self):
        """Protein kernel through the bits=8 pool cache: multi-round
        parity vs the dense entry and the XLA wavefront, with later
        rounds hitting resident rows (incl. a-side rows reused as
        b-side — keys are content-based)."""
        from taxtk.ops.pallas_protein import batched_protein_align_pallas
        from taxtk.ops.protein_align import batched_protein_align

        rng = np.random.RandomState(21)
        cache = DevicePoolCache()
        seqs = _rows(rng, 14, lo=20, hi=70, alpha=20)
        for rnd in range(3):
            pairs = [
                (seqs[rng.randint(len(seqs))], seqs[rng.randint(len(seqs))])
                for _ in range(9)
            ]
            args = _pad_pairs(pairs)
            got = batched_protein_align_pallas(
                *args, interpret=True, pool_cache=cache, sub_tile=8
            )
            dense = batched_protein_align_pallas(
                *args, interpret=True, sub_tile=8
            )
            want = batched_protein_align(*args)
            for k in ("distance", "similarity", "matches", "gaps"):
                np.testing.assert_array_equal(
                    got[k], dense[k], err_msg=f"round {rnd} {k} (pool/dense)"
                )
                np.testing.assert_array_equal(
                    got[k], want[k], err_msg=f"round {rnd} {k} (pool/xla)"
                )
        assert cache.hits > 0
        assert any(k[0] == 8 for k in cache.pools)

    def test_engine_protein_gff3_byte_identical(self, tmp_path):
        """Full protein RPA with the pool cache active (pallas interpret)
        vs the portable XLA wavefront backend: byte-identical GFF3."""
        from taxtk.engine.aligner import BatchAligner
        from test_rpa import _aln

        tax = make_taxonomy(tmp_path, prune=True)
        rng = random.Random(7)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        refseqs, mapping = {}, {}
        leaves = ["2111111", "2111112", "2111121", "2211111"]
        for k, taxid in enumerate(leaves):
            refseqs[f"p{k}"] = "".join(rng.choice(AA) for _ in range(150))
            mapping[f"p{k}"] = taxid
        base = refseqs["p0"][20:100]
        query = "".join(
            c if rng.random() > 0.08 else rng.choice(AA) for c in base
        )
        qlen = len(query)
        records = []
        for rid in refseqs:
            ident = rng.randrange(40, 75)
            rec = _aln("pq", 1, qlen, qlen, rid, 21, 100, 50 + ident,
                       ident, 80)
            rec.reference_node = tax.node(mapping[rid])
            records.append(rec)
        qstore = DictStore({"pq": query})
        dbstore = DictStore(refseqs)

        pool_aligner = BatchAligner(
            "protein", protein_backend="wavefront-pallas",
            pallas_interpret=True,
        )
        assert pool_aligner.pool_cache is not None
        out_pool = run_engine(
            tax, qstore, dbstore, [records], aligner=pool_aligner,
            protein=True,
        )
        out_xla = run_engine(
            tax, qstore, dbstore, [records],
            aligner=BatchAligner("protein", protein_backend="wavefront"),
            protein=True,
        )
        assert out_pool == out_xla
        assert len(out_pool.splitlines()) > 1
        assert pool_aligner.pool_cache.misses > 0


class TestEngineWithPoolCache:
    def test_engine_gff3_byte_identical(self, tmp_path):
        """Full RPA round-trips with the production pool cache active
        (pallas interpret mode on CPU), vs the per-pair oracle aligner."""
        from taxtk.engine.aligner import BatchAligner

        tax = make_taxonomy(tmp_path, prune=True)
        rng = random.Random(77)
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

        out_oracle = run_engine(
            tax, DictStore(qseqs), DictStore(refseqs), recordsets,
            aligner=OracleAligner("dna"),
        )
        aligner = BatchAligner(
            "dna", dna_backend="myers-pallas", pallas_interpret=True
        )
        assert aligner.pool_cache is not None
        out_pool = run_engine(
            tax, DictStore(qseqs), DictStore(refseqs), recordsets,
            aligner=aligner,
        )
        assert out_pool == out_oracle
        assert aligner.pool_cache.hits > 0  # cross-round reuse happened


class TestSharedPoolCache:
    def test_shared_registry_per_device(self):
        """shared_pool_cache returns one cache per device, stable across
        calls; reset_shared_pools drops them."""
        seqpool.reset_shared_pools()
        c1 = seqpool.shared_pool_cache()
        c2 = seqpool.shared_pool_cache()
        assert c1 is c2
        seqpool.reset_shared_pools()
        assert seqpool.shared_pool_cache() is not c1

    def test_cross_aligner_zero_reships(self):
        """Two independent BatchAligner instances (fresh engine runs in one
        process — the round-4 config-4 cold-wire scenario) share the pool:
        the second run of the same workload ships ZERO new rows."""
        from taxtk.engine.aligner import BatchAligner

        seqpool.reset_shared_pools()
        rng = np.random.RandomState(3)
        pairs = [
            (rng.randint(0, 4, 150).astype(np.uint8),
             rng.randint(0, 4, 200).astype(np.uint8))
            for _ in range(12)
        ]

        def run():
            al = BatchAligner(
                "dna", dna_backend="myers-pallas", pallas_interpret=True
            )
            out = al.align_pairs(pairs)
            return al, [(v.distance, v.similarity) for v in out]

        al1, out1 = run()
        cache = al1.pool_cache
        m0, h0 = cache.misses, cache.hits
        assert m0 > 0
        al2, out2 = run()
        assert al2.pool_cache is cache  # process-shared
        assert cache.misses == m0  # zero re-ships on the warm run
        assert cache.hits > h0
        assert out1 == out2
        seqpool.reset_shared_pools()


def test_systolic_empty_batch():
    """B == 0 honors the drop-in contract (round-4 advisor finding)."""
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )

    empty_codes = np.zeros((0, 8), np.uint8)
    empty_len = np.zeros(0, np.int32)
    out = batched_edit_distance_systolic(
        empty_codes, empty_codes, empty_len, empty_len, interpret=True
    )
    assert out.shape == (0,)
    fin = batched_edit_distance_systolic(
        empty_codes, empty_codes, empty_len, empty_len, interpret=True,
        lazy=True,
    )
    assert fin().shape == (0,)
    dev, post = batched_edit_distance_systolic(
        empty_codes, empty_codes, empty_len, empty_len, interpret=True,
        lazy="device",
    )
    assert post(np.asarray(dev)).shape == (0,)
