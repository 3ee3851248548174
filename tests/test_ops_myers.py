"""Bit-parallel Myers kernels (XLA + Pallas interpret) vs oracle."""

import random

import numpy as np

from taxtk.ops import oracle
from taxtk.ops.myers_batch import batched_edit_distance_myers
from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers
from taxtk.refpack.store import encode_dna

DNA = "ACGTN"


def _batch(pairs):
    B = len(pairs)
    M = max((len(a) for a, _ in pairs), default=1) or 1
    N = max((len(b) for _, b in pairs), default=1) or 1
    ac = np.zeros((B, M), np.uint8)
    bc = np.zeros((B, N), np.uint8)
    al = np.zeros(B, np.int32)
    bl = np.zeros(B, np.int32)
    for i, (a, b) in enumerate(pairs):
        ea, eb = encode_dna(a), encode_dna(b)
        ac[i, : len(ea)] = ea
        bc[i, : len(eb)] = eb
        al[i] = len(ea)
        bl[i] = len(eb)
    return ac, bc, al, bl


def _pairs(seed, n, lmax, lmin=0):
    rng = random.Random(seed)
    return [
        (
            "".join(rng.choice(DNA) for _ in range(rng.randint(lmin, lmax))),
            "".join(rng.choice(DNA) for _ in range(rng.randint(lmin, lmax))),
        )
        for _ in range(n)
    ]


def test_xla_myers_exact():
    pairs = _pairs(1, 120, 260)
    ac, bc, al, bl = _batch(pairs)
    got = batched_edit_distance_myers(ac, bc, al, bl)
    want = np.array(
        [oracle.edit_distance(encode_dna(a), encode_dna(b)) for a, b in pairs]
    )
    np.testing.assert_array_equal(got, want)


def test_xla_myers_multiblock_boundaries():
    # lengths straddling the 32-bit word boundaries
    pairs = []
    for m in (31, 32, 33, 63, 64, 65, 96, 127, 128, 129):
        rng = random.Random(m)
        a = "".join(rng.choice("ACGT") for _ in range(m))
        b = "".join(rng.choice("ACGT") for _ in range(m + rng.randint(-3, 3)))
        pairs.append((a, b))
    ac, bc, al, bl = _batch(pairs)
    got = batched_edit_distance_myers(ac, bc, al, bl)
    want = np.array(
        [oracle.edit_distance(encode_dna(a), encode_dna(b)) for a, b in pairs]
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_myers_interpret_chunked():
    pairs = _pairs(2, 24, 200)
    ac, bc, al, bl = _batch(pairs)
    got = batched_edit_distance_pallas_myers(ac, bc, al, bl, text_chunk=64, interpret=True)
    want = np.array(
        [oracle.edit_distance(encode_dna(a), encode_dna(b)) for a, b in pairs]
    )
    np.testing.assert_array_equal(got, want)


def test_k_quantization_ladder():
    # VMEM-safety: K never jumps past 192 for the aligner's 6144bp cap
    from taxtk.ops.pallas_myers import _quantize_K

    assert [_quantize_K(k) for k in (1, 2, 3, 4, 5, 8, 9, 24, 25, 32)] == [
        1, 2, 3, 4, 8, 8, 16, 24, 32, 32]
    assert _quantize_K(33) == 64
    assert _quantize_K(64) == 64
    assert _quantize_K(65) == 128
    assert _quantize_K(128) == 128
    assert _quantize_K(129) == 192
    assert _quantize_K(192) == 192  # = ceil(6144/32), the aligner cap


def test_pallas_myers_interpret_multiblock_k64():
    # pattern > 32 blocks exercises the quantized-K pad-block path
    rng = random.Random(5)
    pairs = []
    for _ in range(4):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(1025, 1100)))
        b = a[:200]
        pairs.append((a, b))
    ac, bc, al, bl = _batch(pairs)
    got = batched_edit_distance_pallas_myers(
        ac, bc, al, bl, text_chunk=128, interpret=True
    )
    want = np.array(
        [oracle.edit_distance(encode_dna(a), encode_dna(b)) for a, b in pairs]
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_myers_long_chunked_interpret():
    """Pattern-block-chunked kernel (block_words tiny to force many
    blocks) == oracle, mixed pattern/text lengths incl. block-boundary
    lengths and pairs whose pattern ends in different blocks."""
    from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers_long

    rng = random.Random(77)
    pairs = _pairs(78, 10, 200, lmin=1)
    # exact block-boundary pattern lengths (block_words=2 -> 64bp blocks)
    for m in (63, 64, 65, 128, 129):
        a = "".join(rng.choice(DNA) for _ in range(m))
        b = "".join(rng.choice(DNA) for _ in range(rng.randint(1, 250)))
        pairs.append((a, b))
    ac, bc, al, bl = _batch(pairs)
    got = batched_edit_distance_pallas_myers_long(
        ac, bc, al, bl, block_words=2, text_chunk=64, interpret=True
    )
    for i, (a, b) in enumerate(pairs):
        want = oracle.edit_distance(encode_dna(a), encode_dna(b))
        assert got[i] == want, (i, len(a), len(b), got[i], want)


def test_pallas_myers_long_matches_single_launch_interpret():
    """Chunked path == single-launch kernel on the same batch."""
    from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers_long

    pairs = _pairs(90, 24, 150, lmin=1)
    ac, bc, al, bl = _batch(pairs)
    single = batched_edit_distance_pallas_myers(ac, bc, al, bl, interpret=True)
    chunked = batched_edit_distance_pallas_myers_long(
        ac, bc, al, bl, block_words=1, text_chunk=128, interpret=True
    )
    assert np.array_equal(single, chunked)


def test_pallas_myers_pool_gather_interpret():
    """Pool-gather wire format (dedupe + on-device gather) must be exact,
    including shared sequences across pairs and both-side dedupe."""
    rng = np.random.RandomState(3)
    B = 37
    al = rng.randint(1, 300, B).astype(np.int32)
    bl = rng.randint(1, 300, B).astype(np.int32)
    shared = rng.randint(0, 5, (4, 300)).astype(np.uint8)
    ac = np.zeros((B, 300), np.uint8)
    bc = np.zeros((B, 300), np.uint8)
    for i in range(B):
        if i % 3 == 0:
            ac[i] = shared[i % 4]
            al[i] = 250
        else:
            ac[i, : al[i]] = rng.randint(0, 5, al[i])
        if i % 2 == 0:
            bc[i] = shared[(i + 1) % 4]
            bl[i] = 287
        else:
            bc[i, : bl[i]] = rng.randint(0, 5, bl[i])
    want = np.asarray(batched_edit_distance_myers(ac, bc, al, bl))
    got = np.asarray(
        batched_edit_distance_pallas_myers(
            ac, bc, al, bl, interpret=True, pool_gather=True, text_chunk=64
        )
    )
    np.testing.assert_array_equal(want, got)


def test_pallas_myers_long_pool_gather_interpret():
    """Chunked (long-pattern) path with pool-gather wire format: shared
    texts across pairs, multi-block patterns, block-relative hmask."""
    from taxtk.ops.pallas_myers import batched_edit_distance_pallas_myers_long

    rng = np.random.RandomState(11)
    B = 9
    shared_text = rng.randint(0, 5, 260).astype(np.uint8)
    ac = np.zeros((B, 150), np.uint8)
    bc = np.zeros((B, 260), np.uint8)
    al = np.zeros(B, np.int32)
    bl = np.zeros(B, np.int32)
    for i in range(B):
        al[i] = rng.randint(40, 151)
        ac[i, : al[i]] = rng.randint(0, 5, al[i])
        if i % 2 == 0:
            bc[i] = shared_text
            bl[i] = 260
        else:
            bl[i] = rng.randint(100, 261)
            bc[i, : bl[i]] = rng.randint(0, 5, bl[i])
    want = np.asarray(batched_edit_distance_myers(ac, bc, al, bl))
    got = np.asarray(
        batched_edit_distance_pallas_myers_long(
            ac, bc, al, bl, block_words=2, text_chunk=64,
            interpret=True, pool_gather=True,
        )
    )
    np.testing.assert_array_equal(want, got)


def test_pallas_myers_text_bits_routing():
    """2-bit text packing engages exactly when every code < 4 (pure ACGT)
    and yields the same distances as the 4-bit (N-bearing) wire format
    (ops/pallas_myers.py _pack_text/_pack_text_pool)."""
    from taxtk.ops import pallas_myers as pm

    rng = np.random.RandomState(7)
    B = 6
    for hi, want_bits in ((4, 2), (5, 4)):  # codes 0..3 => 2-bit; with N => 4
        ac = np.zeros((B, 90), np.uint8)
        bc = np.zeros((B, 120), np.uint8)
        al = np.zeros(B, np.int32)
        bl = np.zeros(B, np.int32)
        for i in range(B):
            al[i] = rng.randint(1, 91)
            bl[i] = rng.randint(1, 121)
            ac[i, : al[i]] = rng.randint(0, hi, al[i])
            bc[i, : bl[i]] = rng.randint(0, hi, bl[i])
        if hi == 5:  # guarantee at least one N in a text
            bc[0, 0] = 4
        want = np.asarray(batched_edit_distance_myers(ac, bc, al, bl))
        for pool in (True, False):
            got = np.asarray(
                pm.batched_edit_distance_pallas_myers(
                    ac, bc, al, bl, interpret=True, pool_gather=pool
                )
            )
            np.testing.assert_array_equal(want, got, err_msg=f"hi={hi} pool={pool}")
        # the chunked long path too
        got = np.asarray(
            pm.batched_edit_distance_pallas_myers_long(
                ac, bc, al, bl, block_words=1, text_chunk=64,
                interpret=True, pool_gather=True,
            )
        )
        np.testing.assert_array_equal(want, got, err_msg=f"long hi={hi}")
        # routing check: the pool pack honours the expected width
        rows, plen, ia, ib, _keys = pm._dedupe_pool(ac, bc, al, bl)
        bits = 2 if all(int(r.max(initial=0)) < 4 for r in rows) else 4
        assert bits == want_bits


def test_systolic_matches_oracle_interpret():
    """Block-systolic kernel (ops/pallas_myers_systolic.py): exact
    parity with the oracle across block counts, mixed lengths, swapped
    sides, multi-row packing, and N-bearing sequences."""
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )

    rng = np.random.RandomState(11)
    B = 11
    la = rng.randint(20, 300, B)
    lb = rng.randint(20, 300, B)
    ac = np.zeros((B, la.max()), np.uint8)
    bc = np.zeros((B, lb.max()), np.uint8)
    for i in range(B):
        ac[i, : la[i]] = rng.randint(0, 5, la[i])  # incl. N (code 4)
        bc[i, : lb[i]] = rng.randint(0, 5, lb[i])
    al = la.astype(np.int32)
    bl = lb.astype(np.int32)
    exp = np.array(
        [oracle.edit_distance(ac[i, : al[i]], bc[i, : bl[i]])
         for i in range(B)]
    )
    for KC in (1, 2, 4):
        got = batched_edit_distance_systolic(
            ac, bc, al, bl, block_words=KC, sub_tile=2, text_chunk=64,
            interpret=True,
        )
        np.testing.assert_array_equal(got, exp, err_msg=f"KC={KC}")
    # lazy contract
    fin = batched_edit_distance_systolic(
        ac, bc, al, bl, block_words=2, sub_tile=2, text_chunk=64,
        interpret=True, lazy=True,
    )
    np.testing.assert_array_equal(fin(), exp)


def test_systolic_single_and_short_text():
    """Degenerate shapes: one pair, texts shorter than the block ramp
    (the stagger must still harvest at n_len), and pattern exactly on a
    block boundary."""
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )

    rng = np.random.RandomState(3)
    cases = [(64, 5), (64, 64), (33, 200), (96, 7)]
    for m, n in cases:
        a = rng.randint(0, 4, (1, m)).astype(np.uint8)
        b = rng.randint(0, 4, (1, n)).astype(np.uint8)
        got = batched_edit_distance_systolic(
            a, b, np.array([m], np.int32), np.array([n], np.int32),
            block_words=1, sub_tile=1, text_chunk=16, interpret=True,
        )
        exp = oracle.edit_distance(a[0], b[0])
        assert got[0] == exp, (m, n, got[0], exp)


def test_systolic_pool_cache_parity_and_residency():
    """Systolic pool front end: parity with the host-pool path and full
    row residency on the second round (pass-1/2 re-alignments ship
    nothing)."""
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )
    from taxtk.ops.seqpool import DevicePoolCache

    rng = np.random.RandomState(5)
    B = 7
    la = rng.randint(20, 280, B)
    lb = rng.randint(20, 280, B)
    ac = np.zeros((B, la.max()), np.uint8)
    bc = np.zeros((B, lb.max()), np.uint8)
    for i in range(B):
        ac[i, : la[i]] = rng.randint(0, 5, la[i])
        bc[i, : lb[i]] = rng.randint(0, 5, lb[i])
    al, bl = la.astype(np.int32), lb.astype(np.int32)
    exp = np.array(
        [oracle.edit_distance(ac[i, : al[i]], bc[i, : bl[i]])
         for i in range(B)]
    )
    cache = DevicePoolCache()
    for _ in range(2):
        got = batched_edit_distance_systolic(
            ac, bc, al, bl, block_words=2, sub_tile=2, text_chunk=64,
            interpret=True, pool_cache=cache,
        )
        np.testing.assert_array_equal(got, exp)
    assert cache.hits > 0 and cache.hits == cache.misses  # round 2 all hit


def test_systolic_2bit_wire_parity():
    """N-free batches route the systolic wire at bits=2 (shared pool
    class with the classic long path); parity with the oracle and with
    the bits=4 path on the same pairs."""
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )
    from taxtk.ops.seqpool import DevicePoolCache

    rng = np.random.RandomState(21)
    B = 6
    la = rng.randint(40, 250, B)
    lb = rng.randint(40, 250, B)
    ac = np.zeros((B, la.max()), np.uint8)
    bc = np.zeros((B, lb.max()), np.uint8)
    for i in range(B):
        ac[i, : la[i]] = rng.randint(0, 4, la[i])  # ACGT only
        bc[i, : lb[i]] = rng.randint(0, 4, lb[i])
    al, bl = la.astype(np.int32), lb.astype(np.int32)
    exp = np.array(
        [oracle.edit_distance(ac[i, : al[i]], bc[i, : bl[i]])
         for i in range(B)]
    )
    got = batched_edit_distance_systolic(
        ac, bc, al, bl, block_words=2, sub_tile=2, text_chunk=64,
        interpret=True,
    )
    np.testing.assert_array_equal(got, exp)
    cache = DevicePoolCache()
    got2 = batched_edit_distance_systolic(
        ac, bc, al, bl, block_words=2, sub_tile=2, text_chunk=64,
        interpret=True, pool_cache=cache,
    )
    np.testing.assert_array_equal(got2, exp)
    assert (2, max(p for b, p in cache.pools)) in cache.pools or any(
        b == 2 for b, _ in cache.pools
    )  # the bits=2 pool class was actually used


def test_systolic_pool_height_ratchet():
    """Rounds with different shape maxima share ONE pool class (the
    ratchet): re-aligning a subset in a smaller round must HIT the
    class the bigger round populated instead of re-shipping into a new
    (bits, height) class."""
    from taxtk.ops import oracle
    from taxtk.ops.pallas_myers_systolic import (
        batched_edit_distance_systolic,
    )
    from taxtk.ops.seqpool import DevicePoolCache

    rng = np.random.RandomState(9)
    la = np.array([400, 350, 80, 60], np.int32)
    lb = np.array([380, 300, 90, 70], np.int32)
    ac = np.zeros((4, 400), np.uint8)
    bc = np.zeros((4, 380), np.uint8)
    for i in range(4):
        ac[i, : la[i]] = rng.randint(0, 4, la[i])
        bc[i, : lb[i]] = rng.randint(0, 4, lb[i])
    cache = DevicePoolCache()
    kw = dict(block_words=2, sub_tile=2, text_chunk=64, interpret=True,
              pool_cache=cache)
    got = batched_edit_distance_systolic(ac, bc, la, lb, **kw)
    exp = [oracle.edit_distance(ac[i, : la[i]], bc[i, : lb[i]])
           for i in range(4)]
    assert got.tolist() == exp
    n_classes = len(cache.pools)
    m0 = cache.misses
    # smaller round: only the short pairs — must hit the ratcheted class
    got2 = batched_edit_distance_systolic(
        ac[2:], bc[2:], la[2:], lb[2:], **kw)
    assert got2.tolist() == exp[2:]
    assert len(cache.pools) == n_classes  # no new class
    assert cache.misses == m0  # zero re-ships


def test_quant_chunks_ladder():
    """Quarter-octave chunk quantizer: exact <= 4, round-up, pad <= 25%,
    idempotent, and never below the needed count."""
    from taxtk.ops.pallas_myers import _quant_chunks

    for n in range(1, 5):
        assert _quant_chunks(n) == n
    for n in list(range(5, 600)) + [1023, 1025, 4097]:
        q = _quant_chunks(n)
        assert q >= n
        assert q / n <= 1.25
        assert _quant_chunks(q) == q  # ladder points are fixed points
        # ladder membership: m * 2^e with m in {4,5,6,7}
        m = q
        while m % 2 == 0 and m > 7:
            m //= 2
        assert m in (4, 5, 6, 7)
