"""Cross-host shard fetch RPC: a ShardServer-backed sharded refpack must
yield byte-identical engine output to the monolithic local store (the
deploy topology from SURVEY §2.4: refpack shards owned by remote hosts,
only encoded segments on the wire)."""

import numpy as np

from taxtk.parallel.refpack import ShardedRefpackStore, split_refpack
from taxtk.parallel.shardserver import RemoteShardStore, ShardServer, connect_sharded
from taxtk.refpack.store import FaiIndex, IndexedFastaStore, InMemoryFastaStore

from test_refpack_shard import _mini_refpack, _run


def test_remote_store_primitives(tmp_path):
    tax, fa, mp, qf, rows, mapping = _mini_refpack(tmp_path)
    local = IndexedFastaStore(fa)
    server = ShardServer(local, host="127.0.0.1")
    server.serve_background()
    try:
        remote = RemoteShardStore("127.0.0.1", server.port)
        sid = next(iter(mapping))
        assert remote.sequence_length(sid) == local.sequence_length(sid)
        assert remote.get_sequence(sid, 5, 60) == local.get_sequence(sid, 5, 60)
        # unknown id surfaces as KeyError, connection stays usable
        try:
            remote.sequence_length("nope")
            assert False, "expected KeyError"
        except KeyError:
            pass
        assert remote.sequence_length(sid) == local.sequence_length(sid)

        specs = [(sid, 0, 50, False), (sid, 10, 80, True), (sid, 3, 40, False)]
        got = remote.fetch_encode_batch(specs)
        want = local.fetch_encode_batch(specs)
        for g, w in zip(got, want):
            assert np.array_equal(g, w)
        remote.close()
    finally:
        server.shutdown()


def test_remote_sharded_engine_parity(tmp_path):
    tax, fa, mp, qf, rows, mapping = _mini_refpack(tmp_path, seed=23)
    qstore = InMemoryFastaStore(qf)
    expected = _run(tax, qstore, IndexedFastaStore(fa), rows, mapping)
    assert expected.count("\n") > 1

    parts = split_refpack(fa, 2, str(tmp_path / "shards"), mapping_path=mp)
    servers = []
    try:
        endpoints = []
        for part_fa, _ in parts:
            FaiIndex.build(part_fa).save(part_fa + ".fai")
            srv = ShardServer(IndexedFastaStore(part_fa), host="127.0.0.1")
            srv.serve_background()
            servers.append(srv)
            endpoints.append(("127.0.0.1", srv.port))
        store = connect_sharded(endpoints)
        assert isinstance(store, ShardedRefpackStore)
        assert _run(tax, qstore, store, rows, mapping) == expected
    finally:
        for srv in servers:
            srv.shutdown()
