"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from taxtk.parallel.mesh import make_mesh, dryrun_step
from taxtk.ops import oracle
from fixture_tax import make_taxonomy


@pytest.fixture(scope="module")
def tax():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        yield make_taxonomy(td, prune=True)


def _expected(data, tax):
    """Reference semantics recomputed serially on host."""
    B, S, L = data["refs"].shape
    best_dist = np.zeros(B, np.int32)
    best_slot = np.zeros(B, np.int32)
    lca = np.zeros(B, np.int32)
    for i in range(B):
        dists = np.array(
            [
                oracle.edit_distance(
                    data["queries"][i, : data["q_len"][i]],
                    data["refs"][i, s, : data["r_len"][i, s]],
                )
                for s in range(S)
            ]
        )
        order = sorted(
            range(S), key=lambda s: (dists[s], -int(data["r_ident"][i, s]), s)
        )
        best = order[0]
        best_dist[i] = dists[best]
        best_slot[i] = best
        co = [int(data["r_node"][i, s]) for s in range(S) if dists[s] <= dists[best]]
        lca[i] = tax.lca_reduce(co)
    return best_dist, best_slot, lca


@pytest.mark.parametrize("n,tp", [(8, 2), (8, 1), (4, 2), (2, 1)])
def test_dryrun_matches_serial(tax, n, tp):
    if len(jax.devices()) < n:
        pytest.skip("not enough devices")
    mesh = make_mesh(n, tp=tp)
    bd, bs, lc, data = dryrun_step(mesh, tax.path)
    ebd, ebs, elc = _expected(data, tax)
    np.testing.assert_array_equal(bd, ebd)
    np.testing.assert_array_equal(bs, ebs)
    np.testing.assert_array_equal(lc, elc)


def test_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
