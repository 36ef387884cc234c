"""Tests for the device-mesh pair-tile sharding (8 virtual CPU devices)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from pyani_plus_tpu.parallel.tiles import make_mesh

    return make_mesh(8)


def test_mesh_shape(mesh) -> None:
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("q", "s")


def test_sharded_counts_match_host(mesh) -> None:
    from pyani_plus_tpu.parallel.tiles import sharded_intersection_counts

    rng = np.random.default_rng(0)
    membership = (rng.random((13, 300)) < 0.1).astype(np.int8)
    counts = sharded_intersection_counts(membership, mesh)
    expected = membership.astype(np.int64) @ membership.astype(np.int64).T
    assert np.array_equal(counts, expected)


def test_graft_entry_single_chip() -> None:
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], args[0].shape[0])


def test_graft_dryrun_multichip() -> None:
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_owned_pairs_partition() -> None:
    from pyani_plus_tpu.parallel.tiles import owned_pairs

    n, hosts = 7, 3
    all_pairs = [p for h in range(hosts) for p in owned_pairs(n, h, hosts)]
    assert sorted(all_pairs) == [(q, s) for q in range(n) for s in range(n)]
