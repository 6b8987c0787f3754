"""Sharded search over the 8-virtual-device CPU mesh: results must equal the
single-device scan bit-for-bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import split_u64
from cbird_tpu.ops.hamming import hamming_topk
from cbird_tpu.parallel.sharded import (make_mesh, shard_index_arrays,
                                        sharded_all_pairs_step,
                                        sharded_hamming_topk)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("batch", "index")
    assert mesh.devices.shape == (2, 4)


def test_sharded_matches_single(mesh, rng):
    n = 4096  # divisible by index axis (4)
    q = 16
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    needles = np.concatenate([haystack[:8], rng.integers(1, 2**63, 8, np.uint64)])
    hs = split_u64(haystack)
    ns = split_u64(needles)
    valid = np.ones(n, dtype=bool)

    d1, i1 = hamming_topk(jnp.asarray(ns), jnp.asarray(hs), jnp.asarray(valid), k=8)
    hs_d, vs_d = shard_index_arrays(mesh, hs, valid)
    d2, i2 = sharded_hamming_topk(mesh, jnp.asarray(ns), hs_d, vs_d, k=8)

    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    # exact self matches must resolve to identical rows
    assert np.array_equal(np.asarray(i1)[:8, 0], np.asarray(i2)[:8, 0])


def test_sharded_all_pairs(mesh, rng):
    n = 1024
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hs = split_u64(haystack)
    valid = np.ones(n, dtype=bool)
    # needles = the haystack itself (self-similar), sharded over batch
    d, i = sharded_all_pairs_step(mesh, jnp.asarray(hs), jnp.asarray(hs),
                                  jnp.asarray(valid), k=4)
    d, i = np.asarray(d), np.asarray(i)
    assert d.shape == (n, 4)
    # every needle's best match is itself at distance 0
    assert (d[:, 0] == 0).all()
    assert (i[:, 0] == np.arange(n)).all()


def test_sharded_tombstones(mesh, rng):
    n = 2048
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hs = split_u64(haystack)
    valid = np.ones(n, dtype=bool)
    valid[:1024] = False
    hs_d, vs_d = shard_index_arrays(mesh, hs, valid)
    ns = split_u64(haystack[:4])  # tombstoned needles
    d, i = sharded_hamming_topk(mesh, jnp.asarray(ns), hs_d, vs_d, k=4)
    i = np.asarray(i)
    assert (i >= 1024).all()  # no tombstoned row ever returned


def test_multihost_helpers():
    """Single-process degeneration of the multi-host API (full DCN path
    needs real pods; here init is a no-op and the mesh falls back)."""
    import jax
    from cbird_tpu.parallel.sharded import init_distributed, make_multihost_mesh
    assert init_distributed() == 1  # no coordinator configured → local only
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("batch", "index")
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
