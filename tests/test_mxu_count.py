"""MXU matmul count kernels (ops/mxu_count.py) vs numpy golden.

Runs through the Pallas interpreter on the CPU backend (the Mosaic kernels
themselves only compile on a real TPU; the measured A/B lives in
experiments/mxu_count_ab.py).  _INTERPRET must be set before the first
kernel call — jit traces bake the flag in.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cbird_tpu.ops import mxu_count as mc
from cbird_tpu.ops.hamming import split_u64

mc._INTERPRET = True

N, Q, T = 8192, 512, 7


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 2**64, size=N, dtype=np.uint64)
    valid = rng.random(N) > 0.05
    needles = hashes[rng.integers(0, N, Q)] ^ (
        np.uint64(1) << rng.integers(0, 64, Q).astype(np.uint64))
    dists = np.bitwise_count(
        needles[:, None] ^ hashes[None, :]).astype(np.int32)
    return hashes, valid, needles, dists


def test_count_below_matches_golden(data):
    hashes, valid, needles, dists = data
    gold = ((dists < T) & valid[None, :]).sum(1)
    a = mc.unpack_pm1(jnp.asarray(split_u64(needles)), penalty_col=False)
    bt = mc.unpack_haystack_t(jnp.asarray(split_u64(hashes)),
                              jnp.asarray(valid))
    got = np.asarray(mc.mxu_count_below(a, bt, jnp.int32(T),
                                        bq=mc.BQ, bc=mc.BC))
    assert np.array_equal(got, gold)


def test_threshold_63_invalid_columns_never_hit(data):
    hashes, valid, needles, _ = data
    # worst-case threshold for the -128 validity penalty encoding
    a = mc.unpack_pm1(jnp.asarray(split_u64(needles[:mc.BQ])),
                      penalty_col=False)
    bt = mc.unpack_haystack_t(jnp.asarray(split_u64(hashes)),
                              jnp.asarray(valid))
    got = np.asarray(mc.mxu_count_below(a, bt, jnp.int32(63),
                                        bq=mc.BQ, bc=mc.BC))
    dists = np.bitwise_count(
        needles[:mc.BQ, None] ^ hashes[None, :]).astype(np.int32)
    gold = ((dists < 63) & valid[None, :]).sum(1)
    assert np.array_equal(got, gold)


def test_self_tile_matches_vpu_semantics(data):
    hashes, valid, _, _ = data
    pairs = jnp.asarray(split_u64(hashes))
    valid_dev = jnp.asarray(valid)
    a_all = mc.unpack_pm1(pairs, penalty_col=False)
    bt_all = mc.unpack_haystack_t(pairs, valid_dev)
    dists = np.bitwise_count(
        hashes[:, None] ^ hashes[None, :]).astype(np.int32)
    rows, cols = 512, 4096
    for rb, cb, masked in [(0, 0, True), (512, 0, False), (512, 4096, True),
                           (7680, 4096, True)]:
        tile = dists[rb:rb + rows, cb:cb + cols] < T
        tile = tile & valid[None, cb:cb + cols] & valid[rb:rb + rows, None]
        if masked:
            col_ids = np.arange(cb, cb + cols)
            row_ids = np.arange(rb, rb + rows)
            tile = tile & (col_ids[None, :] > row_ids[:, None])
        gold = tile.sum(1)
        acc = jnp.zeros(rows, jnp.int32)
        got = np.asarray(mc.mxu_self_tile(
            acc, jnp.int32(rb), jnp.int32(cb), a_all, bt_all, valid_dev,
            jnp.int32(T), rows=rows, cols=cols, masked=masked))
        assert np.array_equal(got, gold), (rb, cb, masked)


def test_self_rows_matches_golden(data):
    hashes, valid, _, _ = data
    pairs = jnp.asarray(split_u64(hashes))
    valid_dev = jnp.asarray(valid)
    a_all = mc.unpack_pm1(pairs, penalty_col=False)
    bt_all = mc.unpack_haystack_t(pairs, valid_dev)
    dists = np.bitwise_count(
        hashes[:, None] ^ hashes[None, :]).astype(np.int32)
    tri = ((dists < T) & valid[None, :] & valid[:, None]
           & (np.arange(N)[None, :] > np.arange(N)[:, None]))
    gold = tri.sum(1)
    rows = 2048
    got = np.concatenate([
        np.asarray(mc.mxu_self_rows(a_all, bt_all, valid_dev, jnp.int32(T),
                                    jnp.int32(rb), rows=rows))
        for rb in range(0, N, rows)])
    assert np.array_equal(got, gold)


def test_mxu_enabled_gates(monkeypatch):
    # CPU backend: always disabled (Mosaic needs a TPU); plus env,
    # divisibility and memory-cap gates
    assert not mc.mxu_enabled(1 << 20)
    monkeypatch.setenv("CBIRD_MXU", "off")
    assert not mc.mxu_enabled(1 << 20)
    monkeypatch.delenv("CBIRD_MXU")
    assert not mc.mxu_enabled(1000)       # not a BC multiple
    assert not mc.mxu_enabled(1 << 25)    # over the memory cap
