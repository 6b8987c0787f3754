"""MXU matmul count kernels (ops/mxu_count.py) vs numpy golden.

Runs through the Pallas interpreter on the CPU backend (the Mosaic kernels
themselves only compile on a real TPU; the measured A/Bs live in
experiments/mxu_*_ab.py).  _INTERPRET must be set before the first kernel
call — jit traces bake the flag in.
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


def _dev(hashes, valid):
    return (jnp.asarray(split_u64(hashes)),
            jnp.asarray(valid.astype(np.int32)))


def test_count_below_matches_golden(data):
    hashes, valid, needles, dists = data
    gold = ((dists < T) & valid[None, :]).sum(1)
    pairs, v32 = _dev(hashes, valid)
    got = np.asarray(mc.mxu_count_below(jnp.asarray(split_u64(needles)),
                                        pairs, v32, jnp.int32(T),
                                        bq=mc.BQ, bc=mc.BC))
    assert np.array_equal(got, gold)


def test_threshold_63_invalid_columns_never_hit(data):
    hashes, valid, needles, _ = data
    # worst-case threshold for the -128 validity penalty encoding
    pairs, v32 = _dev(hashes, valid)
    got = np.asarray(mc.mxu_count_below(
        jnp.asarray(split_u64(needles[:mc.BQ])), pairs, v32, jnp.int32(63),
        bq=mc.BQ, bc=mc.BC))
    dists = np.bitwise_count(
        needles[:mc.BQ, None] ^ hashes[None, :]).astype(np.int32)
    gold = ((dists < 63) & valid[None, :]).sum(1)
    assert np.array_equal(got, gold)


def test_self_tile_matches_vpu_semantics(data):
    hashes, valid, _, _ = data
    pairs, v32 = _dev(hashes, valid)
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
            acc, jnp.int32(rb), jnp.int32(cb), pairs, v32,
            jnp.int32(T), rows=rows, cols=cols, masked=masked))
        assert np.array_equal(got, gold), (rb, cb, masked)


def test_self_tile_narrow_cols(data):
    # cols a BC_MASKED multiple but NOT a BC multiple: the unmasked branch
    # must drop to the narrow column block instead of silently truncating
    # the kernel grid (cols // BC == 0 would never run the kernel body)
    hashes, valid, _, _ = data
    pairs, v32 = _dev(hashes, valid)
    dists = np.bitwise_count(
        hashes[:, None] ^ hashes[None, :]).astype(np.int32)
    rows, cols, rb, cb = 512, 2048, 2048, 0
    assert cols % mc.BC_MASKED == 0 and cols % mc.BC
    tile = (dists[rb:rb + rows, cb:cb + cols] < T) \
        & valid[None, cb:cb + cols] & valid[rb:rb + rows, None]
    got = np.asarray(mc.mxu_self_tile(
        jnp.zeros(rows, jnp.int32), jnp.int32(rb), jnp.int32(cb), pairs,
        v32, jnp.int32(T), rows=rows, cols=cols, masked=False))
    assert np.array_equal(got, tile.sum(1))


def test_nondivisible_operands_raise(data):
    hashes, valid, needles, _ = data
    pairs, v32 = _dev(hashes, valid)
    with pytest.raises(AssertionError):
        mc.mxu_count_below(jnp.asarray(split_u64(needles[:100])), pairs,
                           v32, jnp.int32(T), bq=mc.BQ, bc=mc.BC)
    with pytest.raises(AssertionError):
        mc.mxu_count_below(jnp.asarray(split_u64(needles[:mc.BQ])),
                           pairs[:3000], v32[:3000], jnp.int32(T),
                           bq=mc.BQ, bc=mc.BC)


def test_count_below_padded_matches_golden(data):
    hashes, valid, needles, dists = data
    # a needle batch that is not a BQ multiple pads up and slices back
    q = mc.BQ + 37
    gold = ((dists[:q] < T) & valid[None, :]).sum(1)
    pairs, v32 = _dev(hashes, valid)
    got = np.asarray(mc.count_below_padded(split_u64(needles[:q]), pairs,
                                           v32, T))
    assert np.array_equal(got, gold)


def test_triangle_matches_golden(data):
    hashes, valid, _, _ = data
    pairs, v32 = _dev(hashes, valid)
    dists = np.bitwise_count(
        hashes[:, None] ^ hashes[None, :]).astype(np.int32)
    tri = ((dists < T) & valid[None, :]
           & (np.arange(N)[None, :] > np.arange(N)[:, None]))
    rows = 2048
    got = np.concatenate([
        np.asarray(mc.mxu_count_triangle(
            pairs[rb:rb + rows], pairs, v32, jnp.int32(T),
            jnp.int32(rb), jnp.int32(0), bq=mc.BQ, bc=mc.BC_MASKED))
        for rb in range(0, N, rows)])
    # mxu_count_triangle does NOT mask needle-row validity (mxu_self_tile
    # zeroes those after) — the golden here applies column validity only
    assert np.array_equal(got, tri.sum(1))


def test_mxu_enabled_gates(monkeypatch):
    # CPU backend: always disabled (Mosaic needs a TPU); plus env and
    # divisibility gates; CBIRD_MXU=force bypasses the backend check
    assert not mc.mxu_enabled(1 << 20)
    monkeypatch.setenv("CBIRD_MXU", "force")
    assert mc.mxu_enabled(1 << 20)
    assert not mc.mxu_enabled(1000)       # not a BC multiple
    monkeypatch.setenv("CBIRD_MXU", "off")
    assert not mc.mxu_enabled(1 << 20)
