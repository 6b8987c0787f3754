"""Pallas fused Hamming top-k kernel: exactness vs the numpy reference
(interpret mode — the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import split_u64
from cbird_tpu.ops.pallas_hamming import hamming_topk_pallas


def _np_dists(needles, haystack):
    x = needles[:, None] ^ haystack[None, :]
    return np.array([[bin(int(v)).count("1") for v in row] for row in x],
                    dtype=np.int32)


@pytest.fixture(scope="module")
def data(rng):
    n, q = 2048, 128
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    needles = np.concatenate([haystack[:8],
                              rng.integers(1, 2**63, q - 8, np.uint64)])
    return haystack, needles


def test_pallas_matches_reference(data, rng):
    haystack, needles = data
    valid = np.ones(len(haystack), np.int32)
    valid[50:60] = 0
    k = 8
    d, i = hamming_topk_pallas(jnp.asarray(split_u64(needles)),
                               jnp.asarray(split_u64(haystack)),
                               jnp.asarray(valid), k=k, tq=64, tn=512,
                               interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    ref = _np_dists(needles[:16], haystack)
    ref[:, valid == 0] = 0x7FFF
    for q in range(16):
        assert list(d[q]) == list(np.sort(ref[q])[:k])
        for t in range(k):
            if d[q, t] < 0x7FFF:
                assert ref[q, i[q, t]] == d[q, t]
    # ascending + self matches
    assert (np.diff(d, axis=1) >= 0).all()
    assert (d[:8, 0] == 0).all()
    assert (i[:8, 0] == np.arange(8)).all()


def test_pallas_multi_chunk_accumulation(data):
    """Results must be identical regardless of haystack tiling."""
    haystack, needles = data
    valid = np.ones(len(haystack), np.int32)
    args = (jnp.asarray(split_u64(needles)), jnp.asarray(split_u64(haystack)),
            jnp.asarray(valid))
    d1, i1 = hamming_topk_pallas(*args, k=6, tq=128, tn=2048, interpret=True)
    d2, i2 = hamming_topk_pallas(*args, k=6, tq=64, tn=256, interpret=True)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
