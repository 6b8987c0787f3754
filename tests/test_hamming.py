"""Hamming scan kernel + packed store: brute-force numpy equivalence,
threshold semantics, tombstone removal, slice (reference Index contract,
src/index.h:237-270; baseTestAddRemove in unit/testindexbase.cpp)."""

import numpy as np
import pytest

from cbird_tpu.ops.dct_hash import split_u64
from cbird_tpu.ops.hamming import (BAD_DIST, PackedHashStore, hamming_count_below,
                                   hamming_topk)
from cbird_tpu.ops.ref_numpy import hamming64

import jax.numpy as jnp


def _rand_hashes(rng, n):
    return rng.integers(1, 2**64, size=n, dtype=np.uint64)


def _np_dists(needles, haystack):
    x = needles[:, None] ^ haystack[None, :]
    return np.array([[bin(int(v)).count("1") for v in row] for row in x],
                    dtype=np.int32)


def test_topk_matches_numpy(rng):
    needles = _rand_hashes(rng, 7)
    haystack = _rand_hashes(rng, 300)
    d, i = hamming_topk(jnp.asarray(split_u64(needles)),
                        jnp.asarray(split_u64(haystack)),
                        jnp.ones(300, bool), k=10)
    d, i = np.asarray(d), np.asarray(i)
    want = _np_dists(needles, haystack)
    for q in range(7):
        expect = np.sort(want[q])[:10]
        assert list(d[q]) == list(expect)
        # indices give those distances
        assert all(want[q, i[q][j]] == d[q][j] for j in range(10))


def test_topk_streaming_chunks(rng):
    """multi-chunk scan path must agree with the single-block path."""
    needles = _rand_hashes(rng, 5)
    haystack = _rand_hashes(rng, 700)
    nv = jnp.asarray(split_u64(needles))
    hv = jnp.asarray(split_u64(haystack))
    valid = jnp.ones(700, bool)
    d1, i1 = hamming_topk(nv, hv, valid, k=8)
    d2, i2 = hamming_topk(nv, hv, valid, k=8, chunk=128)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    # indices may differ among equal distances; distances must agree


def test_topk_invalid_masked(rng):
    needles = _rand_hashes(rng, 3)
    haystack = np.concatenate([needles, _rand_hashes(rng, 20)])
    valid = np.ones(23, bool)
    valid[:3] = False  # exact matches are tombstoned
    d, i = hamming_topk(jnp.asarray(split_u64(needles)),
                        jnp.asarray(split_u64(haystack)),
                        jnp.asarray(valid), k=23)
    d = np.asarray(d)
    # distance-0 self matches must not appear
    for q in range(3):
        assert d[q][0] > 0 or int(needles[q]) in list(haystack[3:])


def test_count_below(rng):
    needles = _rand_hashes(rng, 4)
    haystack = _rand_hashes(rng, 500)
    got = np.asarray(hamming_count_below(
        jnp.asarray(split_u64(needles)), jnp.asarray(split_u64(haystack)),
        jnp.ones(500, bool), jnp.int32(30), chunk=128))
    want = (_np_dists(needles, haystack) < 30).sum(axis=1)
    assert list(got) == list(want)


def test_store_search_threshold(rng):
    base = _rand_hashes(rng, 100)
    ids = np.arange(1, 101, dtype=np.uint32)
    store = PackedHashStore(base, ids)
    # needle = perturbed copy of item 5 (flip 3 bits)
    needle = int(base[4]) ^ 0b10110
    res = store.search(np.array([needle], dtype=np.uint64), threshold=5)
    rids, rdists = res[0]
    assert 5 in rids
    assert rdists[list(rids).index(5)] == 3
    # ascending distances
    assert list(rdists) == sorted(rdists)


def test_store_add_remove_readd(rng):
    """remove 3 → absent from results → re-add → results identical
    (reference baseTestAddRemove)."""
    base = _rand_hashes(rng, 60)
    ids = np.arange(1, 61, dtype=np.uint32)
    store = PackedHashStore(base, ids)
    needles = base[:6]
    before = store.search(needles, threshold=65, k=60)

    kill = [2, 3, 4]
    store.remove(kill)
    during = store.search(needles, threshold=65, k=60)
    for rids, _ in during:
        assert not (set(kill) & set(rids.tolist()))

    store.add(base[1:4], ids[1:4])  # ids 2,3,4
    after = store.search(needles, threshold=65, k=60)
    for (ra, da), (rb, db) in zip(before, after):
        assert sorted(ra.tolist()) == sorted(rb.tolist())
        assert sorted(da.tolist()) == sorted(db.tolist())


def test_store_slice(rng):
    base = _rand_hashes(rng, 50)
    ids = np.arange(1, 51, dtype=np.uint32)
    store = PackedHashStore(base, ids)
    sub = store.slice({10, 11, 12})
    assert len(sub) == 3
    res = sub.search(np.array([base[9]], dtype=np.uint64), threshold=1)
    rids, rdists = res[0]
    assert list(rids) == [10] and list(rdists) == [0]


def test_store_empty():
    store = PackedHashStore()
    assert len(store) == 0
    res = store.search(np.array([123], dtype=np.uint64), threshold=5)
    assert len(res) == 1 and len(res[0][0]) == 0


def test_lanes_topk_matches_numpy(rng):
    """256-bit multi-lane scan (orb descriptors): parity with numpy."""
    from cbird_tpu.ops.hamming import hamming_lanes_topk
    n, q = 300, 5
    hay = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    needles = np.concatenate([hay[:2], rng.integers(0, 2**32, (q - 2, 8),
                                                    dtype=np.uint32)])
    d, i = hamming_lanes_topk(jnp.asarray(needles), jnp.asarray(hay),
                              jnp.ones(n, bool), k=7)
    d, i = np.asarray(d), np.asarray(i)
    pa = np.unpackbits(needles.view(np.uint8).reshape(q, 32), axis=1)
    pb = np.unpackbits(hay.view(np.uint8).reshape(n, 32), axis=1)
    ref = (pa[:, None, :] != pb[None, :, :]).sum(-1)
    for t in range(q):
        assert list(d[t]) == list(np.sort(ref[t])[:7])
    assert d[0, 0] == 0 and i[0, 0] == 0


def test_lanes_topk_streaming(rng):
    """Chunked scan path must agree with single-block (approx on CPU falls
    back to exact, so distances are identical)."""
    from cbird_tpu.ops.hamming import hamming_lanes_topk
    n = 1000
    hay = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    needles = hay[:4]
    args = (jnp.asarray(needles), jnp.asarray(hay), jnp.ones(n, bool))
    d1, _ = hamming_lanes_topk(*args, k=5, chunk=4096)
    d2, _ = hamming_lanes_topk(*args, k=5, chunk=250)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))


def _single_device(monkeypatch):
    """Force the single-device CLASSIC triangle path: the test conftest
    creates 8 virtual cpu devices, which would engage the sharded fallback;
    the pigeonhole count phase (covered by test_pigeonhole.py) is disabled
    so these keep exercising the tiled triangle."""
    from cbird_tpu.ops import hamming, pigeonhole
    monkeypatch.setattr(hamming, "_MESH", None)
    monkeypatch.setattr(pigeonhole, "enabled", lambda: False)


def _assert_self_parity(ref, tri):
    """tri must equal the plain path except that needles whose only hit is
    themselves are gated to empty (the plain small-n path reports the lone
    self-hit; filterSelf drops it downstream either way)."""
    assert len(ref) == len(tri)
    for row, ((ri, rd), (ti, td)) in enumerate(zip(ref, tri)):
        if len(ri) <= 1:
            assert len(ti) == 0 or np.array_equal(ri, ti), row
        else:
            assert np.array_equal(ri, ti), row
            assert np.array_equal(rd, td), row


def test_search_self_matches_search(rng, monkeypatch):
    """The triangular self-search path returns what the plain two-phase
    path returns for needles == store (N² -similar)."""
    _single_device(monkeypatch)
    n = 3000
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # plant dup clusters in both directions across block boundaries
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    ids = np.arange(1, n + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    ref = store.search(hashes, 5, k=64, min_hits=2)
    tri = store.search_self(5, k=64, rows=512, cols=1024, min_n=0)
    _assert_self_parity(ref, tri)
    # hits exist and include a planted pair both directions
    assert 5 + 1 in tri[2900][0] and 2900 + 1 in tri[5][0]
    # a mirrored-only needle (all its dups are earlier rows) keeps its hits
    assert 2950 + 1 in tri[10][0] or 10 + 1 in tri[2950][0]


def test_search_self_tombstones(rng, monkeypatch):
    """Tombstoned rows neither match nor emit as needles in self-search."""
    _single_device(monkeypatch)
    n = 2048
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hashes[7] = hashes[1000]  # exact dup pair
    hashes[500] = hashes[1500]
    store = PackedHashStore(hashes, np.arange(1, n + 1, dtype=np.uint32))
    store.remove([501, 1501])  # kill one dup pair entirely
    tri = store.search_self(5, k=16, rows=256, cols=512, min_n=0)
    ref = store.search(store.hashes, 5, k=16, min_hits=2)
    _assert_self_parity(ref, tri)
    assert 1001 in tri[7][0] and 8 in tri[1000][0]
    assert len(tri[500][0]) == 0 and len(tri[1500][0]) == 0


def test_search_self_recall_miss_repair(rng, monkeypatch):
    """A dropped approx_min_k hit (simulated) must be caught by the exact
    count-phase invariant and repaired by the recall=1.0 rescan — without
    it, a mirrored-only needle silently loses its only match."""
    _single_device(monkeypatch)
    n = 2048
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hashes[1900] = hashes[3] ^ np.uint64(1)  # the pair the scan will "miss"
    store = PackedHashStore(hashes, np.arange(1, n + 1, dtype=np.uint32))

    real = PackedHashStore._topk_call

    def flaky(nb, pairs_dev, valid_dev, k, recall=0.99):
        d, i = real(nb, pairs_dev, valid_dev, k, recall)
        if recall < 1.0:  # approx scans always drop row 1900; exact keeps it
            d = np.asarray(d).copy()
            i = np.asarray(i)
            d[i == 1900] = 0x7FFF
        return d, i

    monkeypatch.setattr(PackedHashStore, "_topk_call", staticmethod(flaky))
    tri = store.search_self(5, k=16, rows=256, cols=512, min_n=0)
    assert 1901 in tri[3][0], "invariant rescan failed to restore the hit"
    assert 4 in tri[1900][0], "mirror lost the repaired pair"


def test_search_self_big_cluster_overflow(rng, monkeypatch):
    """A duplicate cluster larger than k: saturated source lists must be
    escalated so mirrored-only needles (e.g. the cluster's last row) don't
    silently lose their matches to the k cap."""
    _single_device(monkeypatch)
    n = 2048
    k = 8
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    base = int(hashes[100])
    for r in range(101, 131):  # 31-member near-identical cluster
        hashes[r] = np.uint64(base ^ (1 << int(rng.integers(0, 64))))
    store = PackedHashStore(hashes, np.arange(1, n + 1, dtype=np.uint32))
    ref = store.search(hashes, 5, k=k, min_hits=2)
    tri = store.search_self(5, k=k, rows=256, cols=512, min_n=0)
    _assert_self_parity(ref, tri)
    # the last cluster row has only earlier duplicates and k-saturated
    # sources: it must still see its k nearest
    assert len(tri[130][0]) == k


def test_store_search_count_phase_gate(rng):
    """Stores above the count-phase gate (n > 4096, q > 64): the tiled
    count must gate exactly the needles with a non-self hit."""
    n = 6000
    hashes = _rand_hashes(rng, n)
    hashes[5000] = hashes[17] ^ np.uint64(1 << 3)
    store = PackedHashStore(hashes, np.arange(1, n + 1, dtype=np.uint32))
    res = store.search(hashes, 5, k=16, min_hits=2)
    assert [i for i, (ids, _) in enumerate(res) if len(ids)] == [17, 5000]
    assert set(res[17][0]) == {18, 5001}
    assert set(res[5000][0]) == {18, 5001}
    assert np.array_equal(res[17][1], np.array([0, 1], np.int32))


def test_search_self_sharded_matches_plain(rng):
    """On a multi-device mesh (the conftest provides 8 virtual cpu
    devices) search_self runs the balanced sharded triangle: replicated
    haystack, one tile per chip per step, per-chip local counts
    (parallel/sharded.py sharded_self_count).  Results must match the
    plain sharded path."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = 3000
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    store = PackedHashStore(hashes, np.arange(1, n + 1, dtype=np.uint32))
    ref = store.search(hashes, 5, k=64, min_hits=2)
    tri = store.search_self(5, k=64, rows=512, cols=1024, min_n=0)
    _assert_self_parity(ref, tri)
    assert 5 + 1 in tri[2900][0] and 2950 + 1 in tri[10][0]

