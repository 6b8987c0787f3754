"""Pigeonhole count-phase tests: exactness vs a numpy golden and parity of
the routed search_self against the plain two-phase search (the reference's
N² -similar semantics, /root/reference/src/database.cpp:1280-1466)."""

import numpy as np
import pytest

from cbird_tpu.ops import pigeonhole
from cbird_tpu.ops.dct_hash import split_u64
from cbird_tpu.ops.hamming import PackedHashStore

import jax.numpy as jnp


def _golden_counts(hashes: np.ndarray, valid: np.ndarray, t: int) -> np.ndarray:
    """counts[i] = #{j > i : valid both, popcount(h_i ^ h_j) < t}."""
    x = hashes[:, None] ^ hashes[None, :]
    d = np.zeros(x.shape, np.int32)
    for shift in range(0, 64, 8):
        d += np.unpackbits(
            ((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.uint8)
        ).reshape(*x.shape, 8).sum(axis=-1, dtype=np.int32)
    hit = (d < t) & valid[:, None] & valid[None, :]
    hit &= np.triu(np.ones(x.shape, bool), k=1)
    return hit.sum(axis=1).astype(np.int32)


def _counts(hashes, valid, t, **kw):
    pairs = jnp.asarray(split_u64(hashes))
    return pigeonhole.self_counts(pairs, jnp.asarray(valid), t,
                                  int(valid.sum()), **kw)


def test_block_masks_partition():
    for t in range(1, 9):
        masks = pigeonhole.block_masks(t)
        assert len(masks) == t
        acc_lo = acc_hi = 0
        for lo, hi in masks:
            assert acc_lo & lo == 0 and acc_hi & hi == 0  # disjoint
            acc_lo |= lo
            acc_hi |= hi
        assert acc_lo == acc_hi == 0xFFFFFFFF  # complete


@pytest.mark.parametrize("t", [1, 2, 5, 8])
def test_counts_match_golden(rng, t):
    n = 4096  # == MIN_STORE so the store isn't gated away
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # plant clusters at distances straddling every threshold
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        h = int(hashes[src])
        for b in rng.choice(64, size=int(rng.integers(0, t)), replace=False):
            h ^= 1 << int(b)
        hashes[dst] = np.uint64(h)
    hashes[7] = hashes[8]  # exact dup
    valid = np.ones(n, bool)
    got = _counts(hashes, valid, t, s=256)
    assert got is not None
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, t))


def test_counts_tombstones(rng):
    n = 4096
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hashes[100] = hashes[2000]
    hashes[101] = hashes[2001]
    valid = np.ones(n, bool)
    valid[2001] = False  # kill one side of a dup pair
    valid[rng.choice(n, size=500, replace=False)] = False
    got = _counts(hashes, valid, 5, s=256)
    assert got is not None
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, 5))


def test_counts_oversized_runs(rng):
    """A giant equal-key cluster (longer than the band tile) must be fully
    counted via the dense run tiles — the skew case the band alone misses."""
    n = 8192
    s = 256
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    base = int(hashes[0])
    # 1500-member cluster of distance ≤ 2 neighbors: every pair within
    # distance 4 < 5, and in the t=5 block sort most land in one giant run
    idx = rng.choice(n, size=1500, replace=False)
    for i in idx:
        h = base
        for b in rng.choice(64, size=int(rng.integers(0, 3)), replace=False):
            h ^= 1 << int(b)
        hashes[i] = np.uint64(h)
    valid = np.ones(n, bool)
    got = _counts(hashes, valid, 5, s=s)
    assert got is not None
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, 5))


def test_counts_budget_fallback(rng):
    """When nearly the whole store is one equal-key run the dense tiles
    would re-create the full triangle — self_counts must decline (None)."""
    n = 8192
    hashes = np.full(n, 0x1234_5678_9ABC_DEF0, np.uint64)
    valid = np.ones(n, bool)
    got = _counts(hashes, valid, 5, s=256)
    assert got is None


@pytest.mark.parametrize("t", [1, 5])
def test_pallas_band_matches_xla(rng, monkeypatch, t):
    """The Pallas band kernel (interpret mode on CPU) must reproduce the
    XLA band-chunk contributions bit-exactly, including dedup masks,
    attribution, validity, and the window position mask."""
    from cbird_tpu.ops import pallas_band
    monkeypatch.setattr(pallas_band, "_INTERPRET", True)
    n, s = 2048, 256
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 1900), (950, 10), (100, 101)]:
        h = int(hashes[src])
        for b in rng.choice(64, size=int(rng.integers(0, t)), replace=False):
            h ^= 1 << int(b)
        hashes[dst] = np.uint64(h)
    hashes[7] = hashes[8]
    valid = np.ones(n, bool)
    valid[rng.choice(n, size=200, replace=False)] = False
    pairs = jnp.asarray(split_u64(hashes))
    masks = pigeonhole.block_masks(t)
    width = -(-64 // t)
    for b, mask_cur in enumerate(masks):
        slo, shi, srow, svalid, _, _, _ = pigeonhole._prep_block(
            pairs, jnp.asarray(valid), mask_cur, width, s=s)
        ref = jnp.zeros(n + s, jnp.int32)
        for p0 in range(0, n, 4 * s):
            ref = pigeonhole._band_chunk(
                ref, slo, shi, srow, svalid, jnp.int32(p0),
                mask_cur=mask_cur, mask_prev=masks[:b], s=s, g=4, t=t)
        marr = np.zeros((t, 2), np.uint32)
        marr[0] = mask_cur
        for p, m in enumerate(masks[:b]):
            marr[1 + p] = m
        got = pigeonhole._band_epilogue(
            pallas_band.band_counts(
                slo, shi, srow, svalid, jnp.asarray(marr),
                jnp.int32(t), s=s, t_blocks=t), s=s)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"block {b}")


def test_self_counts_pallas_band_golden(rng, monkeypatch):
    """self_counts with the Pallas band forced (interpret mode) stays
    exact end-to-end, including the adaptive per-block band pick."""
    from cbird_tpu.ops import pallas_band
    monkeypatch.setattr(pallas_band, "_INTERPRET", True)
    monkeypatch.setenv("CBIRD_PALLAS_BAND", "force")
    n = 4096
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    hashes[7] = hashes[8]
    valid = np.ones(n, bool)
    valid[rng.choice(n, size=300, replace=False)] = False
    got = _counts(hashes, valid, 5, s=256)
    assert got is not None
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, 5))


def test_sparse_matches_full(rng):
    """self_counts_sparse (packed-bitmask readback) returns exactly the
    nonzero rows + counts of the full readback, including the adaptive
    per-block band pick (no explicit s)."""
    n = 4096
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    hashes[7] = hashes[8]
    valid = np.ones(n, bool)
    valid[rng.choice(n, size=300, replace=False)] = False
    pairs = jnp.asarray(split_u64(hashes))
    full = pigeonhole.self_counts(pairs, jnp.asarray(valid), 5,
                                  int(valid.sum()))
    sp = pigeonhole.self_counts_sparse(pairs, jnp.asarray(valid), 5,
                                       int(valid.sum()))
    assert (full is None) == (sp is None)
    if full is None:
        pytest.skip("adaptive pick declined at this size")
    hot, hot_counts = sp
    np.testing.assert_array_equal(hot, np.nonzero(full)[0])
    np.testing.assert_array_equal(hot_counts, full[hot])
    np.testing.assert_array_equal(full, _golden_counts(hashes, valid, 5))


def test_gates():
    pairs = jnp.zeros((2048, 2), jnp.uint32)
    valid = jnp.ones(2048, bool)
    assert pigeonhole.self_counts(pairs, valid, 5, 2048) is None  # small
    big = jnp.zeros((4096, 2), jnp.uint32)
    bigv = jnp.ones(4096, bool)
    assert pigeonhole.self_counts(big, bigv, 9, 4096) is None  # t too big
    assert pigeonhole.self_counts(big, bigv, 0, 4096) is None


def test_search_self_routes_pigeonhole(rng, monkeypatch):
    """search_self with the pigeonhole count phase returns exactly what the
    plain two-phase path returns (same parity contract as the classic
    triangle tests in test_hamming.py)."""
    from cbird_tpu.ops import hamming
    monkeypatch.setattr(hamming, "_MESH", None)
    monkeypatch.setattr(pigeonhole, "MIN_STORE", 1024)
    calls = []
    real = pigeonhole.self_counts_sparse

    def spy(*a, **kw):
        out = real(*a, **kw)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(pigeonhole, "self_counts_sparse", spy)
    n = 3000
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    ids = np.arange(1, n + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    ref = store.search(hashes, 5, k=64, min_hits=2)
    tri = store.search_self(5, k=64, min_n=0)
    assert calls == [True], "pigeonhole path was not taken"
    for row, ((ri, rd), (ti, td)) in enumerate(zip(ref, tri)):
        if len(ri) <= 1:
            assert len(ti) == 0 or np.array_equal(ri, ti), row
        else:
            assert np.array_equal(ri, ti) and np.array_equal(rd, td), row
    assert 5 + 1 in tri[2900][0] and 2900 + 1 in tri[5][0]
    assert 2950 + 1 in tri[10][0] or 10 + 1 in tri[2950][0]


def _golden_hits(hashes, valid, t, row):
    """All partners j != row with d < t (both valid), sorted by (d, j)."""
    x = hashes ^ hashes[row]
    d = np.zeros(x.shape, np.int32)
    for shift in range(0, 64, 8):
        d += np.unpackbits(
            ((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.uint8)
        ).reshape(*x.shape, 8).sum(axis=-1, dtype=np.int32)
    j = np.nonzero((d < t) & valid)[0]
    order = np.lexsort((j, d[j]))
    return j[order], d[j][order]


@pytest.mark.parametrize("t", [1, 5, 8])
def test_extract_hits_match_golden(rng, t):
    n = 4096
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        h = int(hashes[src])
        for b in rng.choice(64, size=int(rng.integers(0, t)), replace=False):
            h ^= 1 << int(b)
        hashes[dst] = np.uint64(h)
    hashes[7] = hashes[8]
    valid = np.ones(n, bool)
    valid[rng.choice(n, size=200, replace=False)] = False
    valid[[5, 7, 8, 10, 100, 101, 2900, 2950]] = True
    pairs = jnp.asarray(split_u64(hashes))
    hot = np.nonzero(_golden_counts(hashes, valid, t) > 0)[0]
    if not len(hot):
        pytest.skip("rng produced no planted pair under t")
    out = pigeonhole.extract_hits(pairs, jnp.asarray(valid), t, hot,
                                  int(valid.sum()), k=64, s=256)
    assert out is not None
    hits, rescan = out
    assert not len(rescan)
    for row in hot:
        gj, gd = _golden_hits(hashes, valid, t, int(row))
        rr, dd = hits[int(row)]
        np.testing.assert_array_equal(rr, gj, err_msg=f"row {row}")
        np.testing.assert_array_equal(dd, gd, err_msg=f"row {row}")


def test_extract_hits_oversized_run_rescans(rng):
    """Needles inside an equal-key run longer than the band must be handed
    back for the classic rescan (their partner can sit beyond ±s)."""
    n = 4096
    s = 256
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    base = int(hashes[0])
    idx = rng.choice(n, size=1000, replace=False)
    for i in idx:
        h = base
        for b in rng.choice(64, size=int(rng.integers(0, 3)), replace=False):
            h ^= 1 << int(b)
        hashes[i] = np.uint64(h)
    valid = np.ones(n, bool)
    hot = np.nonzero(_golden_counts(hashes, valid, 5) > 0)[0]
    out = pigeonhole.extract_hits(jnp.asarray(split_u64(hashes)),
                                  jnp.asarray(valid), 5, hot,
                                  int(valid.sum()), k=64, s=s)
    assert out is not None
    hits, rescan = out
    rescan_set = set(int(r) for r in rescan)
    # every cluster member whose run overflows the band must be rescanned
    assert rescan_set, "giant cluster should flag oversized-run needles"
    # extracted needles must still be exact
    for row in hot:
        if int(row) in rescan_set:
            continue
        gj, gd = _golden_hits(hashes, valid, 5, int(row))
        rr, dd = hits[int(row)]
        if len(gj) > 64:
            continue  # k-capped list: prefix only
        np.testing.assert_array_equal(rr, gj, err_msg=f"row {row}")
        np.testing.assert_array_equal(dd, gd, err_msg=f"row {row}")


# --- sharded (CPU-mesh) path -----------------------------------------------


def test_sharded_counts_match_golden(rng):
    """self_counts over the 8-virtual-device CPU mesh == the numpy golden,
    including an oversized equal-key cluster so the sharded run-tile step
    (ph_run_step_fn) executes, not just the band."""
    from cbird_tpu.parallel.sharded import make_mesh
    mesh = make_mesh()
    n = 8192
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    base = int(hashes[0])
    idx = rng.choice(n, size=1200, replace=False)
    for i in idx:
        h = base
        for b in rng.choice(64, size=int(rng.integers(0, 3)), replace=False):
            h ^= 1 << int(b)
        hashes[i] = np.uint64(h)
    valid = np.ones(n, bool)
    valid[rng.choice(n, size=300, replace=False)] = False
    got = pigeonhole.self_counts(
        jnp.asarray(split_u64(hashes)), jnp.asarray(valid), 5,
        int(valid.sum()), s=256, mesh=mesh)
    assert got is not None
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, 5))


def test_search_self_sharded_routes_pigeonhole(rng, monkeypatch):
    """Mesh-mode search_self takes the sharded pigeonhole count phase and
    returns exactly what the plain two-phase search returns."""
    from cbird_tpu.ops import hamming
    monkeypatch.setattr(pigeonhole, "MIN_STORE", 1024)
    calls = []
    real = pigeonhole.self_counts_sparse

    def spy(*a, **kw):
        out = real(*a, **kw)
        calls.append(kw.get("mesh") is not None and out is not None)
        return out

    monkeypatch.setattr(pigeonhole, "self_counts_sparse", spy)
    n = 3000
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 2900), (2950, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    ids = np.arange(1, n + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    assert hamming._search_mesh() is not None, "conftest mesh expected"
    ref = store.search(hashes, 5, k=64, min_hits=2)
    tri = store.search_self(5, k=64, min_n=0)
    assert calls == [True], "sharded pigeonhole path was not taken"
    for row, ((ri, rd), (ti, td)) in enumerate(zip(ref, tri)):
        if len(ri) <= 1:
            assert len(ti) == 0 or np.array_equal(ri, ti), row
        else:
            assert np.array_equal(ri, ti) and np.array_equal(rd, td), row


@pytest.mark.parametrize("t", [1, 3, 5])
def test_host_sort_counts_match_device(rng, monkeypatch, t):
    """CBIRD_PH_SORT=host (numpy radix sort + upload, the default for
    ≥2^22-row single-device stores where the device sort executable's
    per-process load costs 21-264 s through the axon tunnel) must produce
    counts identical to the device sort and the golden, incl. tombstones,
    oversized runs, and the t=1 wide-key path."""
    n = 4096
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hashes[500:1100] = hashes[500]       # oversized equal-key run (600 > s)
    hashes[7] = hashes[8]
    for src, dst in [(5, 2900), (2950, 10)]:
        h = int(hashes[src])
        for b in rng.choice(64, size=max(0, t - 1), replace=False):
            h ^= 1 << int(b)
        hashes[dst] = np.uint64(h)
    valid = np.ones(n, bool)
    valid[510] = False
    valid[rng.choice(n, size=300, replace=False)] = False
    valid[-64:] = False                  # invalid tail run at the sort end
    pairs_host = split_u64(hashes)

    monkeypatch.setenv("CBIRD_PH_SORT", "device")
    dev = _counts(hashes, valid, t, s=256)
    monkeypatch.setenv("CBIRD_PH_SORT", "host")
    host = _counts(hashes, valid, t, s=256,
                   pairs_host=pairs_host, valid_host=valid)
    assert dev is not None and host is not None
    np.testing.assert_array_equal(host, dev)
    np.testing.assert_array_equal(host, _golden_counts(hashes, valid, t))


# ---- persistent sort-order cache (SortOrderCache) -------------------------

def _clustered(rng, n, t=5):
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hashes[500:1100] = hashes[500]  # oversized run
    for src, dst in [(5, 2900), (2950, 10), (100, 101)]:
        h = int(hashes[src])
        for b in rng.choice(64, size=max(0, t - 1), replace=False):
            h ^= 1 << int(b)
        hashes[dst] = np.uint64(h)
    valid = np.ones(n, bool)
    valid[rng.choice(n, size=200, replace=False)] = False
    return hashes, valid


@pytest.mark.parametrize("t", [1, 5])
def test_sort_cache_roundtrip(rng, monkeypatch, tmp_path, t):
    """First host-sorted count writes phsort-*.npz; a second count with the
    same fingerprint loads it — no re-sort, no host bucket arrays built —
    and produces identical (golden) counts."""
    monkeypatch.setenv("CBIRD_PH_SORT", "host")
    hashes, valid = _clustered(rng, 4096, t)
    pairs_host = split_u64(hashes)
    cache = pigeonhole.SortOrderCache(str(tmp_path), "fp1", name="x")
    got1 = _counts(hashes, valid, t, s=256, pairs_host=pairs_host,
                   valid_host=valid, sort_cache=cache)
    assert got1 is not None
    for b in range(t):  # one file per block
        assert (tmp_path / f"phsort-x-t{t}.b{b}.npz").exists()

    def no_sort(*a, **k):
        raise AssertionError("re-sorted despite a cache hit")

    def no_host_arrays():
        raise AssertionError("host arrays built despite a cache hit")

    monkeypatch.setattr(pigeonhole, "_sort_block_host", no_sort)
    cache2 = pigeonhole.SortOrderCache(str(tmp_path), "fp1", name="x")
    got2 = _counts(hashes, valid, t, s=256, host_arrays=no_host_arrays,
                   sort_cache=cache2)
    np.testing.assert_array_equal(got2, got1)
    np.testing.assert_array_equal(got1, _golden_counts(hashes, valid, t))


def test_sort_cache_fingerprint_and_corruption(rng, monkeypatch, tmp_path):
    """A different fingerprint (mutated store) or a corrupt file is a miss:
    the sort re-runs and the file is replaced."""
    monkeypatch.setenv("CBIRD_PH_SORT", "host")
    t = 5
    hashes, valid = _clustered(rng, 4096, t)
    pairs_host = split_u64(hashes)
    cache = pigeonhole.SortOrderCache(str(tmp_path), "fp1", name="x")
    _counts(hashes, valid, t, s=256, pairs_host=pairs_host,
            valid_host=valid, sort_cache=cache)
    calls = []
    real = pigeonhole._sort_block_host

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pigeonhole, "_sort_block_host", spy)
    # stale fingerprint → full re-sort
    cache2 = pigeonhole.SortOrderCache(str(tmp_path), "fp2", name="x")
    got = _counts(hashes, valid, t, s=256, pairs_host=pairs_host,
                  valid_host=valid, sort_cache=cache2)
    assert len(calls) == t
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, t))
    # corrupt ONE block file → only that block re-sorts, not a crash
    f = tmp_path / f"phsort-x-t{t}.b1.npz"
    f.write_bytes(b"garbage")
    calls.clear()
    cache3 = pigeonhole.SortOrderCache(str(tmp_path), "fp2", name="x")
    got = _counts(hashes, valid, t, s=256, pairs_host=pairs_host,
                  valid_host=valid, sort_cache=cache3)
    assert len(calls) == 1
    np.testing.assert_array_equal(got, _golden_counts(hashes, valid, t))


def test_store_sort_cache_add_remove_invalidates(rng, monkeypatch, tmp_path):
    """Store-level wiring: search_self persists the sorted orders under
    cache_dir, a fresh store with identical content reuses them, and an
    add/remove changes the fingerprint so the cache is NOT reused (the
    VERDICT r04 #2 invalidation contract)."""
    from cbird_tpu.ops import hamming
    monkeypatch.setattr(hamming, "_MESH", None)
    monkeypatch.setenv("CBIRD_PH_SORT", "host")
    t = 5
    n = 4096
    hashes, _ = _clustered(rng, n, t)
    ids = np.arange(1, n + 1, dtype=np.uint32)

    def mk():
        s = PackedHashStore(hashes.copy(), ids.copy())
        s.cache_dir = str(tmp_path)
        s.cache_name = "dcthash"
        return s

    r1 = mk().search_self(t, k=16, min_n=0)
    assert (tmp_path / f"phsort-dcthash-t{t}.b0.npz").exists()

    calls = []
    real = pigeonhole._sort_block_host

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pigeonhole, "_sort_block_host", spy)
    r2 = mk().search_self(t, k=16, min_n=0)  # same content → cache hit
    assert not calls, "cache was not reused for an unchanged store"
    assert len(r1) == len(r2)
    for (ri, rd), (ti, td) in zip(r1, r2):
        np.testing.assert_array_equal(ri, ti)
        np.testing.assert_array_equal(rd, td)

    s3 = mk()
    s3.remove([int(ids[100])])  # mutation → new fingerprint
    r3 = s3.search_self(t, k=16, min_n=0)
    assert calls, "mutated store must re-sort, not reuse the stale cache"
    assert len(r3[100][0]) == 0  # removed row matches nothing
