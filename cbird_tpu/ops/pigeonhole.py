"""Pigeonhole-sorted exact count phase for the N² self-search.

Replaces the full triangular scan of PackedHashStore.search_self's count
phase (ops/hamming.py _self_count_tile / ops/mxu_count.py) when the search
threshold is small: a pair with Hamming distance d < T differs in at most
T-1 of T disjoint bit-blocks, so it matches at least one block EXACTLY
(pigeonhole).  Sorting the store by each block's bits makes every such
pair land in the same equal-key run, so a banded scan over the sorted
order (plus dense tiles for over-long runs) visits ~2·S·T pairs per row
instead of N/2 — ~120x fewer pair evaluations at 10M rows / t=5
(S=4096).  Measured on v5e (experiments/pigeonhole_ab.py, same-process
warm, counts bit-identical): 10M t=5 count phase 7.36 s vs 170.1 s for
the classic MXU triangle (23x; band S sweep: 4096 → 7.4 s, 8192 →
9.9 s, 32768 → 27 s); 2M 1.09 s vs 3.83 s (3.5x at the pre-sweep
S=2048).  The sort is NOT the bottleneck: 10.5M rows sort in 0.42 s
warm — the band scan dominates, so S (band pair count) is the knob.

The reference's RadixMap (/root/reference/src/tree/radix.h:135-141) keys
the low hash bits and accepts recall loss (`-p.vradix` trades recall for
speed, readme.md:326-327); this is the exact variant: every block is a
radix in turn, and first-equal-block masking dedups across blocks, so the
counts are EXACT and feed search_self's recall-repair invariant unchanged.

Output semantics match the classic triangle (hamming._self_count_tile):
counts[i] = #{j : store row j > i, valid, d(i,j) < threshold}.

Coverage proof sketch: in each block's sorted order, partition positions
into tiles of S.  The band chunk scans every pair within one tile and
between adjacent tiles (tile_j ≤ tile_i + 1, any position gap); a pair
with position gap ≤ S is always in the same or adjacent tile.  Pairs of
an equal-key run longer than S+1 that straddle ≥2 tile boundaries are
covered by the dense extra tile-pairs (tile_j ≥ tile_i + 2) enumerated
from that run's tile span.  Band and extra sets are disjoint by tile
arithmetic, extra tile-pairs are dedup'd across runs, and the per-pair
first-equal-block mask dedups across blocks — each qualifying pair is
counted exactly once globally.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# below this many (padded) rows the classic count phase is already cheap
MIN_STORE = 4096
# blocks narrower than 8 bits make runs ~N/256 long — classic path wins
MAX_THRESHOLD = 8
# give up if the dense run tiles exceed this fraction of the full triangle
RUN_BUDGET_FRAC = 0.25
# or this many extra dispatches (host dispatch cost dominates past this)
RUN_BUDGET_TILES = 20000

_U32 = jnp.uint32(0xFFFFFFFF)


def enabled() -> bool:
    return os.environ.get("CBIRD_PIGEONHOLE", "on").lower() not in (
        "off", "0", "no")


@functools.lru_cache(maxsize=None)
def block_masks(threshold: int) -> tuple[tuple[int, int], ...]:
    """T disjoint (mask_lo, mask_hi) u32 pairs partitioning the 64 hash
    bits.  Bit positions are dealt round-robin from a fixed shuffle so
    each block samples decorrelated hash bits (adjacent DCT-coefficient
    sign bits correlate on natural images; a block of adjacent bits would
    skew run lengths)."""
    order = np.random.default_rng(0xC81D).permutation(64)
    masks = [[0, 0] for _ in range(threshold)]
    for i, bit in enumerate(order):
        b = int(i % threshold)
        if bit < 32:
            masks[b][0] |= 1 << int(bit)
        else:
            masks[b][1] |= 1 << int(bit - 32)
    return tuple((int(lo), int(hi)) for lo, hi in masks)


def _run_stats(slo, shi, svalid, cmlo, cmhi):
    sklo = jnp.where(svalid, slo & cmlo, _U32)
    skhi = jnp.where(svalid, shi & cmhi, _U32)
    change = jnp.concatenate([
        jnp.ones(1, bool), (sklo[1:] != sklo[:-1]) | (skhi[1:] != skhi[:-1])])
    return (change & svalid).sum(dtype=jnp.int32)


@functools.lru_cache(maxsize=None)
def _mask_positions(mask_lo: int, mask_hi: int, width: int):
    """(word_sel [width], shift [width], live [width]): bit i of the
    compact sort key comes from word[word_sel[i]] >> shift[i]; dead slots
    (block narrower than width) contribute 0 so every block of a
    threshold shares one compiled program."""
    sel, sh, live = [], [], []
    for p in range(64):
        if (mask_lo if p < 32 else mask_hi) >> (p % 32) & 1:
            sel.append(0 if p < 32 else 1)
            sh.append(p % 32)
            live.append(1)
    while len(sel) < width:
        sel.append(0)
        sh.append(0)
        live.append(0)
    return (np.array(sel, np.int32), np.array(sh, np.uint32),
            np.array(live, np.uint32))


@functools.partial(jax.jit, static_argnames=("width",))
def _sort_block_compact(pairs, valid, cmlo, cmhi, sel, sh, live, *, width):
    """Sort by the block's bits COMPACTED into one ≤32-bit key, carrying
    lo/hi/valid as sort payloads: 6.7x faster per block than the two-word
    key + post-sort gathers at 10M (59 vs 396 ms warm, experiments/
    ph_sort_ab.py — three random 10.5M gathers cost far more than moving
    payloads through the sort network)."""
    lo, hi = pairs[:, 0], pairs[:, 1]
    n = lo.shape[0]
    key = jnp.zeros(n, jnp.uint32)
    for i in range(width):
        w = jnp.where(sel[i] == 0, lo, hi)
        key |= ((w >> sh[i]) & live[i]) << jnp.uint32(i)
    # invalid rows (tombstones/bucket padding) sink to the end; a valid
    # all-ones key colliding with the sentinel (width=32 only) just wastes
    # scan work on the dead tail (the kernels' validity mask keeps counts
    # right)
    key = jnp.where(valid, key, _U32)
    _, srow, slo, shi, sv = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32), lo, hi,
         valid.astype(jnp.uint32)), num_keys=1)
    svalid = sv.astype(bool)
    n_runs = _run_stats(slo, shi, svalid, cmlo, cmhi)
    return slo, shi, srow, svalid, n_runs


@jax.jit
def _sort_block_wide(pairs, valid, cmlo, cmhi):
    """Two-word-key sort for blocks wider than 32 bits (threshold 1: the
    single block IS the whole hash).  Masks are TRACED u32 scalars so all
    blocks share one compiled program."""
    lo, hi = pairs[:, 0], pairs[:, 1]
    n = lo.shape[0]
    klo = jnp.where(valid, lo & cmlo, _U32)
    khi = jnp.where(valid, hi & cmhi, _U32)
    _, _, srow, slo, shi, sv = jax.lax.sort(
        (klo, khi, jnp.arange(n, dtype=jnp.int32), lo, hi,
         valid.astype(jnp.uint32)), num_keys=2)
    svalid = sv.astype(bool)
    n_runs = _run_stats(slo, shi, svalid, cmlo, cmhi)
    return slo, shi, srow, svalid, n_runs


# above this many padded rows the count phase sorts on HOST by default:
# the device sort program is a multi-MB sort-network executable whose
# per-process load/compile through the axon tunnel measured 21-264 s at
# 10M rows (pool-dependent, even on a LOCAL persistent-cache hit), while
# numpy's radix argsort is a predictable ~3 s per 10.5M block and the
# only device traffic is the [N] int32 order upload (42 MB at the
# measured 14-34 MB/s tunnel upload rate) consumed by small gather/pad
# programs.  One-shot CLI processes dominate -similar usage, so fixed
# host cost beats the device-load lottery; warm processes (-serve,
# tests, meshes) keep the device sort via CBIRD_PH_SORT=device.
HOST_SORT_MIN = 1 << 22


def _sort_mode() -> str:
    return os.environ.get("CBIRD_PH_SORT", "auto").lower()


# bump when the block-mask shuffle or file layout changes
_SORT_CACHE_VERSION = 1


class SortOrderCache:
    """Persistent per-block sorted orders for the host-sort count phase.

    The reference persists every rebuildable search structure to
    mtime-validated flat caches (/root/reference/src/qtutil.h:125-132,
    src/dctfeaturesindex.cpp:34, src/cvfeaturesindex.cpp:406-419); the
    pigeonhole N²'s equivalent is the T per-block argsort orders, which
    cost 22 s at 10M / 175 s at 30M / 1,155 s at 100M of numpy radix
    sort PER PROCESS.  One-shot ``-similar`` CLI runs dominate usage, so
    the orders are written once to ``<cache_dir>/phsort-t<T>.npz``
    (uncompressed — permutations don't compress) and re-validated by a
    blake2b fingerprint of the store content: add() appends rows and
    remove() zeroes hashes in place, so any mutation changes the
    fingerprint and invalidates the file.  Disable: CBIRD_PH_SORT_CACHE=off.

    Each block lives in its OWN file (phsort-<name>-t<T>.b<i>.npz) holding
    the int32 order plus packbit'd svalid/change masks and the measured
    run count — everything ``_pad_block_host`` needs, so a cache hit
    skips building the host bucket arrays entirely.  Per-block files keep
    peak host RSS flat (one [N] int32 in memory at a time, ~40 MB at 10M
    instead of T×, ~2 GB at 100M), are written as soon as each sort
    completes (a later-block band-size bail cannot discard earlier
    sorts), and let a re-search after partial completion resume.
    """

    def __init__(self, cache_dir: str, fingerprint: str,
                 name: str = "store") -> None:
        """@param name distinguishes co-located stores (e.g. 'dcthash'
        vs 'dctfeatures' share one _index/cache dir)."""
        self.cache_dir = cache_dir
        self.fingerprint = fingerprint
        self.name = name

    @staticmethod
    def enabled() -> bool:
        return os.environ.get("CBIRD_PH_SORT_CACHE", "on").lower() not in (
            "off", "0", "no")

    def _file(self, threshold: int, b: int) -> str:
        return os.path.join(self.cache_dir,
                            f"phsort-{self.name}-t{threshold}.b{b}.npz")

    def _valid(self, z, threshold: int, n_pad: int) -> bool:
        return (int(z["version"]) == _SORT_CACHE_VERSION
                and str(z["fingerprint"]) == self.fingerprint
                and int(z["n_pad"]) == n_pad
                and int(z["threshold"]) == threshold)

    def get(self, threshold: int, n_pad: int, b: int):
        """@return the _sort_block_host tuple (order int32 [n_pad],
        svalid bool, n_runs, change bool) for block ``b``, or None on
        miss/stale/corrupt (corrupt files are removed)."""
        f = self._file(threshold, b)
        if not os.path.exists(f):
            return None
        try:
            with np.load(f) as z:
                if not self._valid(z, threshold, n_pad):
                    return None
                order = z["order"]
                svalid = np.unpackbits(z["svalid"], count=n_pad).astype(bool)
                change = np.unpackbits(z["change"], count=n_pad).astype(bool)
                return order, svalid, int(z["nruns"]), change
        except Exception:  # corrupt/truncated → rebuild (and replace)
            from ..utils.log import warn
            warn(f"corrupt sort cache removed: {f}")
            try:
                os.unlink(f)
            except OSError:
                pass
            return None

    def save_block(self, threshold: int, n_pad: int, b: int, block) -> None:
        """Atomically persist one block as soon as its sort completes."""
        order, svalid, n_runs, change = block
        os.makedirs(self.cache_dir, exist_ok=True)
        f = self._file(threshold, b)
        tmp = f"{f}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as fh:
                np.savez(fh,
                         version=np.int64(_SORT_CACHE_VERSION),
                         fingerprint=np.str_(self.fingerprint),
                         n_pad=np.int64(n_pad),
                         threshold=np.int64(threshold),
                         order=np.ascontiguousarray(order, np.int32),
                         svalid=np.packbits(svalid),
                         change=np.packbits(change),
                         nruns=np.int64(n_runs))
            os.replace(tmp, f)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise


def _sort_block_host(pairs, valid, mask: tuple[int, int], width: int):
    """Host-side equivalent of _sort_block: numpy radix argsort of the
    compacted block key with the same invalid-rows-sink-to-end semantics.
    Returns (order int32, svalid bool, n_runs, change) — all HOST arrays;
    tie order within equal keys may differ from the device sort, which
    cannot change counts (within-run pair coverage and smaller-store-row
    attribution are order-free; oversized runs go through the exact dense
    tiles either way)."""
    lo, hi = pairs[:, 0], pairs[:, 1]
    mlo, mhi = mask
    if width <= 32:
        key = np.zeros(len(lo), np.uint32)
        bit = 0
        for p in range(64):
            if (mlo if p < 32 else mhi) >> (p % 32) & 1:
                w = lo if p < 32 else hi
                key |= ((w >> np.uint32(p % 32)) & np.uint32(1)) \
                    << np.uint32(bit)
                bit += 1
        key = np.where(valid, key, np.uint32(0xFFFFFFFF))
        order = np.argsort(key, kind="stable").astype(np.int32)
        key_s = key[order]
        change = np.empty(len(key_s), bool)
        change[0] = True
        np.not_equal(key_s[1:], key_s[:-1], out=change[1:])
    else:  # threshold 1: the block is the whole 64-bit hash
        klo = np.where(valid, lo & np.uint32(mlo), np.uint32(0xFFFFFFFF))
        khi = np.where(valid, hi & np.uint32(mhi), np.uint32(0xFFFFFFFF))
        order = np.lexsort((khi, klo)).astype(np.int32)
        kl, kh = klo[order], khi[order]
        change = np.empty(len(kl), bool)
        change[0] = True
        change[1:] = (kl[1:] != kl[:-1]) | (kh[1:] != kh[:-1])
    svalid = valid[order]
    n_runs = int(np.count_nonzero(change & svalid))
    return order, svalid, n_runs, change


@functools.partial(jax.jit, static_argnames=("s",))
def _gather_pad(pairs, valid, order, *, s):
    """Materialize the sorted block views ON DEVICE from the resident
    store and an uploaded [N] int32 permutation: three gathers + pads.
    Keeps host-sort device traffic to the one order array (42 MB at 10M)
    instead of shipping slo/shi/srow/svalid (137 MB) — tunnel upload
    measures 14-34 MB/s, so volume is the cost that matters."""
    pad = ((0, s),)
    return (jnp.pad(jnp.take(pairs[:, 0], order), pad),
            jnp.pad(jnp.take(pairs[:, 1], order), pad),
            jnp.pad(order, pad),
            jnp.pad(jnp.take(valid, order), pad))


def _pad_block_host(order, svalid_h, change, pairs_dev, valid_dev, *, s):
    """Host-side _pad_block: the oversized-run boundary math runs on the
    precomputed key-change mask (pure numpy, never uploaded); the sorted
    device arrays come from _gather_pad off the uploaded order."""
    n = len(order)
    # key[i] == key[i+s] iff both positions share a run id (equal keys are
    # contiguous after the sort, change marks run boundaries)
    run_id = np.cumsum(change)
    same = run_id[s:] == run_id[:-s]
    os_start = change[:-s] & same & svalid_h[:-s]
    change_next = np.empty(n - s, bool)
    change_next[:-1] = change[s + 1:]
    change_next[-1] = True
    os_end = change_next & same & svalid_h[s:]
    n_os = int(np.count_nonzero(os_start))
    slo, shi, srow, svalid = _gather_pad(
        pairs_dev, valid_dev, jnp.asarray(order), s=s)
    return slo, shi, srow, svalid, os_start, os_end, n_os


def _sort_block(pairs, valid, mask: tuple[int, int], width: int):
    """Sort the store by one block's masked bits.

    @param width static max block width for this threshold (ceil(64/T));
           ≤32 routes to the compact-key sort, wider to the two-word key
    @return (slo, shi, srow, svalid, n_runs): sorted arrays plus the
            number of distinct valid equal-key runs (scalar), from which
            the caller sizes the band for this block's MEASURED key skew
            (declared block width lies when hash bits are biased — e.g.
            DCT sign bits of natural images, or a constant MSB).
    """
    cmlo, cmhi = jnp.uint32(mask[0]), jnp.uint32(mask[1])
    if width <= 32:
        sel, sh, live = _mask_positions(mask[0], mask[1], width)
        return _sort_block_compact(pairs, valid, cmlo, cmhi,
                                   jnp.asarray(sel), jnp.asarray(sh),
                                   jnp.asarray(live), width=width)
    return _sort_block_wide(pairs, valid, cmlo, cmhi)


@functools.partial(jax.jit, static_argnames=("s",))
def _pad_block(slo, shi, srow, svalid, cmlo, cmhi, *, s):
    """Pad one sorted block to [N+s] (pad rows invalid) and derive the
    oversized-run boundary masks for band half-width ``s``: os_start [N-s]
    (position i starts a run longer than s+1), os_end [N-s] (position i+s
    ends one), and n_os (scalar count of oversized runs)."""
    sklo = jnp.where(svalid, slo & cmlo, _U32)
    skhi = jnp.where(svalid, shi & cmhi, _U32)
    change = jnp.concatenate([
        jnp.ones(1, bool), (sklo[1:] != sklo[:-1]) | (skhi[1:] != skhi[:-1])])
    # a run starting at i is longer than s+1 iff the key is unchanged at
    # i+s; symmetrically its last position j satisfies key[j] == key[j-s]
    same_fwd = (sklo[:-s] == sklo[s:]) & (skhi[:-s] == skhi[s:]) & svalid[:-s]
    os_start = change[:-s] & same_fwd
    change_next = jnp.concatenate([change[1:], jnp.ones(1, bool)])
    same_bwd = (sklo[s:] == sklo[:-s]) & (skhi[s:] == skhi[:-s]) & svalid[s:]
    os_end = change_next[s:] & same_bwd  # mask over positions s..n-1
    n_os = os_start.sum(dtype=jnp.int32)
    pad = ((0, s),)
    return (jnp.pad(slo, pad), jnp.pad(shi, pad), jnp.pad(srow, pad),
            jnp.pad(svalid, pad), os_start, os_end, n_os)


def _prep_block(pairs, valid, mask: tuple[int, int], width: int, *, s):
    """Sort + pad in one call (the fixed-s path used by extract_hits and
    explicit-s callers)."""
    slo, shi, srow, svalid, _ = _sort_block(pairs, valid, mask, width)
    return _pad_block(slo, shi, srow, svalid, jnp.uint32(mask[0]),
                      jnp.uint32(mask[1]), s=s)


def _hit_mask(x_lo, x_hi, t, mask_cur, mask_prev):
    """Pair-qualification mask from xor'd hash words: distance < t, keys
    equal in the current block, keys UNEQUAL in every earlier block (the
    first-equal-block dedup that makes global counts exact)."""
    d = (jax.lax.population_count(x_lo)
         + jax.lax.population_count(x_hi)).astype(jnp.int32)
    cmlo, cmhi = jnp.uint32(mask_cur[0]), jnp.uint32(mask_cur[1])
    hit = (d < t) & (((x_lo & cmlo) | (x_hi & cmhi)) == 0)
    for plo, phi in mask_prev:
        hit &= ((x_lo & jnp.uint32(plo)) | (x_hi & jnp.uint32(phi))) != 0
    return hit


def _band_contrib(slo, shi, srow, svalid, p0, *, mask_cur, mask_prev, s, g, t):
    """Band scan of g tiles of s sorted rows: each tile is compared against
    its own rows (j > i) and the next tile (all pairs) in one fused
    [g, s, 2s] xor+popcount+mask+reduce block.  Row-side counts attribute
    to the pair's smaller ORIGINAL store row.

    @return contrib [g*s + s] int32 additions to csort[p0:]"""
    r = g * s
    a_lo = jax.lax.dynamic_slice(slo, (p0,), (r,)).reshape(g, s)
    a_hi = jax.lax.dynamic_slice(shi, (p0,), (r,)).reshape(g, s)
    a_row = jax.lax.dynamic_slice(srow, (p0,), (r,)).reshape(g, s)
    a_v = jax.lax.dynamic_slice(svalid, (p0,), (r,)).reshape(g, s)
    w_lo = jax.lax.dynamic_slice(slo, (p0 + s,), (r,)).reshape(g, s)
    w_hi = jax.lax.dynamic_slice(shi, (p0 + s,), (r,)).reshape(g, s)
    w_row = jax.lax.dynamic_slice(srow, (p0 + s,), (r,)).reshape(g, s)
    w_v = jax.lax.dynamic_slice(svalid, (p0 + s,), (r,)).reshape(g, s)
    b_lo = jnp.concatenate([a_lo, w_lo], axis=1)  # [g, 2s] window
    b_hi = jnp.concatenate([a_hi, w_hi], axis=1)
    b_row = jnp.concatenate([a_row, w_row], axis=1)
    b_v = jnp.concatenate([a_v, w_v], axis=1)
    x_lo = a_lo[:, :, None] ^ b_lo[:, None, :]
    x_hi = a_hi[:, :, None] ^ b_hi[:, None, :]
    hit = _hit_mask(x_lo, x_hi, t, mask_cur, mask_prev)
    hit &= a_v[:, :, None] & b_v[:, None, :]
    # strictly-later sorted position (window col j maps to position
    # p0 + tile*s + j, row i to p0 + tile*s + i → local compare suffices)
    hit &= (jnp.arange(s, dtype=jnp.int32)[:, None]
            < jnp.arange(2 * s, dtype=jnp.int32)[None, :])
    att = a_row[:, :, None] < b_row[:, None, :]  # smaller store row wins
    row_ct = (hit & att).sum(axis=2, dtype=jnp.int32).reshape(r)
    col_ct = (hit & ~att).sum(axis=1, dtype=jnp.int32)  # [g, 2s]
    contrib = jnp.zeros(r + s, jnp.int32)
    contrib = contrib.at[:r].add(row_ct + col_ct[:, :s].reshape(r))
    contrib = contrib.at[s:].add(col_ct[:, s:].reshape(r))
    return contrib


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("mask_cur", "mask_prev", "s", "g", "t"))
def _band_chunk(csort, slo, shi, srow, svalid, p0, *,
                mask_cur, mask_prev, s, g, t):
    """Single-device band step: apply _band_contrib in place; csort
    accumulates per sorted position and is unsorted once per block
    (_unsort_add)."""
    r = g * s
    contrib = _band_contrib(slo, shi, srow, svalid, p0, mask_cur=mask_cur,
                            mask_prev=mask_prev, s=s, g=g, t=t)
    cur = jax.lax.dynamic_slice(csort, (p0,), (r + s,))
    return jax.lax.dynamic_update_slice(csort, cur + contrib, (p0,))


def _run_contribs(slo, shi, srow, svalid, ra, ca, *, mask_cur, mask_prev,
                  s, t):
    """One dense [s, s] tile for an oversized equal-key run: sorted rows
    [ra, ra+s) vs [ca, ca+s) with ca ≥ ra + 2s (disjoint from the band by
    construction, so no pair is double counted).

    @return (row_ct [s], col_ct [s]) int32 additions to csort[ra:]/[ca:]"""
    a_lo = jax.lax.dynamic_slice(slo, (ra,), (s,))
    a_hi = jax.lax.dynamic_slice(shi, (ra,), (s,))
    a_row = jax.lax.dynamic_slice(srow, (ra,), (s,))
    a_v = jax.lax.dynamic_slice(svalid, (ra,), (s,))
    b_lo = jax.lax.dynamic_slice(slo, (ca,), (s,))
    b_hi = jax.lax.dynamic_slice(shi, (ca,), (s,))
    b_row = jax.lax.dynamic_slice(srow, (ca,), (s,))
    b_v = jax.lax.dynamic_slice(svalid, (ca,), (s,))
    x_lo = a_lo[:, None] ^ b_lo[None, :]
    x_hi = a_hi[:, None] ^ b_hi[None, :]
    hit = _hit_mask(x_lo, x_hi, t, mask_cur, mask_prev)
    hit &= a_v[:, None] & b_v[None, :]
    att = a_row[:, None] < b_row[None, :]
    row_ct = (hit & att).sum(axis=1, dtype=jnp.int32)
    col_ct = (hit & ~att).sum(axis=0, dtype=jnp.int32)
    return row_ct, col_ct


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("mask_cur", "mask_prev", "s", "t"))
def _run_tile(csort, slo, shi, srow, svalid, ra, ca, *,
              mask_cur, mask_prev, s, t):
    """Single-device oversized-run step: apply _run_contribs in place."""
    row_ct, col_ct = _run_contribs(slo, shi, srow, svalid, ra, ca,
                                   mask_cur=mask_cur, mask_prev=mask_prev,
                                   s=s, t=t)
    csort = jax.lax.dynamic_update_slice(
        csort, jax.lax.dynamic_slice(csort, (ra,), (s,)) + row_ct, (ra,))
    return jax.lax.dynamic_update_slice(
        csort, jax.lax.dynamic_slice(csort, (ca,), (s,)) + col_ct, (ca,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _unsort_add(counts, csort, srow):
    """counts[srow[p]] += csort[p] — srow is a permutation (padded slots
    carry zero contributions), so indices are unique."""
    return counts.at[srow].add(csort, unique_indices=True)


def _pick_s_avg(avg_run: float, n_pad: int) -> int:
    """Band half-width: smallest power-of-two tile ≥1.5x the average
    equal-key run (band pairs scale with s, so smaller is faster: the 10M
    t=5 sweep measured s=4096 → 7.4 s, 8192 → 9.9 s, 32768 → 27 s warm;
    avg_run there was 2441).  Runs that overflow the band are still exact
    via the dense run tiles; pathological skew hits the run budget and
    falls back.  0 when even the largest tile can't hold the average run
    — the classic scan wins there."""
    for cand in (1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072):
        if cand > n_pad // 2:
            break
        if 2 * cand >= 3 * avg_run:
            return cand
    return 0


def _pick_s(n_valid: int, n_pad: int, min_bits: int) -> int:
    """Declared-width band pick (extract_hits and pre-sort estimates);
    the count phase re-picks per block from the MEASURED run count."""
    return _pick_s_avg(max(1.0, n_valid / float(1 << min_bits)), n_pad)


def _pick_g(s: int, n_pad: int, mesh) -> int:
    """Band tiles per dispatch: ~0.5G band pairs amortizes dispatch +
    mask overhead; on a mesh every chip needs a chunk per step."""
    g = max(2, min(128, (1 << 29) // (2 * s * s)))
    if mesh is not None:
        devs = int(np.prod(mesh.devices.shape))
        g = max(1, min(g, n_pad // (s * devs) or 1))
    while n_pad % (g * s):
        g //= 2
    return g


def _count_device(pairs_dev, valid_dev, threshold: int, n_valid: int,
                  *, s: int = 0, g: int = 0, mesh=None,
                  pairs_host=None, valid_host=None, host_arrays=None,
                  sort_cache=None):
    """Device-resident core of the count phase: returns the [n_pad] int32
    counts WITHOUT reading them back (a full-counts readback through the
    axon tunnel costs seconds at 10M rows), or None out of sweet spot.

    When host copies of the store are supplied, big single-device stores
    sort on HOST (see HOST_SORT_MIN) and upload the sorted arrays.

    @param host_arrays optional 0-arg callable returning (pairs, valid)
           host copies — invoked ONLY once the host-sort condition is
           known true (building them eagerly costs a ~120 MB numpy
           allocation per search at 10M rows) and skipped entirely on a
           sort-cache hit
    @param sort_cache optional SortOrderCache: persisted per-block orders
           are loaded instead of re-sorting (22 s at 10M, 1,155 s at 100M
           per process), and freshly computed sorts are saved back"""
    n_pad = int(pairs_dev.shape[0])
    if not (1 <= threshold <= MAX_THRESHOLD) or n_pad < MIN_STORE:
        return None
    masks = block_masks(threshold)
    fixed_s = s
    if fixed_s:
        fixed_s = min(fixed_s, n_pad // 2)
        if n_pad % fixed_s:
            return None  # buckets are powers of two or 2^21 mult — never
    elif not _pick_s(n_valid, n_pad, 64 // threshold):
        return None  # declared runs too long for any band — classic wins
    if mesh is not None:
        from ..parallel import sharded as sh
        pairs_dev, valid_dev = sh.ph_replicate(mesh, pairs_dev, valid_dev)
        counts = sh.ph_replicate(mesh, jnp.zeros(n_pad, jnp.int32))[0]
    else:
        counts = jnp.zeros(n_pad, jnp.int32)
    from ..utils.log import profile_stage
    prof = bool(os.environ.get("CBIRD_PROFILE"))
    width = -(-64 // threshold)
    mode = _sort_mode()
    host_sort = (mesh is None
                 and (pairs_host is not None or host_arrays is not None)
                 and mode != "device"
                 and (mode == "host" or n_pad >= HOST_SORT_MIN))
    use_cache = (host_sort and sort_cache is not None
                 and sort_cache.enabled())

    def _host_arrays():
        """Build (and pad) the host bucket copies on first real need."""
        nonlocal pairs_host, valid_host, host_sort
        if pairs_host is None:
            pairs_host, valid_host = host_arrays()
        if len(pairs_host) > n_pad:  # order must index pairs_dev
            host_sort = False
            return False
        if len(pairs_host) < n_pad:
            pairs_host = np.pad(pairs_host, ((0, n_pad - len(pairs_host)),
                                             (0, 0)))
            valid_host = np.pad(valid_host, (0, n_pad - len(valid_host)))
        return True

    for b, mask_cur in enumerate(masks):
        mask_prev = masks[:b]
        with profile_stage(f"ph sort b{b}"):
            if host_sort:
                blk = sort_cache.get(threshold, n_pad, b) if use_cache \
                    else None
                if blk is None and _host_arrays():
                    blk = _sort_block_host(pairs_host, valid_host,
                                           mask_cur, width)
                    if use_cache:
                        with profile_stage(f"ph sort-cache save b{b}"):
                            sort_cache.save_block(threshold, n_pad, b, blk)
            # _host_arrays() can flip host_sort off (host copies bigger
            # than the device bucket) — the device sort below then takes
            # over for this and every later block
            if host_sort:
                order_u, svalid_h, n_runs, change = blk
            else:
                slo_u, shi_u, srow_u, svalid_u, n_runs = _sort_block(
                    pairs_dev, valid_dev, mask_cur, width)
            if fixed_s:
                sb = fixed_s
            else:
                # size the band from this block's MEASURED key skew:
                # declared block width lies when hash bits are biased
                sb = _pick_s_avg(n_valid / max(1.0, float(n_runs)), n_pad)
                if not sb:
                    return None  # measured runs too long — classic wins
            if host_sort:
                slo, shi, srow, svalid, os_start, os_end, n_os = \
                    _pad_block_host(order_u, svalid_h, change,
                                    pairs_dev, valid_dev, s=sb)
            else:
                slo, shi, srow, svalid, os_start, os_end, n_os = _pad_block(
                    slo_u, shi_u, srow_u, svalid_u, jnp.uint32(mask_cur[0]),
                    jnp.uint32(mask_cur[1]), s=sb)
            if prof:
                # tiny slice READBACK: block_until_ready under-reports
                # through the axon tunnel (CLAUDE.md), piling async work
                # onto the next real readback stage
                np.asarray(svalid[-1:])
        gb = g or _pick_g(sb, n_pad, mesh)
        while n_pad % (gb * sb):
            gb //= 2
        r = gb * sb
        tile_pairs: set[tuple[int, int]] = set()
        if int(n_os):
            starts = np.nonzero(np.asarray(os_start))[0]
            ends = np.nonzero(np.asarray(os_end))[0] + sb
            for st, en in zip(starts, ends):  # run occupies [st, en]
                t0, t1 = int(st) // sb, int(en) // sb
                for ta in range(t0, t1 - 1):
                    for tb in range(ta + 2, t1 + 1):
                        tile_pairs.add((ta, tb))
            if (len(tile_pairs) > RUN_BUDGET_TILES
                    or len(tile_pairs) * sb * sb
                    > RUN_BUDGET_FRAC * n_valid * n_valid / 2):
                return None  # degenerate key skew — classic path wins
        with profile_stage(f"ph band b{b} (s={sb}, runs={len(tile_pairs)})"):
            if mesh is not None:
                csort = _sharded_block(mesh, slo, shi, srow, svalid,
                                       sorted(tile_pairs), mask_cur,
                                       mask_prev, n_pad, sb, gb, threshold)
            else:
                from . import pallas_band
                if pallas_band.enabled():
                    # opt-in VMEM-tiled Pallas band (CBIRD_PALLAS_BAND=on):
                    # 3.8x faster COLD (one program per (s, T) — masks ride
                    # SMEM) but 1.4x slower warm at 10M; see
                    # ops/pallas_band.py for the full write-up.
                    marr = np.zeros((threshold, 2), np.uint32)
                    marr[0] = mask_cur
                    for p, m in enumerate(mask_prev):
                        marr[1 + p] = m
                    csort = _band_epilogue(
                        pallas_band.band_counts(
                            slo, shi, srow, svalid, jnp.asarray(marr),
                            jnp.int32(threshold), s=sb,
                            t_blocks=threshold), s=sb)
                else:
                    csort = jnp.zeros(n_pad + sb, jnp.int32)
                    for p0 in range(0, n_pad, r):
                        csort = _band_chunk(csort, slo, shi, srow, svalid,
                                            jnp.int32(p0),
                                            mask_cur=mask_cur,
                                            mask_prev=mask_prev, s=sb,
                                            g=gb, t=threshold)
                for ta, tb in sorted(tile_pairs):
                    csort = _run_tile(csort, slo, shi, srow, svalid,
                                      jnp.int32(ta * sb), jnp.int32(tb * sb),
                                      mask_cur=mask_cur,
                                      mask_prev=mask_prev,
                                      s=sb, t=threshold)
            if prof:
                np.asarray(csort[:1])
        with profile_stage(f"ph unsort b{b}"):
            counts = _unsort_add(counts, csort, srow)
            if prof:
                np.asarray(counts[:1])
    return counts


@functools.partial(jax.jit, static_argnames=("s",))
def _band_epilogue(row_credit, *, s):
    """Pad the Pallas band row credits into the csort layout the run
    tiles and _unsort_add expect (the symmetric kernel credits every
    pair on its smaller-store-row side, so row credits are complete)."""
    return jnp.pad(row_credit, ((0, s),))


def self_counts(pairs_dev, valid_dev, threshold: int, n_valid: int,
                *, s: int = 0, g: int = 0, mesh=None,
                pairs_host=None, valid_host=None, host_arrays=None,
                sort_cache=None) -> np.ndarray | None:
    """Exact later-store-row hit counts for every store row, or None when
    this store/threshold is out of the pigeonhole sweet spot (caller falls
    back to the classic triangular scan).

    @param pairs_dev [N, 2] uint32 device array (single-device placement,
           or REPLICATED on ``mesh`` when one is given)
    @param valid_dev [N] bool device array (same placement)
    @param n_valid   number of live (non-tombstone) rows, for run sizing
    @param mesh      optional jax Mesh: band chunks and run tiles are
           round-robined one-per-chip over replicated sorted arrays with
           per-chip local state (no collectives inside a block; one psum
           per block combines) — the same balance scheme as
           parallel.sharded.sharded_self_count
    @return [N] int32 numpy counts (padded rows 0), or None
    """
    counts = _count_device(pairs_dev, valid_dev, threshold, n_valid,
                           s=s, g=g, mesh=mesh,
                           pairs_host=pairs_host, valid_host=valid_host,
                           host_arrays=host_arrays, sort_cache=sort_cache)
    if counts is None:
        return None
    return np.asarray(counts)


@jax.jit
def _pack_nonzero(counts):
    """1-bit-per-row nonzero mask, packed on device: the readback is
    n_pad/8 bytes instead of 4·n_pad (the full int32 counts array costs
    seconds through the axon tunnel at 10M rows)."""
    return jnp.packbits(counts > 0)


@jax.jit
def _gather_counts(counts, rows):
    return jnp.take(counts, rows)


def self_counts_sparse(pairs_dev, valid_dev, threshold: int, n_valid: int,
                       *, s: int = 0, g: int = 0, mesh=None,
                       pairs_host=None, valid_host=None, host_arrays=None,
                       sort_cache=None):
    """Count phase with sparse readback: (hot_rows, hot_counts) — the
    store rows with ≥1 later-row hit and their exact counts — or None out
    of the sweet spot.  Readback is a packed nonzero bitmask (n/8 bytes)
    plus one gather of the hot counts, instead of the full [N] int32
    array; at 10M rows that turns a ~42 MB tunnel transfer into ~1.5 MB.
    """
    counts = _count_device(pairs_dev, valid_dev, threshold, n_valid,
                           s=s, g=g, mesh=mesh,
                           pairs_host=pairs_host, valid_host=valid_host,
                           host_arrays=host_arrays, sort_cache=sort_cache)
    if counts is None:
        return None
    from ..utils.log import profile_stage
    n_pad = int(pairs_dev.shape[0])
    with profile_stage("ph pack+readback"):
        packed = np.asarray(_pack_nonzero(counts))
    with profile_stage("ph hot gather"):
        hot = np.nonzero(np.unpackbits(packed, count=n_pad))[0]
        if not len(hot):
            return hot, np.zeros(0, np.int32)
        hot_counts = np.asarray(_gather_counts(
            counts, jnp.asarray(hot.astype(np.int32))))
    return hot, hot_counts


@functools.partial(jax.jit, static_argnames=("s", "mask_cur", "mask_prev",
                                             "t", "kx"))
def _window_hits(pairs, nrows, pos, slo, shi, srow, svalid, *,
                 s, mask_cur, mask_prev, t, kx):
    """Per hot needle: the kx best (by distance) of the 2s+1 sorted
    positions around its own position in one block's order, first-equal-
    block masked (each qualifying pair surfaces in exactly ONE block
    across the T calls, so the cross-block union needs no dedup).
    Self-pairs (xor 0) surface in block 0.  kx ≤ 2s+1 is lossless for
    needles outside oversized runs: a block's hits all lie inside one
    equal-key run of ≤ s+1 rows.

    @param nrows [B] int32 store rows of the needles (invalid pad = -1)
    @param pos   [B] int32 sorted positions of those rows in THIS block
    @return (d [B, kx] int32, 127 on non-hits, ascending; rows [B, kx])
    """
    L = 2 * s + 1
    w0 = jnp.clip(pos - s, 0, slo.shape[0] - L)
    idx = w0[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    c_lo = jnp.take(slo, idx)
    c_hi = jnp.take(shi, idx)
    c_row = jnp.take(srow, idx)
    c_v = jnp.take(svalid, idx)
    n_lo = pairs[jnp.maximum(nrows, 0), 0]
    n_hi = pairs[jnp.maximum(nrows, 0), 1]
    x_lo = n_lo[:, None] ^ c_lo
    x_hi = n_hi[:, None] ^ c_hi
    hit = _hit_mask(x_lo, x_hi, t, mask_cur, mask_prev)
    hit &= c_v & (nrows >= 0)[:, None]
    d = (jax.lax.population_count(x_lo)
         + jax.lax.population_count(x_hi)).astype(jnp.int32)
    d = jnp.where(hit, d, jnp.int32(127))
    neg, top = jax.lax.top_k(-d, kx)
    return -neg, jnp.take_along_axis(c_row, top, axis=1)


@functools.partial(jax.jit, static_argnames=("kx",))
def _merge_block_hits(ds, rows, *, kx):
    """Union the per-block top candidates and keep the kx best by
    distance (ties resolved on host by store row after readback)."""
    d_all = jnp.concatenate(ds, axis=1)
    r_all = jnp.concatenate(rows, axis=1)
    neg, idx = jax.lax.top_k(-d_all, kx)
    return -neg, jnp.take_along_axis(r_all, idx, axis=1)


@functools.partial(jax.jit, static_argnames=("s",))
def _inverse_perm(srow, *, s):
    """pos[row] = sorted position (the first n_pad srow entries are the
    full permutation; the trailing s pad slots are ignored)."""
    n_pad = srow.shape[0] - s
    return jnp.zeros(n_pad, jnp.int32).at[srow[:n_pad]].set(
        jnp.arange(n_pad, dtype=jnp.int32), unique_indices=True)


def extract_hits(pairs_dev, valid_dev, threshold: int, hot: np.ndarray,
                 n_valid: int, k: int, *, s: int = 0,
                 needle_batch: int = 4096):
    """All sub-threshold partners of each hot store row, extracted from the
    pigeonhole sorted orders instead of rescanning the whole store: a
    pair's first-equal-block keeps it inside one equal-key run, so its
    partner sits within ±s sorted positions — a [B, T(2s+1)] windowed
    gather+popcount visits ~T·2s candidates per needle instead of N
    (10M/40k hot: ~1.6G pairs vs 420G for the full rescan).

    MEASURED NEGATIVE on a real v5e (2026-08-19, experiments/
    ph_extract_ab.py): despite 260x fewer pair evaluations, store-level
    search_self ran 67.5 s vs 14.1 s (10M/t=5) and 2.95 s vs 1.68 s
    (2M/t=5) in same-process warm A/Bs, results identical.  The [B, 2s+1]
    windowed random gathers over the sorted copies (plus one full re-sort
    + inverse-perm scatter per block) run far below the ~450G pairs/s
    streaming rate of the plain hot-needle rescan, and at realistic hot
    fractions (~0.2-0.4%) the rescan is only a few seconds to begin with.
    Kept as an opt-in (CBIRD_PH_EXTRACT=on) worked example; the exact
    counts verify it end-to-end.

    Needles inside an OVERSIZED equal-key run (partner may sit farther
    than s positions) are returned for rescan instead of risking a miss;
    search_self's exact-count verification backstops everything else.

    @param hot sorted array of hot store rows
    @return (hits, rescan): hits[row] = (store_rows [m], dists [m]) sorted
            by (dist, row) INCLUDING the self-pair, for rows not in
            rescan; rescan = np.ndarray of rows needing the classic scan.
            None when this store/threshold is out of the sweet spot.
    """
    n_pad = int(pairs_dev.shape[0])
    if not (1 <= threshold <= MAX_THRESHOLD) or n_pad < MIN_STORE:
        return None
    masks = block_masks(threshold)
    if not s:
        s = _pick_s(n_valid, n_pad, 64 // threshold)
        if not s:
            return None
    s = min(s, n_pad // 2)
    kx = min(max(64, k), n_pad)
    kb = min(kx, 2 * s + 1)  # per-block top: lossless, block hits ≤ s+1
    hot = np.asarray(hot)
    hot_dev = jnp.asarray(hot.astype(np.int32))
    rescan_mask = np.zeros(len(hot), bool)
    B = needle_batch if len(hot) > needle_batch else max(
        64, 1 << max(len(hot) - 1, 1).bit_length())
    chunk_offs = list(range(0, len(hot), B))
    stash: list[list] = [[] for _ in chunk_offs]
    t = threshold
    # blocks outer so only ONE sorted copy is HBM-resident at a time (the
    # per-chunk per-block [B, kb] tops are tiny); scales to 100M+ rows
    for b, mask_cur in enumerate(masks):
        slo, shi, srow, svalid, os_start, os_end, n_os = _prep_block(
            pairs_dev, valid_dev, mask_cur, -(-64 // threshold), s=s)
        pos = jnp.take(_inverse_perm(srow, s=s), hot_dev)
        pos_pad = jnp.pad(pos, (0, B))
        if int(n_os):
            # flag hot needles inside an oversized run: their partners can
            # sit beyond the ±s window in this block's order
            starts = np.nonzero(np.asarray(os_start))[0]
            ends = np.nonzero(np.asarray(os_end))[0] + s
            ph = np.asarray(pos)
            for st, en in zip(starts, ends):
                rescan_mask |= (ph >= st) & (ph <= en)
        for ci, c0 in enumerate(chunk_offs):
            rows_c = hot[c0:c0 + B]
            nrows = np.full(B, -1, np.int32)
            nrows[:len(rows_c)] = rows_c
            posc = jax.lax.dynamic_slice(pos_pad, (c0,), (B,))
            d, r = _window_hits(pairs_dev, jnp.asarray(nrows), posc, slo,
                                shi, srow, svalid, s=s, mask_cur=mask_cur,
                                mask_prev=masks[:b], t=t, kx=kb)
            stash[ci].append((d, r))
    hits: dict = {}
    pending = [(c0, _merge_block_hits([d for d, _ in st], [r for _, r in st],
                                      kx=kx) if len(st) > 1 else st[0])
               for c0, st in zip(chunk_offs, stash)]
    for c0, (d_top, r_top) in pending:
        rows_c = hot[c0:c0 + B]
        d_top = np.asarray(d_top)[:len(rows_c)]
        r_top = np.asarray(r_top)[:len(rows_c)]
        for j, row in enumerate(rows_c):
            if rescan_mask[c0 + j]:
                continue
            m = d_top[j] < t
            dd, rr = d_top[j][m], r_top[j][m]
            order = np.lexsort((rr, dd))
            hits[int(row)] = (rr[order], dd[order])
    return hits, hot[np.nonzero(rescan_mask)[0]]


def _sharded_block(mesh, slo, shi, srow, svalid, tile_pairs, mask_cur,
                   mask_prev, n_pad: int, s: int, g: int, t: int):
    """One block's band + run scan over all mesh devices: chunk i → chip
    i mod C, per-chip state rows, one psum at the end (ph_reduce_fn).

    @return csort [n_pad + s] int32, replicated on the mesh"""
    from ..parallel import sharded as sh
    devs = int(np.prod(mesh.devices.shape))
    r = g * s
    state = sh.ph_state(mesh, n_pad + s)
    vec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(tuple(mesh.axis_names)))
    band = sh.ph_band_step_fn(mesh, mask_cur, mask_prev, s, g, t)
    offs = list(range(0, n_pad, r))
    for i in range(0, len(offs), devs):
        p0 = np.full(devs, -1, np.int32)
        chunk = offs[i:i + devs]
        p0[:len(chunk)] = chunk
        state = band(state, jax.device_put(p0, vec), slo, shi, srow, svalid)
    if tile_pairs:
        run = sh.ph_run_step_fn(mesh, mask_cur, mask_prev, s, t)
        for i in range(0, len(tile_pairs), devs):
            ra = np.full(devs, -1, np.int32)
            ca = np.full(devs, 0, np.int32)
            for j, (ta, tb) in enumerate(tile_pairs[i:i + devs]):
                ra[j], ca[j] = ta * s, tb * s
            state = run(state, jax.device_put(ra, vec),
                        jax.device_put(ca, vec), slo, shi, srow, svalid)
    return sh.ph_reduce_fn(mesh)(state)
