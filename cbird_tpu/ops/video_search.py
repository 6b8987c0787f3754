"""Per-video segment-min Hamming search (the video index inner kernel).

TPU-first replacement for the reference's RadixMap bucket scan + per-video
reduceMatches loop (/root/reference/src/dctvideoindex.cpp:399-657 and
src/tree/radix.h): all frame hashes of all videos live in one packed
[F, 2]-uint32 array with a parallel video-index column; a query computes
XOR-popcount distances and scatter-min-reduces them *per video* on device,
returning (min distance, frame of the min) for every (needle, video) pair —
the host only sees the [Q, V] reduction, never per-frame matches.

Distance and frame are packed into one int32 (d·2^24 | frame, frame ids are
24-bit, reference src/dctvideoindex.h:38-51) so a single scatter-min keeps
the nearest frame per video.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_FRAME_BITS = 24
_FRAME_MASK = (1 << _FRAME_BITS) - 1
_BIG = np.int32((65 << _FRAME_BITS) | _FRAME_MASK)


def frame_search_packed(needles: jnp.ndarray, hashes: jnp.ndarray,
                        vidx: jnp.ndarray, frame_no: jnp.ndarray,
                        valid: jnp.ndarray, num_videos: int,
                        chunk: int = 1 << 16):
    """Traceable body of frame_search returning the packed [Q, V]
    (dist<<24 | frame) accumulator — the multi-chip path min-combines these
    per-shard accumulators over ICI (parallel/sharded.py)."""
    q = needles.shape[0]
    f = hashes.shape[0]
    n_lo, n_hi = needles[:, 0], needles[:, 1]

    f_pad = -f % chunk
    if f_pad:
        hashes = jnp.pad(hashes, ((0, f_pad), (0, 0)))
        vidx = jnp.pad(vidx, (0, f_pad))
        frame_no = jnp.pad(frame_no, (0, f_pad))
        valid = jnp.pad(valid, (0, f_pad))
    n_chunks = hashes.shape[0] // chunk

    hs = hashes.reshape(n_chunks, chunk, 2)
    vs = vidx.reshape(n_chunks, chunk)
    fs = frame_no.reshape(n_chunks, chunk)
    ok = valid.reshape(n_chunks, chunk)

    acc0 = jnp.full((q, num_videos), _BIG, jnp.int32)

    def body(acc, inp):
        h, v, fr, o = inp
        x = jax.lax.population_count(jnp.bitwise_xor(n_lo[:, None], h[None, :, 0]))
        y = jax.lax.population_count(jnp.bitwise_xor(n_hi[:, None], h[None, :, 1]))
        d = (x + y).astype(jnp.int32)
        combined = (d << _FRAME_BITS) | (fr & _FRAME_MASK)[None, :]
        combined = jnp.where(o[None, :], combined, _BIG)
        return acc.at[:, v].min(combined), None

    acc, _ = jax.lax.scan(body, acc0, (hs, vs, fs, ok))
    return acc


@functools.partial(jax.jit, static_argnames=("num_videos", "chunk"))
def frame_search(needles: jnp.ndarray, hashes: jnp.ndarray, vidx: jnp.ndarray,
                 frame_no: jnp.ndarray, valid: jnp.ndarray, num_videos: int,
                 chunk: int = 1 << 16):
    """@param needles [Q,2] uint32; hashes [F,2] uint32; vidx [F] int32 video
    index per frame; frame_no [F] int32; valid [F] bool
    @return (min_dist [Q,V] int32 (65 = no match), min_frame [Q,V] int32)"""
    acc = frame_search_packed(needles, hashes, vidx, frame_no, valid,
                              num_videos, chunk)
    return acc >> _FRAME_BITS, acc & _FRAME_MASK


class PackedVideoStore:
    """Packed frame-hash store: all videos' retained frames in parallel
    arrays, searched with per-video segment-min reductions."""

    def __init__(self):
        self._media_ids: list[int] = []       # video slot -> media id (0 = tombstone)
        self._hashes = np.zeros(0, np.uint64)
        self._vidx = np.zeros(0, np.int32)    # frame -> video slot
        self._frames = np.zeros(0, np.int32)
        # per-video appends buffer here and consolidate lazily — a
        # concatenate per add_video would make a V-video ingest O(V²)
        self._pending: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._dev = None
        self._by_slot = None  # slot → stored hashes (built lazily)
        self._hash_store = None  # frame rows as a PackedHashStore (lazily)
        self.cache_dir = None  # persistent pigeonhole sort cache location
        self._mxu_v32 = None  # int32 validity view for the MXU count gate

    def _consolidate(self) -> None:
        if self._pending:
            self._hashes = np.concatenate(
                [self._hashes] + [p[0] for p in self._pending])
            self._vidx = np.concatenate(
                [self._vidx] + [p[1] for p in self._pending])
            self._frames = np.concatenate(
                [self._frames] + [p[2] for p in self._pending])
            self._pending.clear()

    def __len__(self):
        return sum(1 for i in self._media_ids if i)

    def frame_count(self) -> int:
        return len(self._hashes) + sum(len(p[0]) for p in self._pending)

    @property
    def media_ids(self):
        return self._media_ids

    def memory_usage(self) -> int:
        return (self.frame_count() * (8 + 4 + 4))

    def add_video(self, media_id: int, frames: np.ndarray, hashes: np.ndarray) -> None:
        slot = len(self._media_ids)
        self._media_ids.append(int(media_id))
        self._pending.append((np.asarray(hashes, np.uint64),
                              np.full(len(hashes), slot, np.int32),
                              np.asarray(frames, np.int32)))
        self._dev = None
        self._by_slot = None
        self._hash_store = None
        self._mxu_v32 = None

    def video_hashes(self, media_id: int) -> np.ndarray | None:
        """Stored frame hashes (u64) for one media id, or None if absent —
        the N² gate compares a needle's in-memory hashes against these
        rather than assuming they are identical (a caller-supplied
        videoIndex can diverge from the stored .vdx after a re-index)."""
        mid = int(media_id)
        if mid == 0:
            return None
        try:
            slot = self._media_ids.index(mid)
        except ValueError:
            return None
        self._consolidate()
        if getattr(self, "_by_slot", None) is None:
            order = np.argsort(self._vidx, kind="stable")
            sorted_vidx = self._vidx[order]
            bounds = np.searchsorted(sorted_vidx,
                                     np.arange(len(self._media_ids) + 1))
            self._by_slot = (self._hashes[order], bounds)
        hashes, bounds = self._by_slot
        return hashes[bounds[slot]:bounds[slot + 1]]

    def remove(self, media_ids) -> None:
        kill = set(int(i) for i in media_ids)
        changed = False
        for slot, mid in enumerate(self._media_ids):
            if mid in kill:
                self._media_ids[slot] = 0
                changed = True
        if changed:
            self._dev = None
            self._hash_store = None
            self._mxu_v32 = None

    def _device(self):
        if self._dev is None:
            from .dct_hash import split_u64
            from .hamming import _bucket, _search_mesh
            self._consolidate()
            mesh = _search_mesh()
            shards = mesh.devices.shape[1] if mesh is not None else 1
            fb = _bucket(max(len(self._hashes), 1), multiple=shards)
            v = max(len(self._media_ids), 1)
            vb = max(1 << (v - 1).bit_length(), 16)
            pairs = np.zeros((fb, 2), np.uint32)
            vidx = np.zeros(fb, np.int32)
            frames = np.zeros(fb, np.int32)
            valid = np.zeros(fb, bool)
            n = len(self._hashes)
            if n:
                pairs[:n] = split_u64(self._hashes)
                vidx[:n] = self._vidx
                frames[:n] = self._frames
                alive = np.array([bool(m) for m in self._media_ids], bool)
                valid[:n] = alive[self._vidx]
            if mesh is not None:  # shard frame rows over the mesh
                from ..parallel.sharded import shard_rows
                self._dev = shard_rows(mesh, pairs, vidx, frames, valid) + (vb,)
            else:
                self._dev = (jnp.asarray(pairs), jnp.asarray(vidx),
                             jnp.asarray(frames), jnp.asarray(valid), vb)
        return self._dev

    def flat_hit_counts(self, needle_hashes: np.ndarray, threshold: int,
                        needle_batch: int = 16384) -> np.ndarray:
        """Per needle FRAME count of sub-threshold stored frames, ignoring
        video identity — one pass of the flat tiled count kernel (the
        440G pairs/s path; every per-(needle, video)-output formulation
        measured 4-8G pairs/s, see docs/TODO.md).  The video↔video N²
        pre-gate aggregates these per needle video: a frame's self-hit is
        exactly one count when the needle is stored (same-video retained
        frames are ≥ vht > dctThresh bits apart), so frames with ≥ 2
        counts have a cross-video hit.

        @return counts [len(needle_hashes)] int32"""
        from .dct_hash import split_u64
        from .hamming import _count_tile, _search_mesh
        mesh = _search_mesh()
        n = len(needle_hashes)
        if n == 0 or self.frame_count() == 0:
            return np.zeros(n, np.int32)
        pairs, vidx, frames, valid, vb = self._device()
        fb = pairs.shape[0]
        cols = min(1 << 17, fb)
        needles = split_u64(np.asarray(needle_hashes, np.uint64))
        t = jnp.int32(threshold)
        parts = []
        for s0 in range(0, n, needle_batch):
            nb = needles[s0:s0 + needle_batch]
            qn = nb.shape[0]
            # pad to a power-of-two bucket so shapes recompile rarely
            qb = needle_batch if n > needle_batch else \
                max(64, 1 << max(qn - 1, 1).bit_length())
            if qn < qb:
                nb = np.pad(nb, ((0, qb - qn), (0, 0)))
            if mesh is not None:
                # store arrays are index-sharded; exact counts via a
                # per-shard fused scan + one psum of [Q] int32s over ICI
                from ..parallel.sharded import sharded_flat_counts
                from jax.sharding import NamedSharding, PartitionSpec as P
                nb_dev = jax.device_put(nb, NamedSharding(mesh, P()))
                acc = sharded_flat_counts(mesh, nb_dev, pairs, valid,
                                          threshold)
            else:
                from . import mxu_count as mc
                if mc.mxu_enabled(fb) and threshold < 64:
                    # MXU ±1-matmul count (1.4-2x the VPU tiles on v5e;
                    # the kernel unpacks the packed store in-kernel)
                    if self._mxu_v32 is None:
                        self._mxu_v32 = valid.astype(jnp.int32)
                    acc = mc.count_below_padded(nb, pairs, self._mxu_v32,
                                                threshold)
                else:
                    nb_dev = jnp.asarray(nb)
                    acc = jnp.zeros(nb.shape[0], jnp.int32)
                    for cb in range(0, fb, cols):
                        acc = _count_tile(acc, nb_dev, jnp.int32(cb), pairs,
                                          valid, t, cols=cols)
            parts.append((qn, acc))
        return np.concatenate([np.asarray(a)[:qn]
                               for qn, a in parts])[:n].astype(np.int32)

    def row_maps(self):
        """(vidx [F] int32, frames [F] int32) host arrays aligned with the
        row indices search_hits returns."""
        self._consolidate()
        return self._vidx, self._frames

    def as_hash_store(self):
        """The frame rows as a PackedHashStore with ids = row+1 (0 for
        rows of removed videos): lets the triangular N² self-search
        machinery (ops/hamming.search_self — symmetric count phase, exact
        completeness invariants, mirror completion) run over frames; the
        ids map back to rows as id-1.  Cached until the store changes."""
        if self._hash_store is None:
            from .hamming import PackedHashStore
            self._consolidate()
            n = len(self._hashes)
            ids = np.arange(1, n + 1, dtype=np.uint32)
            if n:
                alive = np.array([bool(m) for m in self._media_ids], bool)
                ids[~alive[self._vidx]] = 0
            self._hash_store = PackedHashStore(self._hashes, ids)
            if self.cache_dir:
                self._hash_store.cache_dir = self.cache_dir
                self._hash_store.cache_name = "dctvideo"
        return self._hash_store

    def search_hits(self, needle_hashes: np.ndarray, threshold: int,
                    k_cap: int = 4096, needle_batch: int = 1024,
                    counts: np.ndarray | None = None):
        """Every sub-threshold (needle, frame-row) pair, extracted at the
        flat-scan rate: exact per-needle counts (tiled count kernel), then
        approx_min_k top-k only for needles that hit, with the count as the
        exact completeness check — needles whose extracted hit count falls
        short (approx recall miss) or whose count exceeds k_cap return
        None so the caller can fall back to the exact [Q, V] segment-min
        kernel.  ~50x the [Q, V] kernel's pair rate on misses and typical
        hit loads (docs/TODO.md).

        @param counts optional precomputed flat_hit_counts(needle_hashes,
               threshold) — callers that already gated on it pass it here
               so the store is scanned once, not twice
        @return list per needle of (row_idx [m] int32, dist [m] int32),
                m = exact sub-threshold count, or None (fallback needed)"""
        from .hamming import _search_mesh, hamming_topk
        from .dct_hash import split_u64
        n = len(needle_hashes)
        if n == 0 or self.frame_count() == 0:
            return [(np.zeros(0, np.int32), np.zeros(0, np.int32))] * n
        if counts is None:
            counts = self.flat_hit_counts(needle_hashes, threshold,
                                          needle_batch=max(needle_batch,
                                                           16384))
        empty = (np.zeros(0, np.int32), np.zeros(0, np.int32))
        results: list = [empty] * n
        hot = np.nonzero(counts > 0)[0]
        if len(hot) == 0:
            return results
        pairs, vidx, frames, valid, vb = self._device()
        needles = split_u64(np.asarray(needle_hashes, np.uint64))
        mesh = _search_mesh()
        pending = []
        for s in range(0, len(hot), needle_batch):
            sel = hot[s:s + needle_batch]
            nb = needles[sel]
            rows = nb.shape[0]
            qb = needle_batch if len(hot) > needle_batch else \
                max(64, 1 << max(rows - 1, 1).bit_length())
            if rows < qb:
                nb = np.pad(nb, ((0, qb - rows), (0, 0)))
            # k sized per batch (power-of-two ≤ k_cap: ≤7 compile variants)
            # so one hot needle elsewhere doesn't inflate every readback
            k = int(min(k_cap, max(64, 1 << int(counts[sel].max() - 1)
                                   .bit_length())))
            k = min(k, pairs.shape[0])
            if mesh is not None:
                from ..parallel.sharded import sharded_hamming_topk
                pending.append((sel, sharded_hamming_topk(
                    mesh, jnp.asarray(nb), pairs, valid, k=k)))
            else:
                pending.append((sel, hamming_topk(
                    jnp.asarray(nb), pairs, valid, k=k)))
        for sel, (d, i) in pending:
            d = np.asarray(d)[:len(sel)]
            i = np.asarray(i)[:len(sel)]
            hit = d < threshold
            got = hit.sum(axis=1)
            for r, needle in enumerate(sel):
                want = int(counts[needle])
                if got[r] != want or want > k_cap:
                    results[needle] = None  # approx miss / overflow
                else:
                    cols = np.nonzero(hit[r])[0]
                    results[needle] = (i[r, cols].astype(np.int32),
                                      d[r, cols].astype(np.int32))
        return results

    def search(self, needle_hashes: np.ndarray, needle_batch: int = 256):
        """@param needle_hashes [Q] uint64
        @return (min_dist [Q, V] int32 with 65 = miss, min_frame [Q, V] int32)
        where V = number of video slots (use .media_ids to map to ids)."""
        from .dct_hash import split_u64
        v = len(self._media_ids)
        q_total = len(needle_hashes)
        if q_total == 0 or v == 0 or self.frame_count() == 0:
            return (np.full((q_total, max(v, 1)), 65, np.int32),
                    np.zeros((q_total, max(v, 1)), np.int32))
        pairs, vidx, frames, valid, vb = self._device()
        out_d = np.zeros((q_total, v), np.int32)
        out_f = np.zeros((q_total, v), np.int32)
        needles = split_u64(np.asarray(needle_hashes, np.uint64))
        for s in range(0, q_total, needle_batch):
            nb = needles[s:s + needle_batch]
            qn = nb.shape[0]
            qb = max(1 << (qn - 1).bit_length(), 64)
            if qn < qb:
                nb = np.pad(nb, ((0, qb - qn), (0, 0)))
            from .hamming import _search_mesh
            mesh = _search_mesh()
            if mesh is not None:
                from ..parallel.sharded import sharded_frame_search
                d, fr = sharded_frame_search(mesh, jnp.asarray(nb), pairs,
                                             vidx, frames, valid,
                                             num_videos=vb)
            else:
                d, fr = frame_search(jnp.asarray(nb), pairs, vidx, frames,
                                     valid, num_videos=vb)
            out_d[s:s + qn] = np.asarray(d)[:qn, :v]
            out_f[s:s + qn] = np.asarray(fr)[:qn, :v]
        return out_d, out_f
