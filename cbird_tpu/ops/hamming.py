"""Batched Hamming search over packed 64-bit hash arrays (JAX/XLA).

TPU-first replacement for the reference's search *trees* — VpTree
(/root/reference/src/tree/vptree.h), HammingTree (src/tree/hammingtree.h),
RadixMap (src/tree/radix.h) and the scalar hamm64 inner loop
(src/hamm.h:24-26).

Design (SURVEY.md §6-7): at TPU batch widths a brute-force scan beats
pointer-chasing trees — 10M hashes are 80 MB, one HBM pass at ~1 TB/s is
~0.1 ms, three orders under the reference's latency budget.  So the index
is a packed [N, 2]-uint32 array (TPUs have no 64-bit lanes) kept in HBM; a
query is XOR + population_count on the VPU against a [Q]-needle batch, with
a streaming per-needle top-k merge so the [Q, N] distance matrix never
materializes.

Removal is tombstoning via a validity mask (the reference zeroes ids,
src/dcthashindex.cpp:183-190); invalid rows score BAD_DIST and fall out of
every top-k.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .dct_hash import split_u64

# larger than any valid distance (max real distance is 64)
BAD_DIST = np.int32(0x7FFF)

# shared read-only "no hits" result tuple
_EMPTY = (np.zeros(0, np.uint32), np.zeros(0, np.int32))


def _chunk_dists(n_lo, n_hi, h_lo, h_hi):
    """[Q] needles vs [C] haystack rows → [Q, C] int32 distances."""
    x = jax.lax.population_count(jnp.bitwise_xor(n_lo[:, None], h_lo[None, :]))
    y = jax.lax.population_count(jnp.bitwise_xor(n_hi[:, None], h_hi[None, :]))
    return (x + y).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "recall"))
def hamming_topk(needles: jnp.ndarray, haystack: jnp.ndarray,
                 valid: jnp.ndarray, k: int = 64, chunk: int = 1 << 27,
                 recall: float = 0.99):
    """Per-needle k nearest haystack rows by Hamming distance.

    needles  [Q, 2] uint32 (lo, hi)
    haystack [N, 2] uint32
    valid    [N] bool — False rows (tombstones/padding) never match
    @param recall approx_min_k recall target; self-search passes 0.999
           because its mirror completion gets only ONE scan per pair
    @return (dists [Q, k] int32 ascending, indices [Q, k] int32);
            missing entries have distance BAD_DIST

    chunk: ONE approx_min_k block for any store up to 2^27 rows — XLA
    fuses the xor+popcount producer into the PartialReduce, so the
    distance matrix never materializes and scan steps only add overhead.
    2026-08-19 sweep at [1024 x 10.5M] warm, same process
    (experiments/topk_batch_ab.py): chunk 2^21 4.27 s / 2^22 2.67 s /
    2^23 2.02 s / single block 1.57 s for 10 batches; wider needle
    batches LOSE (qb=4096 ~20% slower than 1024 at every chunk).

    EXCEPT at tiny Q: a single-needle PartialReduce over one 10.5M row
    runs ~8 ms device-side while the 2^21 scan runs ~1.8 ms (2026-08-20,
    experiments/topk_q1_ab.py); Q>=4 already favors the single block
    (~1 ms).  So Q<4 caps the chunk at 2^21 — this is the -serve warm
    path (BASELINE <10 ms p50).
    """
    q = needles.shape[0]
    if q < 4:
        chunk = min(chunk, 1 << 21)
    n = haystack.shape[0]
    k = min(k, max(n, 1))
    n_lo, n_hi = needles[:, 0], needles[:, 1]

    if n == 0:
        return (jnp.full((q, k), BAD_DIST, jnp.int32),
                jnp.full((q, k), -1, jnp.int32))

    if n <= 4096:  # exact path for small indexes (and unit-test parity)
        d = _chunk_dists(n_lo, n_hi, haystack[:, 0], haystack[:, 1])
        d = jnp.where(valid[None, :], d, BAD_DIST)
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    if n <= chunk:  # single block, TPU-native partial sort
        d = _chunk_dists(n_lo, n_hi, haystack[:, 0], haystack[:, 1])
        d = jnp.where(valid[None, :], d, jnp.int32(BAD_DIST))
        if recall >= 1.0:  # exact rescan path (invariant-repair callers)
            neg_d, idx = jax.lax.top_k(-d, k)
            return -neg_d, idx
        dk, ik = jax.lax.approx_min_k(d.astype(jnp.float32), k,
                                      recall_target=recall)
        return dk.astype(jnp.int32), ik

    # Streaming path for big indexes: per chunk use approx_min_k (the
    # TPU-native partial-reduction sort — ~150x faster than exact top_k on
    # multi-million-row chunks), stack the per-chunk candidates and do one
    # exact merge at the end.  recall_target=0.99 applies only at the k
    # boundary; threshold searches fetch k with margin so misses are rare.
    n_pad = -n % chunk
    if n_pad:
        haystack = jnp.pad(haystack, ((0, n_pad), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad))
    n_chunks = haystack.shape[0] // chunk
    hs = haystack.reshape(n_chunks, chunk, 2)
    vs = valid.reshape(n_chunks, chunk)
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)

    def body(_, inp):
        hs_c, vs_c, base = inp
        d = _chunk_dists(n_lo, n_hi, hs_c[:, 0], hs_c[:, 1])
        d = jnp.where(vs_c[None, :], d, jnp.int32(BAD_DIST))
        if recall >= 1.0:  # exact per chunk → exact after the merge
            neg_d, ik = jax.lax.top_k(-d, k)
            dk = (-neg_d).astype(jnp.float32)
        else:
            dk, ik = jax.lax.approx_min_k(d.astype(jnp.float32), k,
                                          recall_target=recall)
        return None, (dk, ik + base)

    _, (ds, is_) = jax.lax.scan(body, None, (hs, vs, bases))
    ds = jnp.moveaxis(ds, 0, 1).reshape(q, -1)
    is_ = jnp.moveaxis(is_, 0, 1).reshape(q, -1)
    neg_d, sel = jax.lax.top_k(-ds, k)
    return (-neg_d).astype(jnp.int32), jnp.take_along_axis(is_, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def hamming_count_below(needles: jnp.ndarray, haystack: jnp.ndarray,
                        valid: jnp.ndarray, threshold: jnp.ndarray,
                        chunk: int = 1 << 16):
    """Per-needle count of rows with distance < threshold.

    Superseded in the production count phase by the host-tiled _count_tile
    loop (~1.6x faster per pair); kept as the single-dispatch reference
    implementation the unit tests compare against."""
    n_lo, n_hi = needles[:, 0], needles[:, 1]
    n = haystack.shape[0]
    n_pad = -n % chunk
    if n_pad:
        haystack = jnp.pad(haystack, ((0, n_pad), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad))
    hs = haystack.reshape(-1, chunk, 2)
    vs = valid.reshape(-1, chunk)

    # Speed-of-light note (v5e, 2026-08): this fused xor+popcount+compare+
    # reduce runs at ~160G needle·row pairs/s — VPU peak for ~7 int ops per
    # pair, with zero HBM traffic beyond the one haystack read (the compare
    # and sum fuse into the distance producer).  An MXU int8 ±1-matmul in
    # plain XLA loses (it materializes the [Q, N] product to HBM for the
    # data-dependent threshold and goes HBM-bound at ~100G pairs/s), but
    # the Pallas kernel in ops/mxu_count.py keeps the distance tile in
    # VMEM and measured 1.4-2x this path — production count phases
    # (single-chip AND per-shard on meshes) route there when
    # mxu_enabled(); this fused scan remains the CPU-backend and
    # non-BC-divisible-bucket path.
    def body(acc, inp):
        hs_c, vs_c = inp
        d = _chunk_dists(n_lo, n_hi, hs_c[:, 0], hs_c[:, 1])
        hit = (d < threshold) & vs_c[None, :]
        return acc + hit.sum(axis=1, dtype=jnp.int32), None

    acc, _ = jax.lax.scan(body, jnp.zeros(needles.shape[0], jnp.int32), (hs, vs))
    return acc


@functools.partial(jax.jit, static_argnames=("cols",))
def _count_tile(acc: jnp.ndarray, needles: jnp.ndarray, col_base: jnp.ndarray,
                haystack: jnp.ndarray, valid: jnp.ndarray,
                threshold: jnp.ndarray, cols: int):
    """One [Q × cols] tile of the plain count phase: small fused tiles ran
    ~1.6x faster per pair than a monolithic full-haystack block in the
    2026-08 v5e sweep (see _self_count_tile), so the host loops tiles and
    chains the accumulator on device — no readback until every tile of a
    needle batch is queued."""
    hs = jax.lax.dynamic_slice(haystack, (col_base, 0), (cols, 2))
    vs = jax.lax.dynamic_slice(valid, (col_base,), (cols,))
    d = _chunk_dists(needles[:, 0], needles[:, 1], hs[:, 0], hs[:, 1])
    hit = (d < threshold) & vs[None, :]
    return acc + hit.sum(axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "masked"))
def _self_count_tile(acc: jnp.ndarray, row_base: jnp.ndarray,
                     col_base: jnp.ndarray, haystack: jnp.ndarray,
                     valid: jnp.ndarray, threshold: jnp.ndarray,
                     rows: int, cols: int, masked: bool):
    """One [rows × cols] tile of the triangular N² self-search count phase.

    The self-search distance matrix is symmetric, so the host only
    dispatches tiles on or above the block diagonal (~2x less scan work);
    each dispatch is a single fused xor+popcount+compare+reduce block —
    no in-device scan/cond machinery, which measured slower than the work
    it saved.  ``masked=True`` compiles the one diagonal-straddling tile
    per row block with a strict j > i mask (excludes self-pairs and the
    below-diagonal corner); all other tiles run the plain unmasked kernel.

    acc [rows] i32 — running row counts for this row block (device array;
    passing it in keeps the host loop free of readbacks until the end)
    @return acc + per-needle #{hits in this tile}
    """
    nb = jax.lax.dynamic_slice(haystack, (row_base, 0), (rows, 2))
    row_valid = jax.lax.dynamic_slice(valid, (row_base,), (rows,))
    hs = jax.lax.dynamic_slice(haystack, (col_base, 0), (cols, 2))
    vs = jax.lax.dynamic_slice(valid, (col_base,), (cols,))
    d = _chunk_dists(nb[:, 0], nb[:, 1], hs[:, 0], hs[:, 1])
    hit = (d < threshold) & (vs & row_valid[:, None])
    if masked:
        col_ids = col_base + jnp.arange(cols, dtype=jnp.int32)
        row_ids = row_base + jnp.arange(rows, dtype=jnp.int32)
        hit &= col_ids[None, :] > row_ids[:, None]
    return acc + hit.sum(axis=1, dtype=jnp.int32)


def _bucket(n: int, minimum: int = 1024, chunk: int = 1 << 21,
            multiple: int = 1) -> int:
    """Device-array bucket size: powers of two for small stores (bounds the
    number of compiled shapes), chunk multiples beyond one scan chunk
    (power-of-two padding would scan up to 2x dead rows at 10M+ items).
    ``multiple`` forces divisibility (index-axis shard count)."""
    if n > chunk:
        b = -(-n // chunk) * chunk
    else:
        b = minimum
        while b < n:
            b *= 2
    if multiple > 1:
        b = -(-b // multiple) * multiple
    return b


def _search_mesh():
    """The mesh used for index sharding, or None on a single device.
    Cached; multi-chip search engages automatically when >1 device exists."""
    global _MESH
    if _MESH is _UNSET:
        import jax as _jax
        if len(_jax.devices()) > 1:
            from ..parallel.sharded import make_mesh
            _MESH = make_mesh()
        else:
            _MESH = None
    return _MESH


_UNSET = object()
_MESH = _UNSET


class PackedHashStore:
    """Device-resident packed hash index with tombstone removal.

    The TPU-native equivalent of DctHashIndex's parallel arrays
    (/root/reference/src/dcthashindex.cpp:70-114): one [N, 2] uint32 hash
    array + one [N] uint32 media-id array, padded to a power-of-two bucket
    so searches reuse compiled programs.  add() appends, remove() tombstones
    in place, slice() builds a subset copy — matching the Index contract
    (src/index.h:237-270).
    """

    def __init__(self, hashes: np.ndarray | None = None,
                 ids: np.ndarray | None = None):
        self._hashes = np.zeros(0, dtype=np.uint64)
        self._ids = np.zeros(0, dtype=np.uint32)
        self._dev = None  # (hashes [N,2] u32, valid [N] bool) on device
        self._dev_rep = None  # replicated copy for sharded self-search
        # int32 view of the validity mask for the MXU count path
        # (ops/mxu_count unpacks the packed pairs in-kernel; narrow-block
        # bitwidth changes hit Mosaic's minor-tiling limit, so validity
        # crosses the boundary as int32)
        self._mxu_v32 = None
        self._id_rows = None  # (sorted_ids, rows_sorted) id→row cache
        # optional directory + name for the persistent pigeonhole
        # sort-order cache (set by the owning index to its _index/cache
        # dir); the content fingerprint invalidates it on any add/remove
        self.cache_dir: str | None = None
        self.cache_name: str = "store"
        self._fp: str | None = None
        if hashes is not None and len(hashes):
            self._hashes = np.asarray(hashes, dtype=np.uint64).copy()
            self._ids = np.asarray(ids, dtype=np.uint32).copy()

    def __len__(self) -> int:
        return len(self._hashes)

    @property
    def ids(self) -> np.ndarray:
        return self._ids

    @property
    def hashes(self) -> np.ndarray:
        return self._hashes

    def memory_usage(self) -> int:
        return self._hashes.nbytes + self._ids.nbytes

    def add(self, hashes: np.ndarray, ids: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        self._hashes = np.concatenate(
            [self._hashes, np.asarray(hashes, dtype=np.uint64)])
        self._ids = np.concatenate([self._ids, np.asarray(ids, dtype=np.uint32)])
        self._dev = None
        self._dev_rep = None
        self._mxu_v32 = None
        self._id_rows = None
        self._fp = None

    def remove(self, ids) -> None:
        """Tombstone by media id (reference zeroes id+hash, keeps the slot)."""
        if len(self._ids) == 0:
            return
        kill = np.isin(self._ids, np.asarray(list(ids), dtype=np.uint32))
        if kill.any():
            self._ids[kill] = 0
            self._hashes[kill] = 0
            self._dev = None
            self._dev_rep = None
            self._mxu_v32 = None
            self._id_rows = None
            self._fp = None

    def slice(self, media_ids) -> "PackedHashStore":
        keep = np.isin(self._ids, np.asarray(list(media_ids), dtype=np.uint32))
        keep &= self._ids != 0
        return PackedHashStore(self._hashes[keep], self._ids[keep])

    def fingerprint(self) -> str:
        """Content fingerprint of the store (hashes + ids), cached until
        the next add/remove — keys the persistent pigeonhole sort-order
        cache (ops/pigeonhole.SortOrderCache).  blake2b streams ~1 GB/s,
        so validating a 10M-row store costs ~0.1 s vs the ~22 s host sort
        it avoids."""
        if self._fp is None:
            import hashlib

            from ..utils.log import profile_stage
            with profile_stage(f"store fingerprint ({len(self._hashes)} rows)"):
                h = hashlib.blake2b(digest_size=16)
                h.update(np.int64(len(self._hashes)).tobytes())
                h.update(self._hashes.tobytes())
                h.update(self._ids.tobytes())
                self._fp = h.hexdigest()
        return self._fp

    def _host_bucket_arrays(self, shard_multiple: bool = True):
        """@param shard_multiple pad to a multiple of the index-axis shard
        count (required for index-sharded placement; the replicated
        self-search copy must NOT use it — a 3- or 6-shard mesh would
        produce a bucket the power-of-two count tiles don't divide)."""
        mesh = _search_mesh()
        shards = (mesh.devices.shape[1]
                  if shard_multiple and mesh is not None else 1)
        n = len(self._hashes)
        b = _bucket(max(n, 1), multiple=shards)
        pairs = np.zeros((b, 2), dtype=np.uint32)
        valid = np.zeros(b, dtype=bool)
        if n:
            pairs[:n] = split_u64(self._hashes)
            valid[:n] = self._ids != 0
        return pairs, valid

    def _device_arrays(self):
        if self._dev is None:
            from ..utils.log import profile_stage
            mesh = _search_mesh()
            with profile_stage(f"store upload ({len(self._hashes)} rows)"):
                pairs, valid = self._host_bucket_arrays()
                if mesh is not None:
                    from ..parallel.sharded import shard_index_arrays
                    self._dev = shard_index_arrays(mesh, pairs, valid)
                else:
                    self._dev = (jnp.asarray(pairs), jnp.asarray(valid))
                    # force the transfer now so the cost lands in this
                    # stage, not in the first count dispatch
                    self._dev[0].block_until_ready()
        return self._dev

    def _device_arrays_replicated(self):
        """Fully-replicated copy for the balanced sharded self-search
        (sharded_self_count): any chip can process any tile.  Cached
        separately from the index-sharded arrays used by plain queries."""
        if getattr(self, "_dev_rep", None) is None:
            mesh = _search_mesh()
            pairs, valid = self._host_bucket_arrays(shard_multiple=False)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())
            self._dev_rep = (jax.device_put(pairs, rep),
                             jax.device_put(valid, rep))
        return self._dev_rep

    def _mxu_valid(self, valid_dev):
        """int32 view of the tombstone mask for the MXU count kernels,
        cached until the next add/remove (see ops/mxu_count.py)."""
        if self._mxu_v32 is None:
            self._mxu_v32 = valid_dev.astype(jnp.int32)
        return self._mxu_v32

    def _count_call(self, nb, pairs_dev, valid_dev, threshold):
        mesh = _search_mesh()
        if mesh is not None:
            from ..parallel.sharded import sharded_count_below
            return sharded_count_below(mesh, jnp.asarray(nb), pairs_dev,
                                       valid_dev, threshold)
        n_pad = pairs_dev.shape[0]
        from . import mxu_count as mc
        if mc.mxu_enabled(n_pad) and threshold < 64:
            # MXU ±1-matmul count: 1.4-2x the VPU tile loop on v5e and one
            # dispatch instead of n_pad/cols (experiments/mxu_count_ab.py)
            return mc.count_below_padded(nb, pairs_dev,
                                         self._mxu_valid(valid_dev),
                                         threshold)
        cols = min(1 << 16 if n_pad <= 1 << 20 else 1 << 17, n_pad)
        nb_dev = jnp.asarray(nb)
        acc = jnp.zeros(nb_dev.shape[0], jnp.int32)
        t = jnp.int32(threshold)
        for cb in range(0, n_pad, cols):
            acc = _count_tile(acc, nb_dev, jnp.int32(cb), pairs_dev,
                              valid_dev, t, cols=cols)
        return acc

    @staticmethod
    def _topk_call(nb, pairs_dev, valid_dev, k, recall=0.99):
        mesh = _search_mesh()
        if mesh is not None:
            from ..parallel.sharded import sharded_hamming_topk
            return sharded_hamming_topk(mesh, jnp.asarray(nb), pairs_dev,
                                        valid_dev, k=k, recall=recall)
        return hamming_topk(jnp.asarray(nb), pairs_dev, valid_dev, k=k,
                            recall=recall)

    def search(self, needle_hashes: np.ndarray, threshold: int, k: int = 64,
               needle_batch: int = 1024, min_hits: int = 1):
        """Batched threshold search.

        @param needle_hashes [Q] uint64
        @param min_hits skip needles with fewer than this many raw hits —
               pass 2 for self-search (needles that are index members always
               hit themselves, which would defeat the cheap-phase gate)
        @return list (len Q) of (ids [m] uint32, dists [m] int32) with
                dist < threshold, ascending by distance, capped at k

        Two-phase on big indexes: a fused count-below-threshold scan first
        (XLA fuses the popcount into the reduction — one HBM pass, no
        distance matrix), then the top-k sort path only for needles that
        actually hit.  N² -similar over dup-sparse corpora is dominated by
        the cheap phase.
        """
        q_total = len(needle_hashes)
        if q_total == 0 or len(self._hashes) == 0:
            return [(np.zeros(0, np.uint32), np.zeros(0, np.int32))] * q_total
        pairs_dev, valid_dev = self._device_arrays()
        k = min(k, len(self._hashes))
        needles = split_u64(np.asarray(needle_hashes, dtype=np.uint64))
        empty = (np.zeros(0, np.uint32), np.zeros(0, np.int32))
        results: list = [empty] * q_total

        # launch every device call asynchronously and sync once per phase —
        # per-call host sync costs 100+ ms through a remote TPU tunnel
        hot = np.arange(q_total)
        if len(self._hashes) > 4096 and q_total > 64:
            # batch bucket: next power of two (≥128, ≤4096/16384) so a
            # 1000-needle query scans at 1024 wide, not padded to 4096
            cap = 4096 if q_total <= 65536 else 16384
            cb = min(cap, max(128, 1 << (q_total - 1).bit_length()))
            pending = []
            for s in range(0, q_total, cb):
                nb = needles[s:s + cb]
                rows = nb.shape[0]
                if rows < cb:  # fixed batch shape: tail pads up, no recompile
                    nb = np.pad(nb, ((0, cb - rows), (0, 0)))
                pending.append((s, rows, self._count_call(
                    nb, pairs_dev, valid_dev, threshold)))
            counts = np.zeros(q_total, np.int32)
            for s, rows, c in pending:
                counts[s:s + rows] = np.asarray(c)[:rows]
            hot = np.nonzero(counts >= min_hits)[0]
            if len(hot) == 0:
                return results

        return self._topk_phase(needles, hot, results, pairs_dev, valid_dev,
                                threshold, k, needle_batch)

    def search_self(self, threshold: int, k: int = 64,
                    needle_batch: int = 1024, rows: int = 0,
                    cols: int = 0, min_n: int = 1 << 16,
                    sparse: bool = False):
        """N² self-search: every store row queried against the whole store,
        equivalent to ``search(self.hashes, threshold, k, min_hits=2)`` but
        with the count phase run over the upper triangle only (the matrix
        is symmetric — see _self_count_tile), ~2x less scan work.  Needles
        whose duplicates are all *earlier* rows are never row-hot; their
        results are mirrored out of the hot needles' full scans (every
        (i, j) hit has a hot i).  Used by -similar when the needle set IS
        the index.

        @param sparse return {row: (ids, dists)} holding ONLY rows with
               hits instead of a dense N-list.  At 10M+ rows the dense
               list costs GBs of tuple objects and forces every consumer
               into an O(N) Python loop over a dup-sparse result
               (VERDICT r03: the 2M CLI -similar spent 175 of 177 s
               there); the hot set is what the count phase already read
               back, so sparse is free here."""
        n = len(self._hashes)
        if n == 0:
            return {} if sparse else []
        mesh = _search_mesh()
        if n <= min_n or (mesh is not None and n > 1 << 28):
            # small stores are count-phase-cheap — plain path; gigantic
            # stores can't replicate per chip for the balanced sharded
            # triangle (beyond ~2GB/chip the index-sharded scan wins on
            # capacity)
            dense = self.search(self._hashes, threshold, k, min_hits=2)
            if sparse:
                return {r: v for r, v in enumerate(dense) if len(v[0])}
            return dense
        pairs_dev, valid_dev = self._device_arrays()
        if mesh is not None:
            # balanced multi-chip triangle: replicated haystack (bucketed
            # without the shard multiple so the power-of-two tiles divide
            # it), one tile per chip per step, per-chip local count state
            pairs_rep, valid_rep = self._device_arrays_replicated()
            n_pad = pairs_rep.shape[0]
        else:
            n_pad = pairs_dev.shape[0]
        # tile shape (2026-08 sweep on v5e, 500k/2M): small col tiles beat
        # wide ones ~1.6x per pair (a [16384 x 2^19] monolith runs in a
        # slower regime), and wider row blocks amortize dispatches; skip
        # granularity only needs cols << n_pad
        if not rows:
            rows = 16384 if n_pad <= 1 << 20 else 32768
        if not cols:
            cols = 1 << 16 if n_pad <= 1 << 20 else 1 << 17
        rows = min(rows, n_pad)        # all divide n_pad: powers of two
        cols = min(cols, n_pad)        # (≤2^21) or multiples of 2^21
        assert n_pad % rows == 0 and n_pad % cols == 0, \
            (n_pad, rows, cols)  # clamped dynamic_slice would double-count
        k = min(k, n)
        from . import mxu_count as mc
        # per-chip/tile counts run the ±1-matmul kernel when enabled (the
        # kernels unpack the packed store in-kernel); BC_MASKED is the
        # narrowest column block either branch dispatches
        use_mxu = (mc.mxu_enabled(n_pad) and threshold < 64
                   and rows % mc.BQ == 0 and cols % mc.BC_MASKED == 0)
        from ..utils.log import profile_stage
        # hot = store rows with ≥1 neighbor at a LATER row; hot_counts =
        # their exact later-row hit counts (the verify invariant below).
        # The count phase reads back only these (a packed nonzero bitmask
        # + one gather) — never the full [N] int32 counts array, which
        # costs seconds through the axon tunnel at 10M rows.
        hot = hot_counts = None
        from . import pigeonhole
        if mesh is not None:
            used_ph = False  # extraction is single-device-only
            if pigeonhole.enabled():
                # same sorted count phase, chunks round-robined one per
                # chip (replicated sorted arrays, per-chip local state,
                # one psum per block)
                sp = pigeonhole.self_counts_sparse(
                    pairs_rep, valid_rep, threshold,
                    int(np.count_nonzero(self._ids)), mesh=mesh)
                if sp is not None:
                    hot, hot_counts = sp
            if hot is None:
                from ..parallel.sharded import sharded_self_count
                counts = sharded_self_count(mesh, pairs_rep, valid_rep,
                                            threshold, rows, cols,
                                            use_mxu=use_mxu)[:n]
                hot = np.nonzero(counts >= 1)[0]
                hot_counts = counts[hot]
        else:
            if pigeonhole.enabled():
                # pigeonhole sorted count phase: 15-51x fewer pair
                # evaluations than the triangle at small thresholds, 3.5x
                # measured at 2M/t=5 (falls back None outside its sweet
                # spot — see ops/pigeonhole.py).  Host bucket copies are
                # built LAZILY inside the count phase, only when the host
                # sort engages without a sort-cache hit (~120 MB per call
                # at 10M rows otherwise).
                sort_cache = None
                if self.cache_dir:
                    sort_cache = pigeonhole.SortOrderCache(
                        self.cache_dir, self.fingerprint(),
                        name=self.cache_name)
                with profile_stage("self_search count (pigeonhole)"):
                    sp = pigeonhole.self_counts_sparse(
                        pairs_dev, valid_dev, threshold,
                        int(np.count_nonzero(self._ids)),
                        host_arrays=self._host_bucket_arrays,
                        sort_cache=sort_cache)
                if sp is not None:
                    hot, hot_counts = sp
            used_ph = hot is not None
            if hot is None:
                with profile_stage("self_search count (classic)"):
                    counts = self._classic_self_counts(
                        pairs_dev, valid_dev, threshold, n_pad, rows, cols,
                        use_mxu)
                hot = np.nonzero(counts >= 1)[0]
                hot_counts = counts[hot]
        hot = hot[hot < n]  # bucket padding rows are never truly hot
        hot_counts = hot_counts[:len(hot)]
        # assembled sparsely: only rows that get hits are ever written
        # (scan, mirror, escalation); dense expansion happens at return
        results: dict = {}
        if len(hot) == 0:
            return self._self_result(results, n, sparse)
        needles = split_u64(self._hashes)
        scan_rows = hot
        if (mesh is None and used_ph
                and os.environ.get("CBIRD_PH_EXTRACT", "off").lower()
                in ("on", "1", "yes")):
            # OPT-IN (measured negative, kept as a worked example): windowed
            # hit extraction from the pigeonhole sorted orders visits
            # ~T·2s candidates per hot needle instead of a full N rescan,
            # but the [B, 2s+1] random gathers run far below the streaming
            # scan rate — 10M/t=5 same-process A/B: 67.5 s vs 14.1 s with
            # the plain rescan (experiments/ph_extract_ab.py).  Exact-count
            # verification below backstops it regardless.
            ext = pigeonhole.extract_hits(pairs_dev, valid_dev, threshold,
                                          hot, int(np.count_nonzero(
                                              self._ids)), k)
            if ext is not None:
                hits, scan_rows = ext
                for row, (rr, dd) in hits.items():
                    if len(rr):
                        results[row] = (self._ids[rr], dd)
        if len(scan_rows):
            with profile_stage(f"self_search topk ({len(scan_rows)} hot)"):
                self._topk_phase(needles, scan_rows, results, pairs_dev,
                                 valid_dev, threshold, k, needle_batch,
                                 recall=0.999)
        # Saturation escalation: a hot needle whose list filled to k may
        # have truncated hits, and a dropped (i, j) pair would make the
        # mirror below silently lose j's only match.  Rescan saturated
        # needles with growing k until every hot list is complete (rare:
        # needs a duplicate cluster larger than k).
        kk = k
        sat = [i for i in hot if len(results.get(i, _EMPTY)[0]) >= kk]
        pathological = False
        while sat and kk < n:
            kk = min(kk * 4, n, 1 << 16)
            with profile_stage(f"self_search saturation ({len(sat)})"):
                self._topk_phase(needles, np.asarray(sat), results,
                                 pairs_dev, valid_dev, threshold, kk,
                                 needle_batch, recall=0.999)
            sat = [i for i in sat if len(results.get(i, _EMPTY)[0]) >= kk]
            if sat and kk >= 1 << 16:
                pathological = True  # >65536-member duplicate cluster
                break
        if not pathological:
            # Exact-recall invariant: the count phase is exact, so
            # hot_counts[i] is the true number of later-row hits for hot
            # needle i; the 0.999-recall approx scan can still drop one,
            # and a dropped (i, j) pair silently loses j's only match
            # after mirroring.  Verify per hot needle (distances are
            # exact, so the scan can only MISS, never fabricate) and
            # rescan mismatches with the exact sort.
            with profile_stage("self_search verify"):
                bad_ix = np.nonzero(
                    self._later_row_hits(hot, results) < hot_counts)[0]
                kk2 = kk
                while len(bad_ix):
                    bad = hot[bad_ix]
                    self._topk_phase(needles, bad, results, pairs_dev,
                                     valid_dev, threshold, kk2,
                                     needle_batch, recall=1.0)
                    bad_ix = bad_ix[self._later_row_hits(bad, results)
                                    < hot_counts[bad_ix]]
                    if not len(bad_ix) or kk2 >= min(n, 1 << 16):
                        break  # exact scan still short: list capped at kk2
                    kk2 = min(kk2 * 4, n, 1 << 16)
        if pathological:
            # complete source lists are off the table — run the plain
            # two-phase search for every row the triangle never scanned
            cold = np.setdiff1d(np.arange(n, dtype=np.int64), hot)
            for r, res in zip(cold, self.search(
                    self._hashes[cold], threshold, k=k, min_hits=2)):
                ids, ds = res
                if (len(ids) == 1 and ids[0] == self._ids[r]
                        and ds[0] == 0):  # lone self-hit ≠ a duplicate
                    continue
                if len(ids):
                    results[r] = res
        else:
            with profile_stage("self_search mirror"):
                mirrored_rows = self._mirror_self_matches(results, hot, k)
        for i in hot:  # restore the caller's k cap after escalation
            ids, ds = results.get(i, _EMPTY)
            if len(ids) > k:
                results[i] = (ids[:k], ds[:k])
        if not pathological and mirrored_rows:
            # a row never scanned itself stays empty, so only mirror
            # targets can overflow (a full O(N) sweep here would cost more
            # host time than the whole count phase at 100M rows)
            overflow = [r for r in mirrored_rows
                        if len(results.get(r, _EMPTY)[0]) >= k]
            if overflow:  # mirrored ≥ k hits: mirror may have truncated
                # differently than the needle's own top-k would — rescan
                self._topk_phase(needles, np.asarray(overflow), results,
                                 pairs_dev, valid_dev, threshold, k,
                                 needle_batch, recall=0.999)
        return self._self_result(results, n, sparse)

    @staticmethod
    def _self_result(results: dict, n: int, sparse: bool):
        """Sparse dict → caller format: drop empty rows (sparse) or expand
        to the dense N-list (legacy callers and the parity tests)."""
        if sparse:
            return {r: v for r, v in results.items() if len(v[0])}
        dense = [_EMPTY] * n
        for r, v in results.items():
            dense[r] = v
        return dense

    def _classic_self_counts(self, pairs_dev, valid_dev, threshold, n_pad,
                             rows, cols, use_mxu):
        """Triangular tiled count phase (the pre-pigeonhole path; still the
        fallback for big thresholds and degenerate key skew)."""
        from . import mxu_count as mc
        n = len(self._hashes)
        # launch every on/above-diagonal tile asynchronously, sync once
        if use_mxu:
            v32 = self._mxu_valid(valid_dev)
        thresh_dev = jnp.int32(threshold)
        row_parts = []
        for rb in range(0, n_pad, rows):
            acc = jnp.zeros(rows, jnp.int32)
            for cb in range(0, n_pad, cols):
                if cb + cols <= rb:
                    continue  # tile entirely below the diagonal
                if use_mxu:
                    # ±1-matmul count tile: 840 vs 419 G pairs/s at
                    # 10M in a same-process A/B (the one-dispatch-per-
                    # row-block kernel variant measured only 566G —
                    # skipped-cell grid traversal costs more than
                    # these host dispatches save; see
                    # experiments/mxu_selfrows_ab.py)
                    acc = mc.mxu_self_tile(acc, jnp.int32(rb),
                                           jnp.int32(cb), pairs_dev,
                                           v32, thresh_dev, rows=rows,
                                           cols=cols,
                                           masked=cb < rb + rows)
                    continue
                acc = _self_count_tile(acc, jnp.int32(rb),
                                       jnp.int32(cb), pairs_dev,
                                       valid_dev, thresh_dev,
                                       rows=rows, cols=cols,
                                       masked=cb < rb + rows)
            row_parts.append(acc)
        return np.concatenate(jax.device_get(row_parts))[:n]

    def _later_row_hits(self, needle_rows, results):
        """Per needle row i in ``needle_rows``: #{entries of results[i]
        whose store row is > i} — compared against the exact count phase
        to detect approx_min_k recall misses (search_self invariant)."""
        out = np.zeros(len(needle_rows), np.int64)
        sorted_ids, rows_sorted = self._sorted_id_rows()
        if not len(sorted_ids):
            return out.astype(np.int32)
        src_parts, id_parts = [], []
        for j, i in enumerate(needle_rows):
            ids = results.get(i, _EMPTY)[0]
            if len(ids):
                src_parts.append(np.full(len(ids), j, np.int64))
                id_parts.append(ids)
        if not src_parts:
            return out.astype(np.int32)
        src = np.concatenate(src_parts)
        ids = np.concatenate(id_parts)
        pos = np.clip(np.searchsorted(sorted_ids, ids),
                      0, len(sorted_ids) - 1)
        tgt = rows_sorted[pos]
        good = (sorted_ids[pos] == ids) & \
            (tgt > np.asarray(needle_rows, np.int64)[src])
        np.add.at(out, src[good], 1)
        return out.astype(np.int32)

    def _sorted_id_rows(self):
        """(sorted_ids, rows_sorted) for vectorized id→store-row lookups,
        cached until the next add/remove (a fresh 10M-row argsort costs
        ~1 s of host time per search_self verify/mirror pass)."""
        if self._id_rows is None:
            valid_rows = np.nonzero(self._ids)[0]
            order = np.argsort(self._ids[valid_rows])
            self._id_rows = (self._ids[valid_rows][order],
                             valid_rows[order])
        return self._id_rows

    def _mirror_self_matches(self, results, hot, k):
        """Self-search completion: for every hit (i, j) of a row-hot needle
        i, add the symmetric (j, i) hit to j's results if j wasn't scanned
        itself (store ids must be unique — true for Database ids).
        Mirrored lists gain the target's own self-match (distance 0) and
        are ordered like a scan: ascending distance, ties by store row.
        @return list of target rows that received mirrored results"""
        src_parts, id_parts, d_parts = [], [], []
        for i in hot:
            ids, dists = results.get(i, _EMPTY)
            if len(ids):
                src_parts.append(np.full(len(ids), i, np.int64))
                id_parts.append(ids)
                d_parts.append(dists)
        if not src_parts:
            return []
        src = np.concatenate(src_parts)
        hit_ids = np.concatenate(id_parts)
        d = np.concatenate(d_parts)
        # id → store row (vectorized; rows with id 0 are tombstones)
        sorted_ids, rows_sorted = self._sorted_id_rows()
        pos = np.clip(np.searchsorted(sorted_ids, hit_ids),
                      0, max(len(sorted_ids) - 1, 0))
        tgt = rows_sorted[pos]
        hot_mask = np.zeros(len(self._ids), bool)
        hot_mask[hot] = True
        keep = ((sorted_ids[pos] == hit_ids) & (tgt != src) & ~hot_mask[tgt])
        sel = np.nonzero(keep)[0]
        if not len(sel):
            return []
        tgt, d, src = tgt[sel], d[sel], src[sel]
        by_tgt = np.lexsort((src, d, tgt))
        tgt, d, src = tgt[by_tgt], d[by_tgt], src[by_tgt]
        starts = np.nonzero(np.r_[True, tgt[1:] != tgt[:-1]])[0]
        bounds = np.r_[starts[1:], len(tgt)]
        filled = []
        for s0, s1 in zip(starts, bounds):
            r = int(tgt[s0])
            ds = np.r_[np.int32(0), d[s0:s1]]       # own self-match first
            rows = np.r_[np.int64(r), src[s0:s1]]
            o = np.lexsort((rows, ds))[:k]
            results[r] = (self._ids[rows[o]].astype(np.uint32),
                          ds[o].astype(np.int32))
            filled.append(r)
        return filled

    def _topk_phase(self, needles, hot, results, pairs_dev, valid_dev,
                    threshold, k, needle_batch, recall=0.99):
        """Top-k sort for the needles that passed the count gate; fills and
        returns ``results`` (ids/dists below threshold, ascending)."""
        pending = []
        for s in range(0, len(hot), needle_batch):
            sel = hot[s:s + needle_batch]
            nb = needles[sel]
            rows = nb.shape[0]
            qb = needle_batch if len(hot) > needle_batch else _bucket(rows, 64)
            if rows < qb:
                nb = np.pad(nb, ((0, qb - rows), (0, 0)))
            pending.append((sel, self._topk_call(nb, pairs_dev, valid_dev, k,
                                                 recall)))
        for sel, (d, i) in pending:
            rows = len(sel)
            d = np.asarray(d)[:rows]
            i = np.asarray(i)[:rows]
            hit = d < threshold
            # vectorized per-needle assembly: one nonzero + split per batch
            # (a per-row python loop dominates N² runs otherwise)
            r_idx, c_idx = np.nonzero(hit)
            if len(r_idx) == 0:
                continue
            rows_flat = i[r_idx, c_idx]
            ids_flat = self._ids[rows_flat]
            d_flat = d[r_idx, c_idx]
            uniq, starts = np.unique(r_idx, return_index=True)
            bounds = np.append(starts[1:], len(r_idx))
            for u, s0, s1 in zip(uniq, starts, bounds):
                # deterministic tie order (dist, store row): approx_min_k's
                # own tie order varies, and the pigeonhole extraction path
                # must return bit-identical lists
                o = np.lexsort((rows_flat[s0:s1], d_flat[s0:s1]))
                results[sel[u]] = (ids_flat[s0:s1][o], d_flat[s0:s1][o])
        return results


# ---------------------------------------------------------------------------
# generic multi-lane (e.g. 256-bit ORB) variant
# ---------------------------------------------------------------------------

def _chunk_dists_lanes(n: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """[Q, L] uint32 needles vs [C, L] haystack → [Q, C] int32 distances."""
    d = jnp.zeros((n.shape[0], h.shape[0]), jnp.int32)
    for lane in range(n.shape[1]):
        d = d + jax.lax.population_count(
            jnp.bitwise_xor(n[:, lane, None], h[None, :, lane])).astype(jnp.int32)
    return d


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def hamming_lanes_topk(needles: jnp.ndarray, haystack: jnp.ndarray,
                       valid: jnp.ndarray, k: int = 10, chunk: int = 1 << 14):
    """Per-needle k nearest rows by Hamming distance over L uint32 lanes
    (L=8 → 256-bit ORB descriptors; the reference uses FLANN LSH + knnSearch
    k=10, src/cvfeaturesindex.cpp:438-531 — brute force wins on TPU)."""
    q = needles.shape[0]
    n = haystack.shape[0]
    k = min(k, max(n, 1))
    if n == 0:
        return (jnp.full((q, k), BAD_DIST, jnp.int32),
                jnp.full((q, k), -1, jnp.int32))
    if n <= chunk:
        d = _chunk_dists_lanes(needles, haystack)
        d = jnp.where(valid[None, :], d, BAD_DIST)
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx
    n_pad = -n % chunk
    if n_pad:
        haystack = jnp.pad(haystack, ((0, n_pad), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad))
    n_chunks = haystack.shape[0] // chunk
    hs = haystack.reshape(n_chunks, chunk, -1)
    vs = valid.reshape(n_chunks, chunk)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(_, inp):
        hs_c, vs_c, base = inp
        d = _chunk_dists_lanes(needles, hs_c)
        d = jnp.where(vs_c[None, :], d, jnp.int32(BAD_DIST))
        dk, ik = jax.lax.approx_min_k(d.astype(jnp.float32), k,
                                      recall_target=0.99)
        return None, (dk, ik + base)

    _, (ds, is_) = jax.lax.scan(body, None, (hs, vs, bases))
    ds = jnp.moveaxis(ds, 0, 1).reshape(q, -1)
    is_ = jnp.moveaxis(is_, 0, 1).reshape(q, -1)
    neg, sel = jax.lax.top_k(-ds, k)
    return (-neg).astype(jnp.int32), jnp.take_along_axis(is_, sel, axis=1)
