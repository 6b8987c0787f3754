"""ORB descriptor index — algo 2 (`-p.alg orb`).

Rebuild of the reference CvFeaturesIndex
(/root/reference/src/cvfeaturesindex.{h,cpp}): 256-bit binary descriptors
(≤400/image) searched k-nearest with median-score voting.  The reference
builds an OpenCV FLANN LSH index with a bucket-memory heuristic
(src/cvfeaturesindex.cpp:317-385); here all descriptors live in one packed
[T, 8]-uint32 array scanned brute-force with the multi-lane XOR-popcount
kernel — exact (LSH is approximate) and MXU/VPU-friendly.

Voting replicates find() (src/cvfeaturesindex.cpp:438-604): per needle
descriptor take the 10 nearest; drop hits with distance ≥ cvThresh; per
candidate image collect distances; score = median(distances)·1000/count.

Storage: ``matrix(media_id integer primary key, rows integer, data blob)``
in media2.db — zlib-compressed [K,32] uint8 descriptor matrix (the
reference stores qCompress'd cv::Mat blobs, src/cvfeaturesindex.cpp:69-94).
"""

from __future__ import annotations

import zlib

import numpy as np

import jax.numpy as jnp

from ..ops.hamming import BAD_DIST, hamming_lanes_topk
from ..params import FLAG_IMAGE, SearchParams, TYPE_IMAGE
from ..store.media import Media
from .base import Index, Match

KNN = 10


class _PackedDescStore:
    """[T, 8]-uint32 descriptor rows + per-row media id, tombstoned."""

    def __init__(self):
        self._desc = np.zeros((0, 8), dtype=np.uint32)
        self._ids = np.zeros(0, dtype=np.uint32)
        self._dev = None

    def __len__(self):
        return len(self._ids)

    @property
    def ids(self):
        return self._ids

    @property
    def descriptors(self):
        return self._desc

    def memory_usage(self) -> int:
        return self._desc.nbytes + self._ids.nbytes

    def add(self, desc: np.ndarray, ids: np.ndarray) -> None:
        if len(ids) == 0:
            return
        self._desc = np.concatenate([self._desc, np.asarray(desc, np.uint32)])
        self._ids = np.concatenate([self._ids, np.asarray(ids, np.uint32)])
        self._dev = None

    def remove(self, ids) -> None:
        if not len(self._ids):
            return
        kill = np.isin(self._ids, np.asarray(list(ids), dtype=np.uint32))
        if kill.any():
            self._ids[kill] = 0
            self._desc[kill] = 0
            self._dev = None

    def slice(self, media_ids) -> "_PackedDescStore":
        keep = np.isin(self._ids, np.asarray(list(media_ids), dtype=np.uint32))
        keep &= self._ids != 0
        out = _PackedDescStore()
        out.add(self._desc[keep], self._ids[keep])
        return out

    def _device(self):
        if self._dev is None:
            from ..ops.hamming import _bucket, _search_mesh
            mesh = _search_mesh()
            shards = mesh.devices.shape[1] if mesh is not None else 1
            b = _bucket(max(len(self._ids), 1), multiple=shards)
            desc = np.zeros((b, 8), dtype=np.uint32)
            valid = np.zeros(b, dtype=bool)
            if len(self._ids):
                desc[:len(self._ids)] = self._desc
                valid[:len(self._ids)] = self._ids != 0
            if mesh is not None:  # shard descriptor rows over the mesh
                from ..parallel.sharded import shard_index_arrays
                self._dev = shard_index_arrays(mesh, desc, valid)
            else:
                self._dev = (jnp.asarray(desc), jnp.asarray(valid))
        return self._dev

    def knn(self, needles: np.ndarray, k: int = KNN, needle_batch: int = 512):
        """@param needles [Q, 8] uint32 @return (dists [Q,k], ids [Q,k])"""
        q_total = len(needles)
        if q_total == 0 or len(self._ids) == 0:
            return (np.full((q_total, k), BAD_DIST, np.int32),
                    np.zeros((q_total, k), np.uint32))
        desc_d, valid_d = self._device()
        out_d = np.zeros((q_total, k), np.int32)
        out_i = np.zeros((q_total, k), np.uint32)
        for s in range(0, q_total, needle_batch):
            nb = needles[s:s + needle_batch]
            qn = len(nb)
            qb = max(1 << (qn - 1).bit_length(), 64)
            if qn < qb:
                nb = np.pad(nb, ((0, qb - qn), (0, 0)))
            from ..ops.hamming import _search_mesh
            mesh = _search_mesh()
            if mesh is not None:
                from ..parallel.sharded import sharded_lanes_topk
                d, i = sharded_lanes_topk(mesh, jnp.asarray(nb), desc_d,
                                          valid_d, k=min(k, len(self._ids)))
            else:
                d, i = hamming_lanes_topk(jnp.asarray(nb), desc_d, valid_d,
                                          k=min(k, len(self._ids)))
            d, i = np.asarray(d)[:qn], np.asarray(i)[:qn]
            kk = d.shape[1]
            out_d[s:s + qn, :kk] = d
            out_d[s:s + qn, kk:] = BAD_DIST
            out_i[s:s + qn, :kk] = self._ids[i]
        return out_d, out_i


def descriptors_to_u32(desc_u8: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(desc_u8, dtype=np.uint8).reshape(-1, 32) \
        .view(np.uint32).reshape(-1, 8)


class CvFeaturesIndex(Index):
    id = SearchParams.ALGO_CV_FEATURES

    def __init__(self) -> None:
        self._store = _PackedDescStore()
        self._loaded = False

    def is_loaded(self) -> bool:
        return self._loaded

    def memory_usage(self) -> int:
        return self._store.memory_usage()

    def count(self) -> int:
        return len(np.unique(self._store.ids[self._store.ids != 0]))

    def database_id(self) -> int:
        return 2

    # ---- sql ---------------------------------------------------------------
    def create_tables(self, conn) -> None:
        conn.execute("create table if not exists matrix ("
                     " media_id integer primary key not null,"
                     " rows integer not null,"
                     " data blob not null)")

    def add_records(self, conn, media: list[Media]) -> None:
        rows = []
        for m in media:
            # empty descriptor sets are stored too (processed marker; see
            # DctFeaturesIndex.add_records)
            if m.type == TYPE_IMAGE and m.keyPointDescriptors is not None:
                d = np.asarray(m.keyPointDescriptors, dtype=np.uint8)
                rows.append((m.id, len(d), zlib.compress(d.tobytes(), 6)))
        if rows:
            conn.executemany(
                "insert or replace into matrix (media_id, rows, data) values (?,?,?)",
                rows)

    def remove_records(self, conn, media_ids: list[int]) -> None:
        conn.executemany("delete from matrix where media_id=?",
                         [(i,) for i in media_ids])

    def sql_media_ids(self, conn, cache_path: str, data_path: str) -> set[int]:
        return {r[0] for r in conn.execute("select media_id from matrix")}

    # ---- memory -------------------------------------------------------------
    def load(self, conn, cache_path: str, data_path: str) -> None:
        from .cache import load_cache, save_cache
        self._store = _PackedDescStore()
        cached = load_cache(cache_path, "cvfeatures", conn)
        if cached is not None:
            self._store.add(cached["descriptors"], cached["ids"])
            self._loaded = True
            return
        descs, ids = [], []
        for mid, nrows, blob in conn.execute(
                "select media_id, rows, data from matrix"):
            d = np.frombuffer(zlib.decompress(blob), dtype=np.uint8)
            if len(d) != nrows * 32:
                continue  # corrupt row; rebuilt on next -update
            descs.append(descriptors_to_u32(d.reshape(nrows, 32)))
            ids.append(np.full(nrows, mid, dtype=np.uint32))
        if descs:
            self._store.add(np.concatenate(descs), np.concatenate(ids))
        self._loaded = True
        save_cache(cache_path, "cvfeatures",
                   descriptors=self._store.descriptors, ids=self._store.ids)

    def save(self, conn, cache_path: str) -> None:
        if self._loaded:
            from .cache import save_cache
            save_cache(cache_path, "cvfeatures",
                       descriptors=self._store.descriptors, ids=self._store.ids)

    def add(self, media: list[Media]) -> None:
        for m in media:
            if m.type == TYPE_IMAGE and m.keyPointDescriptors is not None \
                    and len(m.keyPointDescriptors):
                d = descriptors_to_u32(np.asarray(m.keyPointDescriptors))
                self._store.add(d, np.full(len(d), m.id, dtype=np.uint32))

    def remove(self, media_ids: list[int]) -> None:
        self._store.remove(media_ids)

    # ---- search -------------------------------------------------------------
    def _needle_descriptors(self, needle: Media) -> np.ndarray:
        if needle.keyPointDescriptors is not None and len(needle.keyPointDescriptors):
            return descriptors_to_u32(np.asarray(needle.keyPointDescriptors))
        if needle.id > 0:
            sel = self._store.ids == needle.id
            return self._store.descriptors[sel]
        return np.zeros((0, 8), dtype=np.uint32)

    def find(self, needle: Media, params: SearchParams) -> list[Match]:
        return self.find_batch([needle], params)[0]

    def find_batch(self, needles: list[Media], params: SearchParams) -> list[list[Match]]:
        per_needle = [self._needle_descriptors(n) for n in needles]
        flat = np.concatenate(per_needle) if per_needle else \
            np.zeros((0, 8), np.uint32)
        if len(flat) == 0:
            return [[] for _ in needles]
        dists, ids = self._store.knn(flat, k=KNN)
        out: list[list[Match]] = []
        pos = 0
        for needle, nd in zip(needles, per_needle):
            k = len(nd)
            votes = self._vote(dists[pos:pos + k], ids[pos:pos + k], params)
            out.append(self._gate(votes, needle.id, params))
            pos += k
        return out

    # vote-gate constants measured on the accuracy corpus
    # (experiments/orb_vote_gate.py, 280 needles x 40 bases): the best
    # non-self match scores 32-300 while cross-base junk never scored
    # below 2166 and trailing same-base matches reached 21.6x the best —
    # gate at 25x with a 500 floor so a very strong best match cannot
    # starve its own weaker true siblings.
    GATE_FLOOR = 500

    @staticmethod
    def _gate(votes: list[Match], needle_id: int, params: SearchParams) -> list[Match]:
        """Relative score gate (VERDICT r03 #7): keep matches scoring
        ≤ max(FLOOR, cvGate · best-non-self score).

        The reference keeps every voted candidate and relies on score
        ordering to push cross-base junk last (src/cvfeaturesindex.cpp:
        575-596) — with maxMatches result slots exceeding the true group
        size, that junk fills the tail.  Junk and true scores separate by
        ~10-60x relative to the needle's best match (data above), so an
        adaptive cut beats any absolute threshold; -p.ovg 0 disables."""
        r = getattr(params, "cvGate", 0)
        if r <= 0 or len(votes) < 2:
            return votes
        others = [m.score for m in votes if m.mediaId != needle_id]
        if not others:
            return votes
        cut = max(CvFeaturesIndex.GATE_FLOOR, r * min(others))
        return [m for m in votes
                if m.mediaId == needle_id or m.score <= cut]

    @staticmethod
    def _vote(dists: np.ndarray, ids: np.ndarray, params: SearchParams) -> list[Match]:
        """Median-of-distances voting (src/cvfeaturesindex.cpp:490-596)."""
        scores: dict[int, list[int]] = {}
        for row_d, row_i in zip(dists, ids):
            for d, mid in zip(row_d.tolist(), row_i.tolist()):
                if mid == 0 or d >= params.cvThresh:
                    continue
                scores.setdefault(mid, []).append(d)
        results = []
        for mid, ds in scores.items():
            ds.sort()
            n = len(ds)
            mid_i = n // 2
            if n < 2:
                median = ds[0]
            elif n % 2 == 0:
                median = (ds[mid_i - 1] + ds[mid_i]) // 2
            else:
                median = ds[mid_i]
            results.append(Match(mid, median * 1000 // n))
        return results

    def find_index_data(self, media: Media) -> bool:
        if media.id and (media.keyPointDescriptors is None
                         or not len(media.keyPointDescriptors)):
            sel = self._store.ids == media.id
            if sel.any():
                media.keyPointDescriptors = self._store.descriptors[sel] \
                    .view(np.uint8).reshape(-1, 32).copy()
                return True
        return False

    def slice(self, media_ids: set[int]) -> "CvFeaturesIndex":
        chunk = CvFeaturesIndex()
        chunk._store = self._store.slice(media_ids)
        chunk._loaded = True
        return chunk

    def result_types(self) -> int:
        return FLAG_IMAGE
