"""Video search index — algo 4 (`-p.alg video`).

Rebuild of the reference DctVideoIndex
(/root/reference/src/dctvideoindex.{h,cpp}): DCT hash per retained video
frame; media ids come from the media table, hashes from per-video ``.vdx``
files.  Two query modes:

- ``find_frame`` (image needle → videos): nearest frame per video under the
  threshold (reference findFrame, src/dctvideoindex.cpp:291-387);
- ``find_video`` (video needle → videos): every needle frame's per-video
  closest match, re-assembled into temporal ranges by adjacency scoring
  (frame margin 15, minFramesMatched/minFramesNear gates; reference
  findVideo src/dctvideoindex.cpp:399-657).

The reference prunes with a radix tree (`-p.vradix`); here the packed frame
array is scanned brute-force with a per-video segment-min reduction on
device (ops/video_search) — no recall loss, so vradix is accepted but inert.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.video_search import PackedVideoStore
from ..params import FLAG_VIDEO, SearchParams, TYPE_IMAGE, TYPE_VIDEO
from ..store.media import MatchRange, Media, VideoIndexData
from .base import Index, Match

FRAME_MARGIN = 15  # adjacency margin (reference src/dctvideoindex.cpp:593)


class DctVideoIndex(Index):
    id = SearchParams.ALGO_VIDEO

    def __init__(self) -> None:
        self._store = PackedVideoStore()
        self._loaded = False
        self._data_path = ""

    def is_loaded(self) -> bool:
        return self._loaded

    def memory_usage(self) -> int:
        return self._store.memory_usage()

    def count(self) -> int:
        return len(self._store)

    def database_id(self) -> int:
        return 0  # ids come from the media table; payload lives in .vdx files

    def sql_media_ids(self, conn, cache_path: str, data_path: str) -> set[int]:
        out = set()
        for (mid,) in conn.execute("select id from media where type=?",
                                   (TYPE_VIDEO,)):
            if os.path.exists(os.path.join(data_path, f"{mid}.vdx")):
                out.add(mid)
        return out

    # ---- memory lifecycle -------------------------------------------------
    def load(self, conn, cache_path: str, data_path: str) -> None:
        from ..store.vdx import load_vdx
        self._data_path = data_path
        self._store = PackedVideoStore()
        for (mid,) in conn.execute(
                "select id from media where type=? order by id", (TYPE_VIDEO,)):
            path = os.path.join(data_path, f"{mid}.vdx")
            try:
                idx = load_vdx(path)
            except (OSError, ValueError):
                continue
            self._store.add_video(mid, idx.frames, idx.hashes)
        self._loaded = True

    def add(self, media: list[Media]) -> None:
        for m in media:
            if m.type == TYPE_VIDEO and m.videoIndex is not None \
                    and not m.videoIndex.is_empty():
                self._store.add_video(m.id, m.videoIndex.frames,
                                      m.videoIndex.hashes)

    def remove(self, media_ids: list[int]) -> None:
        self._store.remove(media_ids)

    # ---- search -----------------------------------------------------------
    def find(self, needle: Media, params: SearchParams) -> list[Match]:
        if needle.type == TYPE_VIDEO:
            return self._find_video(needle, params)
        return self._find_frame(needle, params)

    def find_batch(self, needles: list[Media], params: SearchParams) -> list[list[Match]]:
        # batch all image needles in one device pass; videos go one by one
        # (each video needle is itself a large frame batch)
        out: list[list[Match]] = [[] for _ in needles]
        img_idx = [i for i, n in enumerate(needles)
                   if n.type == TYPE_IMAGE and n.dctHash]
        if img_idx:
            hashes = np.array([np.uint64(needles[i].dctHash) for i in img_idx],
                              dtype=np.uint64)
            # two-phase like ops/hamming.search: a flat sub-threshold count
            # per needle first (tiled count kernel, ~50x the per-video-min
            # kernel's rate), then the [Q, V] segment-min only for needles
            # that hit anything — in a typical -similar most image needles
            # match no video frame at all
            counts = self._store.flat_hit_counts(hashes, params.dctThresh)
            hot = np.nonzero(counts > 0)[0]
            if len(hot):
                dists, frames = self._store.search(hashes[hot])
                for row, h in enumerate(hot):
                    i = img_idx[h]
                    out[i] = self._frame_matches(needles[i], dists[row],
                                                 frames[row], params)
        vid_idx = [i for i, n in enumerate(needles) if n.type == TYPE_VIDEO]
        frame_counts = None
        live: list[int] = []
        trims: dict = {}
        if len(vid_idx) > 8 and any(self._store.media_ids):
            # video↔video N² pre-gate: per-frame flat hit counts at the
            # fast tiled-count rate (every per-(needle, video) device
            # formulation measured ~50x slower — docs/TODO.md), then the
            # detailed per-video search only for needles with enough
            # frames carrying a cross-video hit.  A stored needle's frame
            # always hits itself exactly once (same-video retained frames
            # are ≥ vht > dctThresh apart), so stored needles require
            # ≥ 2 counts per frame, unstored ≥ 1.
            trims = {i: self._trimmed_needle(needles[i], params)
                     for i in vid_idx}
            live = [i for i in vid_idx
                    if trims[i] is not None and len(trims[i][1])]
            if live:
                all_hashes = np.concatenate([trims[i][1] for i in live])
                frame_counts = self._store.flat_hit_counts(
                    all_hashes, params.dctThresh)
        if frame_counts is not None:
            gate = max(1, params.minFramesMatched)
            pos = 0
            for i in live:
                nf = len(trims[i][1])
                c = frame_counts[pos:pos + nf]
                pos += nf
                # per-frame self hits by actual membership in the stored
                # hash set (not assumed 1 for every frame of a stored
                # needle — a caller-supplied videoIndex can diverge from
                # the stored .vdx, which would undercount cross hits)
                stored = self._store.video_hashes(needles[i].id)
                if stored is not None and not params.filterSelf:
                    # without filterSelf a stored needle always matches
                    # itself, so it must reach the detailed phase
                    out[i] = self._find_video(needles[i], params,
                                              trimmed=trims[i])
                    continue
                if stored is not None:
                    self_hits = np.isin(trims[i][1], stored)
                else:
                    self_hits = np.zeros(nf, dtype=bool)
                if int((c > self_hits).sum()) >= gate:
                    out[i] = self._find_video(needles[i], params,
                                              trimmed=trims[i])
        else:
            for i in vid_idx:
                out[i] = self._find_video(needles[i], params)
        return out

    def _frame_matches(self, needle: Media, dists: np.ndarray, frames: np.ndarray,
                       params: SearchParams) -> list[Match]:
        """Nearest frame per video under threshold → matches."""
        out = []
        src_in = needle.matchRange.dstIn
        if src_in < 0:
            src_in = 0
        for slot, mid in enumerate(self._store.media_ids):
            if mid == 0:
                continue
            d = int(dists[slot])
            if d < params.dctThresh:
                out.append(Match(mid, d, MatchRange(src_in, int(frames[slot]), 1)))
        return out

    def _find_frame(self, needle: Media, params: SearchParams) -> list[Match]:
        if not needle.dctHash:
            return []
        h = np.array([np.uint64(needle.dctHash)], dtype=np.uint64)
        if int(self._store.flat_hit_counts(h, params.dctThresh)[0]) == 0:
            return []  # no sub-threshold frame anywhere — skip the [Q,V] scan
        dists, frames = self._store.search(h)
        return self._frame_matches(needle, dists[0], frames[0], params)

    def _needle_video_index(self, needle: Media) -> VideoIndexData | None:
        if needle.id == 0 or (needle.videoIndex is not None
                              and not needle.videoIndex.is_empty()):
            return needle.videoIndex
        from ..store.vdx import load_vdx
        try:
            return load_vdx(os.path.join(self._data_path, f"{needle.id}.vdx"))
        except (OSError, ValueError):
            return None

    def _trimmed_needle(self, needle: Media, params: SearchParams):
        """Needle video frames with skipFrames trimmed at both ends
        (reference src/dctvideoindex.cpp:429-431), or None."""
        src = self._needle_video_index(needle)
        if src is None or src.is_empty():
            return None
        last = int(src.frames[-1])
        keep = (src.frames >= params.skipFrames) & \
               (src.frames <= last - params.skipFrames)
        return src.frames[keep], src.hashes[keep]

    def _find_video(self, needle: Media, params: SearchParams,
                    trimmed=None) -> list[Match]:
        if trimmed is None:  # gated callers pass the trim they computed
            trimmed = self._trimmed_needle(needle, params)
        if trimmed is None:
            return []
        q_frames, q_hashes = trimmed
        if len(q_frames) == 0:
            return []

        dists, mframes = self._store.search(q_hashes)  # [Q, V]

        results: list[Match] = []
        media_ids = self._store.media_ids
        hit = dists < params.dctThresh  # [Q, V]
        # vectorized slot gate: scoring only touches videos with enough
        # frame hits — a python loop over every stored video per needle
        # made video↔video N² quadratic in host time
        slot_counts = hit.sum(axis=0)
        for slot in np.nonzero(
                slot_counts >= max(1, params.minFramesMatched))[0]:
            mid = media_ids[slot]
            if mid == 0:
                continue
            if params.filterSelf and mid == needle.id:
                continue
            rows = np.nonzero(hit[:, slot])[0]
            num = len(rows)
            pairs = sorted((int(q_frames[r]), int(mframes[r, slot])) for r in rows)
            # adjacency scoring over the *matched* frame numbers
            num_adjacent = 0
            last_frame = 0
            for _, dst in pairs:
                if abs(dst - last_frame) < FRAME_MARGIN:
                    num_adjacent += 1
                last_frame = dst
            percent_near = num_adjacent * 100 // num
            if percent_near < params.minFramesNear:
                continue
            rng = MatchRange(pairs[0][0], pairs[0][1],
                             max(pairs[-1][0] - pairs[0][0],
                                 pairs[-1][1] - pairs[0][1]))
            results.append(Match(mid, 100 - percent_near, rng))
        return results

    def find_index_data(self, media: Media) -> bool:
        if media.id and media.type == TYPE_VIDEO and media.videoIndex is None:
            idx = self._needle_video_index(media)
            if idx is not None:
                media.videoIndex = idx
                return True
        return False

    def slice(self, media_ids: set[int]) -> "DctVideoIndex":
        chunk = DctVideoIndex()
        chunk._data_path = self._data_path
        chunk._loaded = True
        keep = {int(i) for i in media_ids}
        store = self._store
        store._consolidate()  # pending per-video appends → flat arrays
        for slot, mid in enumerate(store.media_ids):
            if mid in keep:
                sel = store._vidx == slot
                chunk._store.add_video(mid, store._frames[sel], store._hashes[sel])
        return chunk

    def result_types(self) -> int:
        return FLAG_VIDEO
