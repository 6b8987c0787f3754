"""Engine — composition root wiring Scanner → Database → indexes.

Rebuild of the reference Engine (/root/reference/src/engine.{h,cpp}):
registers the index plugins into the Database, runs incremental updates
(scan diffing, vdx verification, algo-change sync, batched commits at
writeBatchSize), and executes single-needle queries including mirror
variants and on-the-fly hashing of un-indexed needles.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ..index.dct_hash_index import DctHashIndex
from ..params import IndexParams, SearchParams, TYPE_IMAGE, TYPE_VIDEO
from ..store.database import Database
from ..store.media import Media, MediaGroup
from ..utils.log import info, warn
from .scanner import Scanner


def _available_algo_mask(db: Database) -> int:
    mask = 0
    for i in db.indexes():
        mask |= 1 << i.id
    return mask


class Engine:
    def __init__(self, root: str, index_params: IndexParams | None = None):
        self.params = index_params or IndexParams()
        self.db = Database(root)
        self.scanner = Scanner(self.params)
        self._stop_requested = False
        self._register_indexes()

    def stop_update(self) -> None:
        """Request a graceful stop of a running update (reference
        Engine::stopUpdate): the batch loop commits the media it already
        processed and returns; a later update() resumes from the database
        state, so nothing is lost or double-indexed."""
        self._stop_requested = True

    def _register_indexes(self) -> None:
        """Register all implemented algorithms (reference Engine ctor,
        src/engine.cpp:38-54)."""
        self.db.add_index(DctHashIndex())
        try:
            from ..index.color_desc_index import ColorDescIndex
            self.db.add_index(ColorDescIndex())
        except ImportError:
            pass
        try:
            from ..index.dct_features_index import DctFeaturesIndex
            self.db.add_index(DctFeaturesIndex())
        except ImportError:
            pass
        try:
            from ..index.cv_features_index import CvFeaturesIndex
            self.db.add_index(CvFeaturesIndex())
        except ImportError:
            pass
        try:
            from ..index.dct_video_index import DctVideoIndex
            self.db.add_index(DctVideoIndex())
        except ImportError:
            pass

    # ---- update ----------------------------------------------------------
    def update(self, subdir: str = "",
               progress: Callable[[int, int], None] | None = None) -> dict:
        """Incremental re-scan (reference Engine::update, src/engine.cpp:94-350).

        @return stats dict {added, removed, modified, errors}
        """
        p = self.params
        p.algos &= _available_algo_mask(self.db)
        root = os.path.join(self.db.path(), subdir) if subdir else self.db.path()

        # verify per-video hash files exist & are sane; missing → re-index
        self._verify_vdx_files()

        # metadata-time capability probe (reference src/engine.cpp:274-299):
        # when st_ctime moves on rename, -i.modtime's zip fast path is safe
        # to auto-enable; the flag itself force-enables on odd filesystems
        if not p.modTime and self._modtime_capable():
            p.modTime = True

        expected = self.db.indexed_items()
        scan = self.scanner.scan_directory(root, expected, self.db.last_added())

        # algo-change sync: re-index items missing newly-enabled algos
        if p.sync:
            for path, (mid, mtype, algos_present) in self.db.indexed_items().items():
                needed = p.algos & self._supported_algos(mtype)
                if needed & ~algos_present:
                    if mtype == TYPE_IMAGE:
                        scan.modified.append(path)
                    else:
                        scan.new_videos.append(path)
                        scan.removed_ids.append(mid)

        if scan.removed_ids and not p.dryRun:
            self.db.remove(scan.removed_ids)

        # modified files: remove then re-add
        re_add = []
        for path in scan.modified:
            m = self.db.media_with_path(path)
            if m.id:
                re_add.append(m.id)
        if re_add and not p.dryRun:
            self.db.remove(re_add)
        todo_images = scan.new_images + scan.modified

        added = 0
        if p.dryRun:
            for path in todo_images:
                info(f"would add: {path}")
            return {"added": 0, "removed": len(scan.removed_ids),
                    "modified": len(scan.modified),
                    "errors": self.scanner.errors(), "stopped": False}

        self._stop_requested = False
        batch: list[Media] = []
        for m in self.scanner.process_images(todo_images, progress):
            batch.append(m)
            if len(batch) >= p.writeBatchSize:
                self.db.add(batch)
                added += len(batch)
                batch = []
            if self._stop_requested:
                break
        if batch:
            self.db.add(batch)
            added += len(batch)

        # videos decode concurrently (LJF-ordered queue, -i.decoderThreads
        # workers) feeding the shared device hasher; results commit per
        # video in completion order like the reference (src/engine.cpp:85-92)
        video_added = 0
        if p.algos & (1 << SearchParams.ALGO_VIDEO) and not self._stop_requested:
            try:
                from .video import process_videos
                for path, m in process_videos(scan.new_videos, self.params,
                                              video_dir=self.db.video_path()):
                    if m is not None:
                        self.db.add([m])
                        video_added += 1
                    else:
                        self.scanner.set_error(path, "video decode error")
                    if self._stop_requested:
                        break
            except ImportError:
                if scan.new_videos:
                    warn(f"video pipeline unavailable; skipped "
                         f"{len(scan.new_videos)} videos")

        # refresh flat-file caches for loaded indexes (reference saves
        # caches after batch updates, src/index.h:217-223)
        self.db.save_indices()

        return {"added": added + video_added, "removed": len(scan.removed_ids),
                "modified": len(scan.modified), "errors": self.scanner.errors(),
                "stopped": self._stop_requested}

    @staticmethod
    def _supported_algos(media_type: int) -> int:
        if media_type == TYPE_VIDEO:
            return 1 << SearchParams.ALGO_VIDEO
        return ((1 << SearchParams.ALGO_DCT)
                | (1 << SearchParams.ALGO_DCT_FEATURES)
                | (1 << SearchParams.ALGO_CV_FEATURES)
                | (1 << SearchParams.ALGO_COLOR))

    def _modtime_capable(self) -> bool:
        """True when a rename bumps st_ctime (metadata change time) on the
        index filesystem — the test the reference performs with its
        modtime-check-before/after files (src/engine.cpp:274-299)."""
        import time
        d = self.db.index_path()
        before = os.path.join(d, "modtime-check-before.txt")
        after = os.path.join(d, "modtime-check-after.txt")
        try:
            with open(before, "w") as f:
                f.write("x")
            t0 = os.stat(before).st_ctime_ns
            time.sleep(0.02)
            os.rename(before, after)
            return os.stat(after).st_ctime_ns > t0
        except OSError:
            return False
        finally:
            for pth in (before, after):
                try:
                    os.unlink(pth)
                except OSError:
                    pass

    def _verify_vdx_files(self) -> None:
        """Remove media whose .vdx went missing/corrupt so they re-index
        (reference src/engine.cpp:115-139)."""
        from ..store.vdx import is_valid_vdx
        bad = []
        for row in self.db.connect().execute(
                "select id from media where type=?", (TYPE_VIDEO,)):
            vdx = os.path.join(self.db.video_path(), f"{row[0]}.vdx")
            if not os.path.exists(vdx) or not is_valid_vdx(vdx):
                bad.append(row[0])
        if bad:
            warn(f"removing {len(bad)} videos with missing/corrupt .vdx")
            self.db.remove(bad)

    # ---- query -----------------------------------------------------------
    def query(self, needle: Media, params: SearchParams) -> MediaGroup:
        """Single-needle search incl. on-the-fly hashing and mirror variants
        (reference Engine::query, src/engine.cpp:367-452)."""
        from .scanner import media_type_for
        if needle.path and params.algo != SearchParams.ALGO_VIDEO \
                and (needle.type == TYPE_VIDEO
                     or media_type_for(needle.path) == TYPE_VIDEO):
            # video needle + image algo: grab 9 evenly-spaced frames and
            # query them as image needles (reference -similar-to <video>,
            # src/main.cpp:1136-1196 via VideoContext::frameGrab)
            return self._video_grab_query(needle, params)
        if needle.id == 0 and needle.path and not needle.dctHash:
            indexed = self.db.media_with_path(needle.path)
            if indexed.is_valid():
                needle = indexed
            else:
                if media_type_for(needle.path) == TYPE_VIDEO \
                        and params.algo == SearchParams.ALGO_VIDEO:
                    # unindexed video needle: hash its frames on the fly
                    from .video import process_video
                    processed = process_video(needle.path, self.params)
                else:
                    algos = 1 << params.algo \
                        if params.algo != SearchParams.ALGO_VIDEO \
                        else 1 << SearchParams.ALGO_DCT
                    processed = self.scanner.process_image_file(
                        needle.path, algos,
                        crop=True if params.autoCrop else None)
                if processed is None:
                    warn(f"cannot process needle: {needle.path}")
                    return []
                needle = processed

        matches = self.db.similar_to(needle, params)

        if params.templateMatch and matches:
            from .template_matcher import TemplateMatcher
            if not hasattr(self, "_tm"):
                self._tm = TemplateMatcher(self.scanner.decode_image)
            self._tm.match(needle, matches, params)

        if params.mirrorMask and params.algo != SearchParams.ALGO_COLOR:
            matches += self._mirror_query(needle, params)
            seen = set()
            uniq = []
            # (score, path) sort: equal-score direct/mirror duplicates
            # dedupe deterministically (reference ordered merge,
            # src/engine.cpp:429-445), not by arrival order
            for m in sorted(matches, key=lambda m: (m.score, m.path)):
                if m.path not in seen:
                    seen.add(m.path)
                    uniq.append(m)
            matches = uniq[:params.maxMatches]

        matches.sort(key=lambda m: m.score)
        return matches

    GRAB_COUNT = 9  # frame grabs for a video needle (src/main.cpp:1150)

    def _video_grab_query(self, needle: Media, params: SearchParams) -> MediaGroup:
        """Video needle against an image index: decode GRAB_COUNT evenly-
        spaced frames, build per-algo image needles from them, query each
        and merge best-score-per-path (reference src/main.cpp:1136-1196)."""
        from .video import DECODE_MAX_SIDE, backend_for, grab_frame
        be = backend_for(needle.path)
        if be is None:
            warn(f"no video decode backend for {needle.path}")
            return []
        try:
            meta = be.probe(needle.path)
        except Exception:  # noqa: BLE001
            warn(f"cannot probe video needle: {needle.path}")
            return []
        fps = meta.get("fps") or 25.0
        total = int(round(meta.get("duration", 0.0) * fps))
        n = self.GRAB_COUNT
        if total > n:
            targets = sorted({total * i // (n + 1) for i in range(1, n + 1)})
        else:
            targets = list(range(max(total, 1)))
        grays = []
        for t in targets:
            frame = grab_frame(needle.path, t, max_side=DECODE_MAX_SIDE)
            if frame is not None:
                grays.append(frame)
        if not grays:
            return []
        needles = self._needles_from_frames(grays, needle, params)
        out: MediaGroup = []
        for m in needles:
            out += self.db.similar_to(m, params)
        best: dict = {}
        for m in out:
            if m.path not in best or m.score < best[m.path].score:
                best[m.path] = m
        matches = sorted(best.values(), key=lambda m: m.score)
        if params.filterSelf:
            matches = [m for m in matches if m.path != needle.path]
        return matches[:params.maxMatches]

    def _needles_from_frames(self, grays: list[np.ndarray], needle: Media,
                             params: SearchParams) -> list[Media]:
        """Per-algo image needles from decoded grayscale frames."""
        needles: list[Media] = []
        if params.algo == SearchParams.ALGO_DCT:
            hashes = self.scanner._hasher.hash_images(
                grays, do_crop=self.params.autocrop or params.autoCrop)
            for h in hashes:
                needles.append(Media(needle.path, TYPE_IMAGE, needle.width,
                                     needle.height, needle.md5, int(h),
                                     id=needle.id))
        elif params.algo in (SearchParams.ALGO_DCT_FEATURES,
                             SearchParams.ALGO_CV_FEATURES):
            from ..ops.orb import extract_features_batch
            want_desc = params.algo == SearchParams.ALGO_CV_FEATURES
            feats = extract_features_batch(
                grays, self.params.numFeatures,
                want_descriptors=want_desc, want_hashes=not want_desc)
            for desc, hashes in feats:
                m = Media(needle.path, TYPE_IMAGE, needle.width,
                          needle.height, needle.md5, id=needle.id)
                m.keyPointDescriptors = desc
                m.keyPointHashes = hashes
                needles.append(m)
        elif params.algo == SearchParams.ALGO_COLOR:
            from ..ops.color import create_descriptors
            rgb = [np.stack([g, g, g], axis=-1) for g in grays]
            for desc in create_descriptors(rgb):
                m = Media(needle.path, TYPE_IMAGE, needle.width,
                          needle.height, needle.md5, id=needle.id)
                m.colorDescriptor = desc
                needles.append(m)
        return needles

    def _mirror_query(self, needle: Media, params: SearchParams) -> MediaGroup:
        """Re-process flipped variants of the needle and search each
        (reference src/engine.cpp:429-436).  dct/video re-hash; fdct/orb
        re-extract features on the flipped image; color needs no mirror
        pass (the histogram is orientation-invariant)."""
        if params.algo == SearchParams.ALGO_COLOR:
            return []
        d = self.scanner.decode_image(needle.path)
        if d.gray is None:
            return []
        flips = []
        if params.mirrorMask & SearchParams.MIRROR_HORIZONTAL:
            flips.append(np.ascontiguousarray(np.fliplr(d.gray)))
        if params.mirrorMask & SearchParams.MIRROR_VERTICAL:
            flips.append(np.ascontiguousarray(np.flipud(d.gray)))
        if params.mirrorMask & SearchParams.MIRROR_BOTH:
            flips.append(np.ascontiguousarray(np.flipud(np.fliplr(d.gray))))
        if not flips:
            return []

        needles = []
        if params.algo in (SearchParams.ALGO_DCT, SearchParams.ALGO_VIDEO):
            hashes = self.scanner._hasher.hash_images(
                flips, do_crop=self.params.autocrop or params.autoCrop)
            for h in hashes:
                m = Media(needle.path, TYPE_IMAGE, d.width, d.height, d.md5,
                          int(h), id=needle.id)
                needles.append(m)
        elif params.algo in (SearchParams.ALGO_DCT_FEATURES,
                             SearchParams.ALGO_CV_FEATURES):
            from ..ops.orb import extract_features_batch
            want_desc = params.algo == SearchParams.ALGO_CV_FEATURES
            feats = extract_features_batch(
                flips, self.params.numFeatures,
                want_descriptors=want_desc, want_hashes=not want_desc)
            for desc, hashes in feats:
                m = Media(needle.path, TYPE_IMAGE, d.width, d.height, d.md5,
                          id=needle.id)
                m.keyPointDescriptors = desc
                m.keyPointHashes = hashes
                needles.append(m)

        out: MediaGroup = []
        for m in needles:
            out += self.db.similar_to(m, params)
        return out
