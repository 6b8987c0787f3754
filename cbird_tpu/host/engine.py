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
        self._register_indexes()

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
                    "modified": len(scan.modified), "errors": self.scanner.errors()}

        batch: list[Media] = []
        for m in self.scanner.process_images(todo_images, progress):
            batch.append(m)
            if len(batch) >= p.writeBatchSize:
                self.db.add(batch)
                added += len(batch)
                batch = []
        if batch:
            self.db.add(batch)
            added += len(batch)

        # videos one at a time (each may be huge); commits per video like the
        # reference (src/engine.cpp:85-92)
        video_added = 0
        if p.algos & (1 << SearchParams.ALGO_VIDEO):
            try:
                from .video import process_video
                for path in scan.new_videos:
                    m = process_video(path, self.params,
                                      video_dir=self.db.video_path())
                    if m is not None:
                        self.db.add([m])
                        video_added += 1
                    else:
                        self.scanner.set_error(path, "video decode error")
            except ImportError:
                if scan.new_videos:
                    warn(f"video pipeline unavailable; skipped "
                         f"{len(scan.new_videos)} videos")

        # refresh flat-file caches for loaded indexes (reference saves
        # caches after batch updates, src/index.h:217-223)
        self.db.save_indices()

        return {"added": added + video_added, "removed": len(scan.removed_ids),
                "modified": len(scan.modified), "errors": self.scanner.errors()}

    @staticmethod
    def _supported_algos(media_type: int) -> int:
        if media_type == TYPE_VIDEO:
            return 1 << SearchParams.ALGO_VIDEO
        return ((1 << SearchParams.ALGO_DCT)
                | (1 << SearchParams.ALGO_DCT_FEATURES)
                | (1 << SearchParams.ALGO_CV_FEATURES)
                | (1 << SearchParams.ALGO_COLOR))

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
        if needle.id == 0 and needle.path and not needle.dctHash:
            indexed = self.db.media_with_path(needle.path)
            if indexed.is_valid():
                needle = indexed
            else:
                from .scanner import media_type_for
                if media_type_for(needle.path) == TYPE_VIDEO \
                        and params.algo == SearchParams.ALGO_VIDEO:
                    # unindexed video needle: hash its frames on the fly
                    from .video import process_video
                    processed = process_video(needle.path, self.params)
                else:
                    algos = 1 << params.algo \
                        if params.algo != SearchParams.ALGO_VIDEO \
                        else 1 << SearchParams.ALGO_DCT
                    processed = self.scanner.process_image_file(needle.path, algos)
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
            for m in sorted(matches, key=lambda m: m.score):
                if m.path not in seen:
                    seen.add(m.path)
                    uniq.append(m)
            matches = uniq[:params.maxMatches]

        matches.sort(key=lambda m: m.score)
        return matches

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
                flips, do_crop=self.params.autocrop)
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
