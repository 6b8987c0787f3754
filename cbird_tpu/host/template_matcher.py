"""Template matcher — expensive verification filter (`-p.tm`).

Rebuild of the reference TemplateMatcher
(/root/reference/src/templatematcher.cpp:45-436): for each candidate of a
match group, detect ORB features on needle (needleFeatures) and candidate
(haystackFeatures), mutual-nearest radius match, estimate a similarity
transform by RANSAC, warp the candidate into the template frame, and accept
when the mask-aware DCT hashes agree within tmThresh.  Results are cached
per md5 pair under a lock (src/templatematcher.cpp:64-103) and the match
gains an ROI + affine transform for the GUI/dump layer.

Differences from the reference: features are detected at the indexing
prescale (≤400px) instead of full resolution — both sides are normalized
to the same scale so the transform estimate is unaffected; OpenCV's
estimateRigidTransform RANSAC is replaced by a 2-point similarity-model
RANSAC + least-squares refit.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np
from PIL import Image

from ..params import SearchParams
from ..store.media import Media, MediaGroup
from ..utils.log import warn

INT_MAX = 2**31 - 1
_RANSAC_ITERS = 200
_INLIER_PX = 3.0


def _mutual_radius_match(da: np.ndarray, db: np.ndarray, radius: int):
    """Cross-checked Hamming radius match (cv::BFMatcher(NORM_HAMMING, true)
    + radiusMatch). @return list of (ia, ib) index pairs."""
    if len(da) == 0 or len(db) == 0:
        return []
    pa = np.unpackbits(da, axis=1).astype(np.uint8)
    pb = np.unpackbits(db, axis=1).astype(np.uint8)
    d = (pa[:, None, :] != pb[None, :, :]).sum(-1)  # [A,B]
    best_b = d.argmin(axis=1)
    best_a = d.argmin(axis=0)
    out = []
    for ia, ib in enumerate(best_b):
        if best_a[ib] == ia and d[ia, ib] < radius:
            out.append((ia, int(ib)))
    return out


def _similarity_from_2pts(p: np.ndarray, q: np.ndarray) -> Optional[np.ndarray]:
    """Exact 4-DOF similarity (scale+rot+trans) mapping p[0:2] → q[0:2];
    returns 2x3 matrix [[a,-b,tx],[b,a,ty]]."""
    dp = p[1] - p[0]
    dq = q[1] - q[0]
    n2 = dp @ dp
    if n2 < 1e-6:
        return None
    a = (dp[0] * dq[0] + dp[1] * dq[1]) / n2
    b = (dp[0] * dq[1] - dp[1] * dq[0]) / n2
    t = q[0] - np.array([a * p[0][0] - b * p[0][1], b * p[0][0] + a * p[0][1]])
    return np.array([[a, -b, t[0]], [b, a, t[1]]])


def _apply(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ m[:, :2].T + m[:, 2]


def _ls_similarity(p: np.ndarray, q: np.ndarray) -> Optional[np.ndarray]:
    """Least-squares 4-DOF similarity fit over all pairs."""
    n = len(p)
    if n < 2:
        return None
    # unknowns (a, b, tx, ty); rows: a*x - b*y + tx = qx ; b*x + a*y + ty = qy
    A = np.zeros((2 * n, 4))
    rhs = np.zeros(2 * n)
    A[0::2, 0] = p[:, 0]
    A[0::2, 1] = -p[:, 1]
    A[0::2, 2] = 1
    A[1::2, 0] = p[:, 1]
    A[1::2, 1] = p[:, 0]
    A[1::2, 3] = 1
    rhs[0::2] = q[:, 0]
    rhs[1::2] = q[:, 1]
    sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    a, b, tx, ty = sol
    return np.array([[a, -b, tx], [b, a, ty]])


def estimate_similarity_ransac(p: np.ndarray, q: np.ndarray,
                               seed: int = 7) -> Optional[np.ndarray]:
    """RANSAC similarity estimate (stand-in for cv::estimateRigidTransform
    partial-affine mode). @return 2x3 matrix or None."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    n = len(p)
    if n < 3:
        return None
    rng = np.random.default_rng(seed)
    best_inliers: np.ndarray | None = None
    for _ in range(_RANSAC_ITERS):
        i, j = rng.integers(0, n, 2)
        if i == j:
            continue
        m = _similarity_from_2pts(p[[i, j]], q[[i, j]])
        if m is None:
            continue
        err = np.linalg.norm(_apply(m, p) - q, axis=1)
        inliers = err < _INLIER_PX
        if best_inliers is None or inliers.sum() > best_inliers.sum():
            best_inliers = inliers
    if best_inliers is None or best_inliers.sum() < 3:
        return None
    return _ls_similarity(p[best_inliers], q[best_inliers])


_FEATURE_BATCH = 16      # device batch bucket cap (bounds compiled shapes)
_DECODE_CACHE_MAX = 64   # grayscale decode LRU entries


class TemplateMatcher:
    def __init__(self, decode=None):
        # decode(path) -> DecodedImage with .gray at the indexing prescale
        if decode is None:
            from .scanner import Scanner
            decode = Scanner().decode_image
        self._decode = decode
        self._cache: dict[tuple[str, str], int] = {}
        self._lock = threading.Lock()
        from collections import OrderedDict
        self._grays: "OrderedDict[str, np.ndarray | None]" = OrderedDict()

    def _decode_gray(self, path: str) -> np.ndarray | None:
        """LRU-cached grayscale decode — a candidate appearing in many
        groups (common for popular dups) decodes once, not per pair."""
        with self._lock:
            if path in self._grays:
                self._grays.move_to_end(path)
                return self._grays[path]
        d = self._decode(path)
        gray = d.gray if d.gray is not None else None
        with self._lock:
            self._grays[path] = gray
            while len(self._grays) > _DECODE_CACHE_MAX:
                self._grays.popitem(last=False)
        return gray

    def _features(self, gray: np.ndarray, nfeatures: int):
        return self._features_batch([gray], nfeatures)[0]

    def _features_batch(self, grays: list[np.ndarray], nfeatures: int):
        """ORB features for many images in ONE device pass per
        power-of-two bucket (≤ _FEATURE_BATCH) — the per-candidate kernel
        dispatch dominated -p.tm groups (SURVEY §2 #8)."""
        from ..ops.orb import CANVAS, _orb_kernel
        import jax.numpy as jnp
        out = []
        for s0 in range(0, len(grays), _FEATURE_BATCH):
            chunk = grays[s0:s0 + _FEATURE_BATCH]
            b = len(chunk)
            bb = 1 << max(b - 1, 0).bit_length()  # bucket: 1,2,4,8,16
            canvas = np.zeros((bb, CANVAS, CANVAS), dtype=np.float32)
            sizes = np.full((bb, 2), 1, dtype=np.int32)
            scales = np.ones(b)
            for i, g in enumerate(chunk):
                h, w = g.shape
                s = 1.0
                if max(h, w) > CANVAS:
                    s = CANVAS / max(h, w)
                    im = Image.fromarray(g).resize(
                        (max(1, round(w * s)), max(1, round(h * s))),
                        Image.BOX)
                    g = np.asarray(im)
                canvas[i, :g.shape[0], :g.shape[1]] = g
                sizes[i] = g.shape
                scales[i] = s
            res = _orb_kernel(jnp.asarray(canvas), jnp.asarray(sizes),
                              nfeatures)
            for i in range(b):
                valid = np.asarray(res["valid"][i])
                xs = np.asarray(res["xs"][i])[valid] / scales[i]
                ys = np.asarray(res["ys"][i])[valid] / scales[i]
                desc = np.asarray(res["desc"][i])[valid]
                desc = desc.view(np.uint8).reshape(len(desc), 32) \
                    if len(desc) else np.zeros((0, 32), np.uint8)
                out.append((xs, ys, desc))
        return out

    def match(self, tmpl: Media, group: MediaGroup, params: SearchParams) -> None:
        """Filter ``group`` in place to candidates that verify against the
        template; sets score/roi/transform on survivors."""
        if not group:
            return
        use_cache = bool(tmpl.md5) and all(m.md5 for m in group)

        good: MediaGroup = []
        todo: MediaGroup = []
        if use_cache:
            with self._lock:
                for m in group:
                    key = (m.md5, tmpl.md5)
                    dist = self._cache.get(key, self._cache.get((tmpl.md5, m.md5)))
                    if dist is not None:
                        m.score = dist
                        if dist < params.tmThresh:
                            good.append(m)
                    else:
                        todo.append(m)
        else:
            todo = list(group)

        group.clear()
        if not todo:
            group.extend(sorted(good, key=lambda m: m.score))
            return

        tmpl_gray = self._decode_gray(tmpl.path)
        if tmpl_gray is None:
            # keep the cache-verified survivors — only the todo set is lost
            warn(f"template matcher: cannot load {tmpl.path}")
            group.extend(sorted(good, key=lambda m: m.score))
            return
        txs, tys, tdesc = self._features(tmpl_gray, params.needleFeatures)
        if len(tdesc) == 0:
            warn(f"template matcher: no keypoints in {tmpl.path}")
            group.extend(sorted(good, key=lambda m: m.score))
            return

        # decode every candidate (LRU-cached), apply the -p.tscale shrink,
        # then ONE batched device feature pass for the whole group
        cands: list[tuple[Media, np.ndarray]] = []
        for m in todo:
            g = self._decode_gray(m.path)
            if g is None:
                m.score = INT_MAX
                if use_cache:
                    with self._lock:
                        self._cache[(m.md5, tmpl.md5)] = INT_MAX
                continue
            cands.append((m, self._tscale(tmpl_gray, g, params)))
        feats = self._features_batch([g for _, g in cands],
                                     params.haystackFeatures) if cands else []

        for (m, cgray), (cxs, cys, cdesc) in zip(cands, feats):
            dist = self._verify_pair(tmpl_gray, txs, tys, tdesc,
                                     m, cgray, cxs, cys, cdesc, params)
            if use_cache:
                with self._lock:
                    self._cache[(m.md5, tmpl.md5)] = dist
            m.score = dist
            if dist < params.tmThresh:
                good.append(m)

        group.extend(sorted(good, key=lambda m: m.score))

    @staticmethod
    def _tscale(tmpl_gray: np.ndarray, cand_gray: np.ndarray,
                params: SearchParams) -> np.ndarray:
        """-p.tscale: a candidate much larger than the template generates
        features at scales the template never sees; shrink it so its max
        side ≤ template max side × tmScalePct/100
        (reference src/templatematcher.cpp:171-192)."""
        th, tw = tmpl_gray.shape
        ch, cw = cand_gray.shape
        if th * tw >= ch * cw:
            return cand_gray
        c_size = max(ch, cw)
        max_size = max(th, tw) * params.tmScalePct / 100.0
        if c_size <= max_size:
            return cand_gray
        s = max_size / c_size
        im = Image.fromarray(cand_gray).resize(
            (max(1, round(cw * s)), max(1, round(ch * s))), Image.BILINEAR)
        return np.asarray(im)

    def _verify_pair(self, tmpl_gray: np.ndarray, txs, tys, tdesc,
                     m: Media, cand_gray: np.ndarray, cxs, cys, cdesc,
                     params: SearchParams) -> int:
        if len(cdesc) == 0:
            return INT_MAX

        pairs = _mutual_radius_match(tdesc, cdesc, params.cvThresh)
        if len(pairs) < 3:
            return INT_MAX

        tp = np.array([[txs[a], tys[a]] for a, _ in pairs])
        cp = np.array([[cxs[b], cys[b]] for _, b in pairs])
        tx = estimate_similarity_ransac(tp, cp)
        if tx is None:
            return INT_MAX

        th, tw = tmpl_gray.shape
        corners = np.array([[0, 0], [tw, 0], [tw, th], [0, th]], dtype=np.float64)
        roi = _apply(tx, corners)
        # map roi/transform back to the candidate's original resolution
        cscale = max(m.width, m.height) / max(cand_gray.shape) \
            if m.width > 0 and max(cand_gray.shape) > 0 else 1.0
        m.roi = [(float(x * cscale), float(y * cscale)) for x, y in roi]
        m.transform = (tx * cscale).tolist()

        # warp the candidate into the template frame; undefined pixels are
        # 0 = mask indicator (src/templatematcher.cpp:322-369).  PIL's
        # AFFINE data maps output(x,y) -> input coordinates, which is
        # exactly the forward template->candidate transform.
        if tx[0, 0] ** 2 + tx[1, 0] ** 2 < 1e-9:
            return INT_MAX
        cand = Image.fromarray(cand_gray)
        warped = cand.transform((tw, th), Image.AFFINE,
                                (tx[0, 0], tx[0, 1], tx[0, 2],
                                 tx[1, 0], tx[1, 1], tx[1, 2]),
                                resample=Image.BILINEAR, fillcolor=0)
        warped = np.asarray(warped)

        mask = warped != 0
        tmpl_masked = np.where(mask, tmpl_gray, 0).astype(np.uint8)

        from ..ops.ref_numpy import dct_hash64, hamming64
        cand_hash = dct_hash64(warped)
        tmpl_hash = dct_hash64(tmpl_masked)
        return hamming64(cand_hash, tmpl_hash)
