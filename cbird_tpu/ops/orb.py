"""ORB-style keypoints + 256-bit binary descriptors, batched on device.

TPU rebuild of the reference's OpenCV ORB usage
(/root/reference/src/media.cpp:859-872: OrbFeatureDetector(nfeatures, 1.2,
12 levels, edge 31, WTA_K 2, HARRIS_SCORE, patch 31) on images prescaled to
400px) and of makeKeyPointHashes (src/media.cpp:874-923).

Everything is fixed-shape, batched, and branch-free so XLA can fuse it:

- image pyramid: 12 levels, scale 1.2, each level a static-shape canvas;
- FAST-9 corners via 16 shifted comparisons + contiguous-run reduction;
- Harris response (Sobel + 7×7 window) ranks corners (HARRIS_SCORE);
- 3×3 non-max suppression, then per-level top-k (geometric feature budget
  per level, same distribution OpenCV uses);
- orientation by intensity centroid over the 31×31 patch;
- rotated-BRIEF: 256 Gaussian-sampled point pairs (deterministic seed —
  OpenCV's learned pattern is not reproduced; recall parity is the target,
  per SURVEY.md §7 hard part #1), sampled from a box-blurred level image,
  packed to [K, 8] uint32;
- keypoint hashes (fdct algo): per-keypoint square ROI → the fused DCT hash
  pipeline via shared-canvas ROI matrices (ops/dct_hash._axis_map), skipping
  ROIs smaller than 31px exactly like the reference.

Keypoint geometry matches the reference quirk: the hash ROI corner sits AT
the keypoint position (not centered), size = patch·scale
(src/media.cpp:890-900).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .dct_hash import _axis_map, _blur_radius, combine_u32

import os as _os

# 12 levels like the reference; overridable to cut compile time in CI
# (each level is a separate XLA program in the fused kernel)
N_LEVELS = int(_os.environ.get("CBIRD_ORB_LEVELS", "12"))
SCALE = 1.2
PATCH = 31
EDGE = 31  # border margin (OpenCV edgeThreshold)
FAST_T = 20
CANVAS = 400  # longest side normalized to exactly 400px before detection

# FAST circle of 16 offsets (radius 3) in clockwise order
_FAST_CIRCLE = [(0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2),
                (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0),
                (-3, 1), (-2, 2), (-1, 3)]


def features_per_level(nfeatures: int) -> list[int]:
    """Geometric distribution of the feature budget over levels (OpenCV)."""
    factor = 1.0 / SCALE
    ndesired = nfeatures * (1 - factor) / (1 - factor ** N_LEVELS)
    out = []
    total = 0
    for lvl in range(N_LEVELS - 1):
        n = int(round(ndesired * factor ** lvl))
        out.append(n)
        total += n
    out.append(max(nfeatures - total, 0))
    return out


def _brief_pattern(seed: int = 777) -> np.ndarray:
    """[256, 4] (y1, x1, y2, x2) float32 — iid Gaussian N(0, (patch/5)^2)
    clipped to the patch (the classic BRIEF G-II distribution)."""
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(256, 4))
    lim = PATCH // 2 - 1
    return np.clip(pts, -lim, lim).astype(np.float32)


_PATTERN = _brief_pattern()


def _level_dims() -> list[tuple[int, int]]:
    dims = []
    for lvl in range(N_LEVELS):
        s = CANVAS / (SCALE ** lvl)
        n = max(int(math.ceil(s)), 16)
        n = (n + 7) // 8 * 8  # pad to a tile-friendly multiple
        dims.append((n, n))
    return dims


_LEVEL_DIMS = _level_dims()


def _resize_area(img: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray,
                 out_n: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Area-resize the (h,w) region of a square canvas by 1/scale^lvl into an
    out_n x out_n canvas; returns (level image, level h, level w)."""
    n_in = img.shape[-1]
    ratio = out_n / CANVAS  # fixed per level; actual content scales with it
    lh = jnp.maximum((h.astype(jnp.float32) * ratio).astype(jnp.int32), 1)
    lw = jnp.maximum((w.astype(jnp.float32) * ratio).astype(jnp.int32), 1)
    # area-resize [0,h)x[0,w) → [0,lh)x[0,lw): output cell i averages source
    # interval [i·h/lh, (i+1)·h/lh)
    i = jnp.arange(out_n, dtype=jnp.float32)[:, None]
    y = jnp.arange(n_in, dtype=jnp.float32)[None, :]
    sy = h.astype(jnp.float32) / lh.astype(jnp.float32)
    lo = jnp.maximum(i * sy, y)
    hi = jnp.minimum((i + 1.0) * sy, y + 1.0)
    wy = jnp.maximum(hi - lo, 0.0) / sy
    wy = wy * ((jnp.arange(n_in) < h)[None, :]) * ((jnp.arange(out_n) < lh)[:, None])
    sx = w.astype(jnp.float32) / lw.astype(jnp.float32)
    lo = jnp.maximum(i * sx, y)
    hi = jnp.minimum((i + 1.0) * sx, y + 1.0)
    wx = jnp.maximum(hi - lo, 0.0) / sx
    wx = wx * ((jnp.arange(n_in) < w)[None, :]) * ((jnp.arange(out_n) < lw)[:, None])
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ih,hw,jw->ij", wy, img, wx, precision=hp)
    return out, lh, lw


def _box_blur(img: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(2r+1)^2 box blur via shifts (descriptor sampling smoother)."""
    k = 2 * r + 1
    out = jnp.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out = out + jnp.roll(img, (dy, dx), axis=(0, 1))
    return out / (k * k)


def _shift2(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    return jnp.roll(img, (-dy, -dx), axis=(0, 1))


def _fast_corners(img: jnp.ndarray) -> jnp.ndarray:
    """FAST-9 corner mask (boolean)."""
    center = img
    bright = []
    dark = []
    for (dy, dx) in _FAST_CIRCLE:
        s = _shift2(img, dy, dx)
        bright.append(s > center + FAST_T)
        dark.append(s < center - FAST_T)
    bright = jnp.stack(bright)  # [16,H,W]
    dark = jnp.stack(dark)

    def has_run9(m):
        mm = jnp.concatenate([m, m[:9]], axis=0)  # wraparound
        run = mm[0:16]
        for j in range(1, 9):
            run = run & mm[j:j + 16]
        return run.any(axis=0)

    return has_run9(bright) | has_run9(dark)


def _harris(img: jnp.ndarray) -> jnp.ndarray:
    """Harris response with Sobel gradients and a 7×7 window."""
    ix = (_shift2(img, 0, 1) - _shift2(img, 0, -1)) * 2.0 \
        + (_shift2(img, -1, 1) - _shift2(img, -1, -1)) \
        + (_shift2(img, 1, 1) - _shift2(img, 1, -1))
    iy = (_shift2(img, 1, 0) - _shift2(img, -1, 0)) * 2.0 \
        + (_shift2(img, 1, -1) - _shift2(img, -1, -1)) \
        + (_shift2(img, 1, 1) - _shift2(img, -1, 1))
    ixx, iyy, ixy = ix * ix, iy * iy, ix * iy

    def win(a):
        return _box_blur(a, 3) * 49.0

    sxx, syy, sxy = win(ixx), win(iyy), win(ixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - 0.04 * tr * tr


def _nms3(resp: jnp.ndarray) -> jnp.ndarray:
    """3×3 non-max suppression of ``resp`` (use -inf for excluded pixels:
    NMS must compare corner candidates against *each other*, not against the
    full response map — FAST hits sit offset from the geometric corner where
    the raw Harris map keeps rising)."""
    m = resp
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m = jnp.maximum(m, _shift2(resp, dy, dx))
    return resp >= m


def _detect_level(img: jnp.ndarray, lh: jnp.ndarray, lw: jnp.ndarray, k: int):
    """One pyramid level → top-k corners. @return (ys, xs, resp, valid) [k]"""
    n = img.shape[0]
    corners = _fast_corners(img)
    resp = _harris(img)
    corner_resp = jnp.where(corners, resp, -jnp.inf)
    keep = corners & _nms3(corner_resp)
    yy = jnp.arange(n)[:, None]
    xx = jnp.arange(n)[None, :]
    margin = EDGE
    inb = (yy >= margin) & (yy < lh - margin) & (xx >= margin) & (xx < lw - margin)
    keep = keep & inb
    score = jnp.where(keep, resp, -jnp.inf)
    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, k)
    ys = idx // n
    xs = idx % n
    valid = jnp.isfinite(top)
    return ys, xs, top, valid


def _orientation(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per 31×31 patch [K,31,31] → [K] radians."""
    r = PATCH // 2
    yy = jnp.arange(-r, r + 1, dtype=jnp.float32)[:, None]
    xx = jnp.arange(-r, r + 1, dtype=jnp.float32)[None, :]
    circ = (yy * yy + xx * xx) <= r * r
    w = patches * circ[None, :, :]
    m01 = jnp.sum(w * yy[None], axis=(1, 2))
    m10 = jnp.sum(w * xx[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _gather_patches(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """[K] centers → [K, 31, 31] patches (img pre-padded by PATCH)."""
    r = PATCH // 2

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y - r + PATCH, x - r + PATCH),
                                     (PATCH, PATCH))

    return jax.vmap(one)(ys, xs)


def _descriptors(blurred_pad: jnp.ndarray, ys, xs, angles) -> jnp.ndarray:
    """Rotated-BRIEF 256-bit descriptors → [K, 8] uint32."""
    pat = jnp.asarray(_PATTERN)  # [256,4]
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # [K]

    def rot(y, x):
        # rotate pattern offsets by the keypoint angle
        ry = (x[None, :] * sa[:, None] + y[None, :] * ca[:, None])
        rx = (x[None, :] * ca[:, None] - y[None, :] * sa[:, None])
        return ry, rx

    ry1, rx1 = rot(pat[:, 0], pat[:, 1])
    ry2, rx2 = rot(pat[:, 2], pat[:, 3])

    def sample(ry, rx):  # [K,256] offsets → [K,256] pixels
        py = jnp.round(ys[:, None] + ry).astype(jnp.int32) + PATCH
        px = jnp.round(xs[:, None] + rx).astype(jnp.int32) + PATCH
        return blurred_pad[py, px]

    bits = sample(ry1, rx1) < sample(ry2, rx2)  # [K,256]
    bits = bits.reshape(-1, 8, 32)
    pw = jnp.asarray((np.uint32(1) << np.arange(32, dtype=np.uint32)))
    return jnp.sum(bits.astype(jnp.uint32) * pw[None, None, :], axis=2,
                   dtype=jnp.uint32)


@functools.lru_cache(maxsize=None)
def _level_kernel(lvl: int, k: int):
    """One pyramid level as its own jitted program — 12 small compiles build
    ~30% faster than one monolithic graph, and unused levels never compile."""
    n = _LEVEL_DIMS[lvl][0]
    # level-0 px per level px: _resize_area shrinks content by exactly
    # CANVAS/n (its ratio is out_n/CANVAS regardless of content size), so
    # that IS the whole map-back factor.  n ≈ CANVAS/SCALE**lvl already —
    # multiplying by SCALE**lvl again (an earlier bug) inflated level-ℓ
    # coordinates by 1.2^ℓ, which cancelled for same-level matches (all
    # index-path images are prescaled to one 400px frame) but skewed every
    # cross-level match: a 0.75-scale pair's mutual matches clustered at an
    # apparent 0.75·1.2⁻² = 0.52 similarity, breaking the TemplateMatcher.
    scale = CANVAS / n

    @jax.jit
    def run(canvas, h, w):
        def per_image(img, ih, iw):
            level, lh, lw = _resize_area(img, ih, iw, n)
            ys, xs, resp, valid = _detect_level(level, lh, lw, k)
            pad = jnp.pad(level, PATCH)
            patches = _gather_patches(pad, ys, xs)
            angles = _orientation(patches)
            blurred = jnp.pad(_box_blur(level, 2), PATCH)
            desc = _descriptors(blurred, ys, xs, angles)
            # pixel-center map-back: level cell x covers level-0 interval
            # [x·s, (x+1)·s) — its center is (x+0.5)·s − 0.5
            return ((xs.astype(jnp.float32) + 0.5) * scale - 0.5,
                    (ys.astype(jnp.float32) + 0.5) * scale - 0.5,
                    jnp.full((k,), PATCH * scale, jnp.float32),
                    resp, angles, desc, valid)

        return jax.vmap(per_image)(canvas, h, w)

    return run


def _orb_kernel(canvas: jnp.ndarray, sizes: jnp.ndarray, nfeatures: int):
    """Batched ORB. canvas [B,400,400] f32, sizes [B,2].

    @return dict of per-level stacked results:
      xs, ys    [B, K] level-0 coordinates (float)
      size      [B, K] keypoint diameter (patch * level scale)
      resp      [B, K] harris response
      angle     [B, K]
      desc      [B, K, 8] uint32
      valid     [B, K] bool
    """
    budgets = features_per_level(nfeatures)
    h = sizes[:, 0].astype(jnp.int32)
    w = sizes[:, 1].astype(jnp.int32)
    per_level = [
        _level_kernel(lvl, max(budgets[lvl], 1))(canvas, h, w)
        for lvl in range(N_LEVELS)
    ]
    keys = ("xs", "ys", "size", "resp", "angle", "desc", "valid")
    return {key: jnp.concatenate([lv[i] for lv in per_level], axis=1)
            for i, key in enumerate(keys)}


# ---------------------------------------------------------------------------
# keypoint ROI hashes (fdct) — shared-canvas variant of the dct hash
# ---------------------------------------------------------------------------

@jax.jit
def _roi_hash_kernel(image: jnp.ndarray, boxes: jnp.ndarray):
    """DCT-hash K square ROIs of one image. image [H,W] f32, boxes [K,4]."""
    h, w = image.shape
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh = bottom - top
    ww = right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=h))(top, hh, rblur)
    mw = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=w))(left, ww, rblur)
    hp = jax.lax.Precision.HIGHEST
    g = jnp.einsum("kih,hw->kiw", mh, image, precision=hp)
    g = jnp.einsum("kiw,kjw->kij", g, mw, precision=hp)
    from .dct_hash import _D32, _ZZ64, _POW32
    d = jnp.asarray(_D32)
    freq = jnp.einsum("ki,bij->bkj", d, g, precision=hp)
    freq = jnp.einsum("bkj,lj->bkl", freq, d, precision=hp)
    blk = freq[:, :9, :9].reshape(-1, 81)
    v = blk[:, jnp.asarray(_ZZ64)]
    thresh = jnp.sum(v, axis=1, keepdims=True) / 64.0
    bits = v > thresh
    bits = bits.at[:, 0].set(False)
    pw = jnp.asarray(_POW32)
    lo = jnp.sum(bits[:, :32].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    hi = jnp.sum(bits[:, 32:].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    lo = jnp.where((lo == 0) & (hi == 0), jnp.uint32(1), lo)
    return jnp.stack([lo, hi], axis=1)


def keypoint_hashes(gray: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                    sizes: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """ROI dct hashes for one image's keypoints (reference makeKeyPointHashes,
    src/media.cpp:874-923): square of side kp.size anchored at the keypoint,
    skipped when <31px or out of bounds."""
    h, w = gray.shape
    boxes = []
    for x, y, s, ok in zip(xs, ys, sizes, valid):
        if not ok or s < 31:
            continue
        x0, y0 = float(x), float(y)
        x1, y1 = x0 + float(s), y0 + float(s)
        if x0 > 0 and y0 > 0 and x1 < w - 2 and y1 < h - 2:
            xi, yi, si = int(np.floor(x0)), int(np.floor(y0)), int(np.ceil(s))
            boxes.append((yi, yi + si, xi, xi + si))
    if not boxes:
        return np.zeros(0, dtype=np.uint64)
    kb = 1 << (len(boxes) - 1).bit_length()
    kb = max(kb, 8)
    arr = np.zeros((kb, 4), dtype=np.int32)
    arr[:len(boxes)] = boxes
    arr[len(boxes):] = (0, 32, 0, 32)  # harmless dummy ROIs
    pairs = _roi_hash_kernel(jnp.asarray(gray, dtype=jnp.float32),
                             jnp.asarray(arr))
    return combine_u32(np.asarray(pairs)[:len(boxes)])


# ---------------------------------------------------------------------------
# public batch API (used by the scanner)
# ---------------------------------------------------------------------------

def _prescale(gray: np.ndarray) -> np.ndarray:
    """Normalize longest side to exactly 400 — up OR down — before
    detection (reference scanner.cpp:876 sizeLongestSide, which resizes
    unconditionally; cvutil.h:251 default LANCZOS).  This is what makes
    keypoint-ROI hashes comparable across rescaled copies of an image:
    without the upscale leg, a 0.75-scale variant is featurized at a
    different effective scale and its ROI hashes never align."""
    long_side = max(gray.shape)
    if long_side == CANVAS:
        return gray
    from PIL import Image
    s = CANVAS / long_side
    im = Image.fromarray(gray).resize(
        (max(1, round(gray.shape[1] * s)), max(1, round(gray.shape[0] * s))),
        Image.LANCZOS)
    return np.asarray(im)


def extract_features_batch(grays: Sequence[np.ndarray], nfeatures: int = 400,
                           want_descriptors: bool = True,
                           want_hashes: bool = True, batch: int = 16):
    """@return per image (descriptors [K,8]→uint32 as [K,32] uint8 rows or
    None, keypoint hashes [K'] uint64 or None)."""
    out = []
    imgs = [_prescale(g) for g in grays]
    for s in range(0, len(imgs), batch):
        chunk = imgs[s:s + batch]
        bsz = len(chunk)
        canvas = np.zeros((batch, CANVAS, CANVAS), dtype=np.float32)
        sizes = np.zeros((batch, 2), dtype=np.int32)
        for n, g in enumerate(chunk):
            canvas[n, :g.shape[0], :g.shape[1]] = g
            sizes[n] = g.shape
        res = _orb_kernel(jnp.asarray(canvas), jnp.asarray(sizes), nfeatures)
        res = {k: np.asarray(v) for k, v in res.items()}
        for n in range(bsz):
            valid = res["valid"][n]
            desc = None
            if want_descriptors:
                d32 = res["desc"][n][valid]  # [K,8] u32
                desc = d32.view(np.uint8).reshape(len(d32), 32) if len(d32) \
                    else np.zeros((0, 32), np.uint8)
            hashes = None
            if want_hashes:
                hashes = keypoint_hashes(chunk[n], res["xs"][n], res["ys"][n],
                                         res["size"][n], valid)
            out.append((desc, hashes))
    return out
