"""Photographic-statistics accuracy corpus.

The reference's recall harness is 40 real photos × 5 sizes
(/root/reference/unit/testindexbase.cpp:121-123).  This environment has no
photo set and no network, so bases are synthesized with natural-image
statistics — 1/f ("pink") power spectrum + piecewise structure (horizon
gradient, textured regions, hard edges) — which is what the DCT hash,
ORB corners and color histogram are designed against; pure sine/blob
textures (fixtures.py) are too easy and pure noise defeats the semantics.

Variant set per base (VERDICT round 1 item 2):
  5 scales (JPEG q90) + JPEG q50 recompression + 90% crop + 5° rotation +
  letterbox + horizontal mirror.  Per-algo expectations differ (dct is not
  rotation-invariant; orb is) — see EXPECTED_VARIANTS.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

SCALES = (1.0, 0.75, 0.5, 0.33, 0.25)


def pink_noise(rng: np.random.Generator, h: int, w: int,
               beta: float = 1.8) -> np.ndarray:
    """2-D noise with a 1/f^beta power spectrum (natural-image statistic)."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spec = (rng.normal(size=(h, w // 2 + 1))
            + 1j * rng.normal(size=(h, w // 2 + 1))) / f ** (beta / 2)
    img = np.fft.irfft2(spec, s=(h, w))
    img -= img.min()
    img /= max(np.ptp(img), 1e-9)
    return img


def photo_image(rng: np.random.Generator, h: int, w: int,
                rng_base: np.random.Generator | None = None) -> np.ndarray:
    """One synthetic 'photograph': RGB uint8 [h, w, 3].

    @param rng_base optional separate generator for the dominant 1/f
           luminance layer: two images built with a SHARED rng_base but
           independent ``rng`` share their low-frequency skeleton — the
           hardest kind of negative for a 9x9-low-frequency DCT hash
           (near-duplicate statistics without being a duplicate)."""
    base = pink_noise(rng_base if rng_base is not None else rng, h, w)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # horizon-style luminance gradient
    horizon = rng.uniform(0.3, 0.7) * h
    sky = 1.0 / (1.0 + np.exp((yy - horizon) / (0.05 * h)))
    img = 0.55 * base + 0.25 * sky + 0.2 * pink_noise(rng, h, w, 1.2)
    # hard-edged structures (buildings/objects) for corners
    for _ in range(rng.integers(4, 9)):
        y0, x0 = rng.integers(0, h - 12), rng.integers(0, w - 12)
        hh = int(rng.integers(h // 12, max(h // 3, h // 12 + 1)))
        ww = int(rng.integers(w // 12, max(w // 3, w // 12 + 1)))
        img[y0:y0 + hh, x0:x0 + ww] = \
            0.6 * img[y0:y0 + hh, x0:x0 + ww] + 0.4 * rng.uniform(0, 1)
    img -= img.min()
    img /= max(np.ptp(img), 1e-9)
    # correlated color channels with distinct per-image cast
    cast = rng.uniform(0.55, 1.0, size=3)
    chroma = np.stack([pink_noise(rng, h, w, 1.5) for _ in range(2)], -1)
    rgb = np.empty((h, w, 3))
    rgb[..., 0] = img * cast[0] + 0.15 * chroma[..., 0]
    rgb[..., 1] = img * cast[1] + 0.10 * chroma[..., 1]
    rgb[..., 2] = img * cast[2] - 0.12 * chroma[..., 0]
    rgb -= rgb.min()
    rgb /= max(np.ptp(rgb), 1e-9)
    return (rgb * 255).astype(np.uint8)


def _save(img: Image.Image, path: str, quality: int = 90) -> None:
    img.save(path, quality=quality)


# the round-5 adversarial tier (VERDICT r04 #5): 90/180 rotations,
# watermark overlay, multi-generation recompression chain, and a hard
# NEGATIVE per base (shared low-frequency skeleton, independent content)
ADVERSARIAL = ("rot90", "rot180", "wmark", "chain", "cousin")


def _watermark(arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Corner logo block + translucent caption bar — the common real-world
    watermark edit a deduper must see through."""
    h, w = arr.shape[:2]
    out = arr.astype(np.float64).copy()
    bh = max(8, int(h * 0.05))
    out[h - bh:] = 0.75 * out[h - bh:] + 0.25 * 255  # translucent caption
    # "text": dark strokes on the bar
    for x in range(int(w * 0.05), int(w * 0.5), 9):
        out[h - bh + 2:h - 2, x:x + 2] *= 0.6
    lh, lw = max(8, int(h * 0.09)), max(8, int(w * 0.09))
    logo = rng.uniform(0, 255, (lh, lw, 1)).repeat(3, axis=2)
    out[4:4 + lh, w - lw - 4:w - 4] = \
        0.65 * out[4:4 + lh, w - lw - 4:w - 4] + 0.35 * logo
    return np.clip(out, 0, 255).astype(np.uint8)


def make_photo_corpus(root: str, n_base: int = 40, seed: int = 7,
                      variants: tuple[str, ...] = ("scales", "q50", "crop",
                                                   "rot5", "letterbox",
                                                   "mirror")
                      ) -> dict[str, dict[str, str]]:
    """Write the corpus; @return base -> {variant name: path}.

    Variant names: orig, s075/s050/s033/s025, q50, crop, rot5, letterbox,
    mirror; adversarial tier (pass variants=...+ADVERSARIAL): rot90,
    rot180, wmark, chain, cousin.  A 'cousin' is a NEGATIVE: it shares the
    base's dominant 1/f luminance skeleton but has independent structure,
    so it must never be grouped with the base (it has its own truth set)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    out: dict[str, dict[str, str]] = {}
    for i in range(n_base):
        h = int(rng.integers(240, 360))
        w = int(rng.integers(320, 480))
        skeleton_seed = rng.integers(0, 2**31)
        arr = photo_image(rng, h, w,
                          rng_base=np.random.default_rng(skeleton_seed))
        im = Image.fromarray(arr)
        name = f"p{i:03d}"
        files: dict[str, str] = {}

        def put(tag: str, img: Image.Image, q: int = 90):
            p = os.path.join(root, f"{name}_{tag}.jpg")
            _save(img, p, q)
            files[tag] = p

        put("orig", im)
        if "scales" in variants:
            for s in SCALES[1:]:
                put(f"s{int(s * 100):03d}",
                    im.resize((max(8, round(w * s)), max(8, round(h * s))),
                              Image.LANCZOS))
        if "q50" in variants:
            put("q50", im, q=50)
        if "crop" in variants:  # 90% center crop
            cy, cx = int(h * 0.05), int(w * 0.05)
            put("crop", im.crop((cx, cy, w - cx, h - cy)))
        if "rot5" in variants:  # small rotation, expanded canvas
            put("rot5", im.rotate(5, resample=Image.BILINEAR, expand=False))
        if "letterbox" in variants:  # black bars, ~72% kept
            bar = int(h * 0.18)
            boxed = np.zeros((h + 2 * bar, w, 3), np.uint8)
            boxed[bar:bar + h] = arr
            put("letterbox", Image.fromarray(boxed))
        if "mirror" in variants:
            put("mirror", im.transpose(Image.FLIP_LEFT_RIGHT))
        if "rot90" in variants:
            put("rot90", im.transpose(Image.ROTATE_90))
        if "rot180" in variants:
            put("rot180", im.transpose(Image.ROTATE_180))
        if "wmark" in variants:
            put("wmark", Image.fromarray(_watermark(arr, rng)))
        if "chain" in variants:
            # multi-generation social-media chain: q75 → decode → q60 →
            # decode → q50 (each hop requantizes on the previous artifacts)
            import io as _io
            cur = im
            for q in (75, 60):
                buf = _io.BytesIO()
                cur.save(buf, format="JPEG", quality=q)
                buf.seek(0)
                cur = Image.open(buf).convert("RGB")
            put("chain", cur, q=50)
        if "cousin" in variants:
            cousin = photo_image(
                rng, h, w, rng_base=np.random.default_rng(skeleton_seed))
            put("cousin", Image.fromarray(cousin))
        out[name] = files
    return out


def photo_video(rng: np.random.Generator, n_frames: int, h: int, w: int
                ) -> np.ndarray:
    """One synthetic grayscale 'video' [n_frames, h, w] uint8: a camera pan
    over a photographic-statistics canvas plus a moving hard-edged object
    and luminance drift — consecutive frames are near-duplicates (so the
    indexer's hash-run window compression engages, as with real footage)
    while the content evolves enough to retain frames throughout."""
    canvas = photo_image(rng, h * 2, w * 2)[..., 1].astype(np.float64) / 255.0
    # smooth pan path covering the canvas
    t = np.linspace(0, 1, n_frames)
    y_path = (h * (0.5 + 0.45 * np.sin(2 * np.pi * t * rng.uniform(0.6, 1.4)))
              ).astype(int)
    x_path = (w * t * rng.uniform(0.7, 0.95)).astype(int)
    ow, oh = int(w * 0.2), int(h * 0.2)
    frames = np.empty((n_frames, h, w), np.uint8)
    for i in range(n_frames):
        y0, x0 = int(y_path[i]), int(x_path[i])
        f = canvas[y0:y0 + h, x0:x0 + w].copy()
        # moving object (hard edges for per-frame structure)
        oy = int((h - oh) * (0.5 + 0.4 * np.sin(2 * np.pi * i / 40)))
        ox = int((w - ow) * i / n_frames)
        f[oy:oy + oh, ox:ox + ow] = 0.7 * f[oy:oy + oh, ox:ox + ow] + 0.3
        f = f * (0.9 + 0.1 * np.sin(2 * np.pi * i / 60))  # exposure drift
        frames[i] = np.clip(f * 255, 0, 255).astype(np.uint8)
    return frames


def make_video_corpus(root: str, n_base: int = 12, n_frames: int = 150,
                      seed: int = 23) -> dict[str, dict[str, str]]:
    """Video accuracy corpus (reference testvideoindex.cpp uses xiph clips;
    no network here, so bases are photo_video pans).  Per base: the
    original plus the transforms the video algo is designed to recover —
    a middle sub-clip, a 0.5x spatial rescale (dct hashes are
    scale-invariant), a letterboxed copy (per-frame autocrop removes the
    bars) and additive sensor noise (re-encode proxy).
    @return base -> {variant name: path}"""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from PIL import Image as _Im

    from cbird_tpu.host.video import FseqBackend
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    out: dict[str, dict[str, str]] = {}
    for i in range(n_base):
        h = int(rng.integers(96, 128))
        w = int(rng.integers(128, 176))
        frames = photo_video(rng, n_frames, h, w)
        name = f"v{i:03d}"
        files: dict[str, str] = {}

        def put(tag: str, arr: np.ndarray):
            p = os.path.join(root, f"{name}_{tag}.fseq")
            FseqBackend.save(p, arr, 25.0)
            files[tag] = p

        put("orig", frames)
        put("clip", frames[n_frames // 4: (3 * n_frames) // 4].copy())
        half = np.stack([np.asarray(_Im.fromarray(f).resize(
            (w // 2, h // 2), _Im.LANCZOS)) for f in frames])
        put("scaled", half)
        bar = int(h * 0.18)
        boxed = np.zeros((n_frames, h + 2 * bar, w), np.uint8)
        boxed[:, bar:bar + h] = frames
        put("letterbox", boxed)
        noisy = np.clip(frames.astype(np.int16)
                        + rng.normal(0, 3, frames.shape), 0, 255) \
            .astype(np.uint8)
        put("noise", noisy)
        out[name] = files
    return out


VIDEO_VARIANTS = ("clip", "scaled", "letterbox", "noise")


# Which variants each algo is EXPECTED to recover (drives recall truth):
# dct: scale/recompression robust; crop only via -p.crop/letterbox logic;
#      not rotation- or mirror-invariant (mirror needs -p.refl).
# fdct (dct features): scales + recompression — the reference's own fdct
#      harness is exactly the 40x5-sizes set (unit/testdctfeaturesindex.cpp:11
#      "40x5-sizes"); keypoint-ROI hashes are NOT robust to the crop/rot
#      normalize-ratio shift (sizeLongestSide rescales crop content 1.11x
#      relative to orig), in the reference as here.
# orb: crop + rotation (oriented BRIEF), scales.
# color: histogram is layout-invariant: everything except hue-changing ops.
# Adversarial expectations (only engaged when the corpus was built with
# the ADVERSARIAL tier): wmark/chain stay within each algo's robustness
# contract; rot90/rot180 are expected ONLY from rotation-invariant algos
# (color histogram; orb's oriented BRIEF).  dct recovers rot180 via
# -p.refl b (180° = horizontal+vertical mirror) — measured separately.
# 'cousin' appears in NO truth set: it is the planted hard negative.
EXPECTED_VARIANTS = {
    "dct": ("s075", "s050", "s033", "s025", "q50", "letterbox",
            "wmark", "chain"),
    "fdct": ("s075", "s050", "s033", "q50", "wmark", "chain"),
    "orb": ("s075", "s050", "q50", "crop", "rot5", "wmark"),
    "color": ("s075", "s050", "s033", "s025", "q50", "crop", "mirror",
              "rot90", "rot180", "wmark", "chain"),
}
