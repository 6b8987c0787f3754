"""Golden-model (numpy) implementations of the perceptual kernels.

These are straightforward scalar/numpy ports of the algorithm *semantics* of
the reference kernels (cited per function).  They exist to pin down the math
so the batched TPU kernels in this package can be tested against them
bit-for-bit.  They are intentionally slow and simple.

Deliberate deviations from the reference (documented here once):
- all intermediate math is float32/float64 (the reference rounds back to
  uint8 after cv::blur / cv::resize); hashes remain stable under the same
  robustness thresholds;
- INTER_AREA resize uses the exact box-overlap integral for all scale
  factors (OpenCV switches to bilinear when upscaling).
"""

from __future__ import annotations

import numpy as np


def zigzag_table(n: int = 9) -> np.ndarray:
    """Zig-zag traversal order of an n×n block, starting downward.

    Generates the 81-entry table used by the reference dctHash64
    (/root/reference/src/cvutil.cpp:491-496): anti-diagonals s=0..2n-2;
    odd diagonals walk bottom-left → top-right, even diagonals walk
    top-right → bottom-left.
    """
    order = []
    for s in range(2 * n - 1):
        if s % 2 == 1:  # (s,0) ... (0,s) — up-right
            rng = range(min(s, n - 1), max(0, s - n + 1) - 1, -1)
        else:  # (0,s) ... (s,0) — down-left
            rng = range(max(0, s - n + 1), min(s, n - 1) + 1)
        for r in rng:
            c = s - r
            order.append(r * n + c)
    return np.array(order, dtype=np.int64)


def reflect101(i: np.ndarray, n: int) -> np.ndarray:
    """OpenCV BORDER_REFLECT_101 index mapping (gfedcb|abcdefgh|gfedcba)."""
    i = np.asarray(i)
    if n == 1:
        return np.zeros_like(i)
    period = 2 * n - 2
    i = np.abs(i) % period
    return np.where(i >= n, period - i, i)


def mean_blur(img: np.ndarray, k: int) -> np.ndarray:
    """k×k normalized box filter with BORDER_REFLECT_101 (cv::blur default)."""
    if k <= 1:
        return img.astype(np.float64)
    r = k // 2
    h, w = img.shape
    x = img.astype(np.float64)
    ys = reflect101(np.arange(-r, h + r), h)
    xs = reflect101(np.arange(-r, w + r), w)
    padded = x[np.ix_(ys, xs)]
    out = np.zeros((h, w), dtype=np.float64)
    for dy in range(k):
        for dx in range(k):
            out += padded[dy:dy + h, dx:dx + w]
    return out / (k * k)


def area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-overlap (INTER_AREA) resize: dst pixel = mean over its source box."""
    h, w = img.shape
    x = img.astype(np.float64)

    def axis_matrix(n_in: int, n_out: int) -> np.ndarray:
        s = n_in / n_out
        m = np.zeros((n_out, n_in))
        for i in range(n_out):
            lo, hi = i * s, (i + 1) * s
            for j in range(int(np.floor(lo)), min(int(np.ceil(hi)), n_in)):
                m[i, j] = max(0.0, min(hi, j + 1) - max(lo, j)) / s
        return m

    rh = axis_matrix(h, out_h)
    rw = axis_matrix(w, out_w)
    return rh @ x @ rw.T


def dct2_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II matrix (cv::dct convention)."""
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    d[0] *= np.sqrt(1.0 / n)
    d[1:] *= np.sqrt(2.0 / n)
    return d


_ZZ = zigzag_table(9)
_D32 = dct2_matrix(32)


def blur_kernel_size(area: int) -> int:
    """Size-adaptive mean blur (reference src/cvutil.cpp:446-455)."""
    if area <= 32 * 32:
        return 0
    if area <= 64 * 64:
        return 3
    if area <= 128 * 128:
        return 5
    return 7


def dct_hash64(gray: np.ndarray) -> int:
    """64-bit perceptual DCT hash (reference dctHash64, src/cvutil.cpp:435-545).

    grayscale → size-adaptive mean blur (7/5/3/0 by area) → 32×32 INTER_AREA
    resize → float DCT → keep 9×9 low frequencies → zig-zag reorder → drop the
    6 lowest + keep 64 → threshold at mean → sign bitmask (bit 0 reserved so
    0 can mean "null hash").
    """
    gray = np.asarray(gray)
    assert gray.ndim == 2
    h, w = gray.shape
    k = blur_kernel_size(h * w)
    x = mean_blur(gray, k)
    x = area_resize(x, 32, 32)
    freq = _D32 @ x @ _D32.T
    blk = freq[:9, :9].reshape(-1)
    zz = blk[_ZZ]
    v = zz[6:70]  # 64 coefficients
    thresh = v.sum() / 64.0
    hash_ = 0
    for i in range(1, 64):
        if v[i] > thresh:
            hash_ |= 1 << i
    if hash_ == 0:
        hash_ = 1
    return hash_


def average_hash64(img: np.ndarray) -> int:
    """8×8 mean-threshold aHash (reference src/cvutil.cpp:564-576; parity only,
    not used in the main path). Uses area resize instead of INTER_CUBIC."""
    g = area_resize(np.asarray(img, dtype=np.float64), 8, 8).reshape(-1)
    mean = g.mean()
    h = 0
    for i in range(64):
        if g[i] > mean:
            h |= 1 << i
    return h


def autocrop_box(gray: np.ndarray, range_: int = 20) -> tuple[int, int, int, int]:
    """De-letterbox crop box (top, bottom, left, right), exclusive bounds.

    Scalar port of the reference autocrop (src/cvutil.cpp:1285-1400): border
    color from pixel (0,0); scan from the center out to each edge for the
    first row/col covered >66% by border color from both sides; require the
    crop be balanced within 5% per axis (re-center using the lesser margin
    otherwise); reject crops keeping <65% of either dimension.
    """
    img = np.asarray(gray)
    h, w = img.shape
    if h == 0 or w == 0:
        return 0, h, 0, w
    color = int(img[0, 0])
    min_w_cov = int(w * 0.66)
    min_h_cov = int(h * 0.66)
    max_h_margin = int(w * 0.05)
    max_v_margin = int(h * 0.05)

    diff = np.abs(img.astype(np.int32) - color) > range_

    def row_is_lb(r: int) -> bool:
        d = diff[r]
        nz = np.nonzero(d)[0]
        if len(nz) == 0:
            left, right = w, 0
        else:
            left, right = int(nz[0]), int(nz[-1]) + 1
        return left > 0 and right < w and left + w - right > min_w_cov

    def col_is_lb(c: int) -> bool:
        d = diff[:, c]
        nz = np.nonzero(d)[0]
        if len(nz) == 0:
            top, bottom = h, 0
        else:
            top, bottom = int(nz[0]), int(nz[-1]) + 1
        return top > 0 and bottom < h and top + h - bottom > min_h_cov

    top = h // 2
    while top >= 0 and not row_is_lb(top):
        top -= 1
    top += 1

    bottom = h // 2 + 1
    while bottom < h and not row_is_lb(bottom):
        bottom += 1

    left = w // 2
    while left >= 0 and not col_is_lb(left):
        left -= 1
    left += 1

    right = w // 2 + 1
    while right < w and not col_is_lb(right):
        right += 1

    bmargin = h - bottom
    if abs(top - bmargin) > max_v_margin:
        if top > bmargin:
            top = bmargin
        else:
            bottom = h - top

    rmargin = w - right
    if abs(left - rmargin) > max_h_margin:
        if left > rmargin:
            left = rmargin
        else:
            right = w - left

    if (left != 0 and right != w) or (top != 0 and bottom != h):
        if (left < right and top < bottom
                and (right - left) / float(w) > 0.65
                and (bottom - top) / float(h) > 0.65):
            return top, bottom, left, right
    return 0, h, 0, w


def hamming64(a: int, b: int) -> int:
    """XOR+popcount distance (reference src/hamm.h:24-26)."""
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
