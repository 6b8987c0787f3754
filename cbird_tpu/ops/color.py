"""Color histogram descriptors: LUV k-means on device + batched distance scan.

TPU rebuild of the reference ColorDescriptor
(create: /root/reference/src/cvutil.cpp:790-1096,
 distance: src/cvutil.cpp:682-748, storage: src/cvutil.h:60-115):

- ``create_descriptors``: a batch of ≤256px RGB images → per-image 32-color
  LUV histograms.  Elliptical center mask, RGB→Luv (OpenCV float-path
  formulas, no gamma), brightness filter L>4, k-means (k=32, kmeans++ init,
  Lloyd iterations to eps 10) — all vmapped jax; the tiny per-image
  sort/merge/quantize tail runs on host.
- ``color_topk``: batched asymmetric min-distance-sum scan — the
  all-pairs color distance as two masked matmul/min reductions instead of
  the reference's scalar O(N·32·32) loop per pair.

Descriptor storage (matches the reference's lossy 16-bit quantization,
src/cvutil.h:83-95): [32,4] uint16 rows (l,u,v,w) + numColors. The
reference sets numColors to count-1 (src/cvutil.cpp:1052) and its distance
loops over that many entries — replicated here for scoring parity.

Determinism: the reference's descriptor is non-deterministic (OpenCV RNG in
kmeans++, noted at src/cvutil.cpp:791).  Here the PRNG is keyed from image
content, so identical pixels always give identical descriptors.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NUM_COLORS = 32
_U16 = 65535.0

# Luv white point constants (OpenCV float path)
_UN = 0.19793943
_VN = 0.46831096


# ---------------------------------------------------------------------------
# color space
# ---------------------------------------------------------------------------

def rgb_to_luv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [..., 3] in [0, 1] → Luv (OpenCV cvtColor float semantics: linear
    RGB→XYZ matrix, no gamma; L in [0,100], u in [-134,220], v in [-140,122])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    l = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    denom = x + 15.0 * y + 3.0 * z
    safe = jnp.where(denom > 0, denom, 1.0)
    up = jnp.where(denom > 0, 4.0 * x / safe, 0.0)
    vp = jnp.where(denom > 0, 9.0 * y / safe, 0.0)
    u = 13.0 * l * (up - _UN)
    v = 13.0 * l * (vp - _VN)
    return jnp.stack([l, u, v], axis=-1)


# ---------------------------------------------------------------------------
# quantization (reference DescriptorColor set/get)
# ---------------------------------------------------------------------------

def quantize_luv(luv: np.ndarray) -> np.ndarray:
    """float Luv [...,3] → uint16 (reference DescriptorColor::set)."""
    l = np.clip((_U16 / 100.0) * luv[..., 0], 0, _U16)
    u = np.clip((_U16 / 354.0) * (luv[..., 1] + 134.0), 0, _U16)
    v = np.clip((_U16 / 262.0) * (luv[..., 2] + 140.0), 0, _U16)
    return np.stack([l, u, v], axis=-1).astype(np.uint16)


def dequantize_luv(q: np.ndarray) -> np.ndarray:
    """uint16 [...,3] → float Luv (reference DescriptorColor::get)."""
    q = q.astype(np.float32)
    l = q[..., 0] * 100.0 / _U16
    u = q[..., 1] * 354.0 / _U16 - 134.0
    v = q[..., 2] * 262.0 / _U16 - 140.0
    return np.stack([l, u, v], axis=-1)


# ---------------------------------------------------------------------------
# device k-means over the masked sample set
# ---------------------------------------------------------------------------

def _kmeans_pp_init(luv: jnp.ndarray, mask: jnp.ndarray, key) -> jnp.ndarray:
    """kmeans++ seeding over masked samples. luv [S,3], mask [S]."""
    s = luv.shape[0]
    neg_inf = jnp.float32(-1e30)

    def pick(probs_log, key):
        g = jax.random.gumbel(key, (s,))
        return jnp.argmax(probs_log + g)

    key, k0 = jax.random.split(key)
    first = pick(jnp.where(mask, 0.0, neg_inf), k0)
    centers = jnp.zeros((NUM_COLORS, 3), jnp.float32).at[0].set(luv[first])

    def body(i, carry):
        centers, key = carry
        d2 = jnp.sum((luv[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        valid_c = (jnp.arange(NUM_COLORS) < i)[None, :]
        mind2 = jnp.min(jnp.where(valid_c, d2, jnp.inf), axis=1)
        logits = jnp.where(mask & (mind2 > 0), jnp.log(jnp.maximum(mind2, 1e-12)),
                           neg_inf)
        # all-zero mind2 (duplicate-heavy images): fall back to uniform
        logits = jnp.where(jnp.all(logits == neg_inf),
                           jnp.where(mask, 0.0, neg_inf), logits)
        key, kk = jax.random.split(key)
        idx = pick(logits, kk)
        return centers.at[i].set(luv[idx]), key

    centers, _ = jax.lax.fori_loop(1, NUM_COLORS, body, (centers, key))
    return centers


def _kmeans(luv: jnp.ndarray, mask: jnp.ndarray, key,
            max_iter: int = 100, eps: float = 10.0):
    """Lloyd iterations (squared-L2, like cv::kmeans) until the max center
    shift falls below eps (TermCriteria 100/10, src/cvutil.cpp:897-899).
    @return (centers [32,3], labels [S])"""
    centers0 = _kmeans_pp_init(luv, mask, key)

    def assign(centers):
        d2 = jnp.sum((luv[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=1)

    def step(state):
        centers, _, it = state
        labels = assign(centers)
        onehot = (labels[:, None] == jnp.arange(NUM_COLORS)[None, :]) & mask[:, None]
        counts = onehot.sum(axis=0).astype(jnp.float32)
        sums = jnp.einsum("sk,sd->kd", onehot.astype(jnp.float32), luv)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
                        centers)  # empty cluster keeps its center
        shift = jnp.sqrt(jnp.max(jnp.sum((new - centers) ** 2, axis=-1)))
        return new, shift, it + 1

    def cond(state):
        _, shift, it = state
        return (it < max_iter) & (shift >= eps)

    state = step((centers0, jnp.float32(jnp.inf), 0))
    centers, _, _ = jax.lax.while_loop(cond, step, state)
    return centers, assign(centers)


def _descriptor_kernel(canvas: jnp.ndarray, size: jnp.ndarray, seed: jnp.ndarray):
    """Per-image device pipeline. canvas [H,W,3] uint8, size (h,w).

    @return (centers [32,3] f32 Luv, label_w [32] f32 weight sums,
             label_n [32] i32 counts, n_samples i32)
    """
    hmax, wmax, _ = canvas.shape
    h = size[0].astype(jnp.float32)
    w = size[1].astype(jnp.float32)
    yy = jnp.arange(hmax, dtype=jnp.float32)[:, None]
    xx = jnp.arange(wmax, dtype=jnp.float32)[None, :]
    inb = (yy < h) & (xx < w)

    # elliptical center mask (axes 0.9w × 0.9h, reference src/cvutil.cpp:822-827);
    # outside pixels go to black and are then dropped by the L>4 filter
    ex = (xx - w * 0.5) / jnp.maximum(w * 0.45, 1.0)
    ey = (yy - h * 0.5) / jnp.maximum(h * 0.45, 1.0)
    inside = (ex * ex + ey * ey) <= 1.0

    rgb = canvas.astype(jnp.float32) * (255.0 / 256.0 / 255.0)  # mask scale + [0,1]
    luv = rgb_to_luv(rgb)  # [H,W,3]

    keep = inb & inside & (luv[..., 0] > 4.0)  # brightness filter L>4
    flat_luv = luv.reshape(-1, 3)
    flat_keep = keep.reshape(-1)
    n_samples = flat_keep.sum()

    key = jax.random.fold_in(jax.random.PRNGKey(12345), seed)
    centers, labels = _kmeans(flat_luv, flat_keep, key)

    # positional damping: weight = (maxDist - dist_from_center) / maxDist
    # (reference src/cvutil.cpp:956-970)
    dx = xx - jnp.floor(w / 2.0)
    dy = yy - jnp.floor(h / 2.0)
    dist = jnp.sqrt(dx * dx + dy * dy)
    max_dist = jnp.sqrt((w / 2.0) ** 2 + (h / 2.0) ** 2)
    wpos = ((max_dist - dist) / jnp.maximum(max_dist, 1e-6)).reshape(-1)

    onehot = (labels[:, None] == jnp.arange(NUM_COLORS)[None, :]) & flat_keep[:, None]
    label_w = jnp.einsum("sk,s->k", onehot.astype(jnp.float32), wpos)
    label_n = onehot.sum(axis=0).astype(jnp.int32)
    return centers, label_w, label_n, n_samples.astype(jnp.int32)


_descriptor_batch = jax.jit(jax.vmap(_descriptor_kernel))


def create_descriptors(images: Sequence[Optional[np.ndarray]],
                       canvas: int = 256) -> list[Optional[np.ndarray]]:
    """Batch descriptor creation.

    @param images RGB uint8 arrays (≤canvas px), or None for grayscale media
    @return per image: [33, 4] uint16 — rows 0..31 are (l,u,v,w), row 32
            holds (numColors, 0, 0, 0); None when no descriptor applies
            (grayscale input or <32 usable colors, reference behavior)
    """
    idx = [i for i, im in enumerate(images) if im is not None and im.ndim == 3]
    out: list[Optional[np.ndarray]] = [None] * len(images)
    if not idx:
        return out
    b = len(idx)
    cv = np.zeros((b, canvas, canvas, 3), dtype=np.uint8)
    sizes = np.zeros((b, 2), dtype=np.int32)
    seeds = np.zeros(b, dtype=np.uint32)
    for n, i in enumerate(idx):
        im = images[i]
        h, w = im.shape[:2]
        cv[n, :h, :w] = im[..., :3]
        sizes[n] = (h, w)
        seeds[n] = np.uint32(np.sum(im, dtype=np.uint64) & 0xFFFFFFFF)
    centers, label_w, label_n, n_samples = (np.asarray(a) for a in
                                            _descriptor_batch(cv, sizes, seeds))
    for n, i in enumerate(idx):
        out[i] = _format_descriptor(centers[n], label_w[n], label_n[n],
                                    int(n_samples[n]))
    return out


def _format_descriptor(centers: np.ndarray, label_w: np.ndarray,
                       label_n: np.ndarray, n_samples: int) -> Optional[np.ndarray]:
    """Quantize centers, merge colliding keys, sort by weight, normalize
    (reference src/cvutil.cpp:1005-1081)."""
    if n_samples < NUM_COLORS:
        return None  # "not enough colors" (src/cvutil.cpp:889-892)
    q = quantize_luv(centers)  # [32,3] u16
    freq: dict[tuple, float] = {}
    for k in range(NUM_COLORS):
        if label_n[k] <= 0:
            continue
        key = tuple(int(x) for x in q[k])
        freq[key] = freq.get(key, 0.0) + float(label_w[k])
    if not freq:
        return None
    max_freq = max(freq.values())
    keys = sorted(freq, key=lambda k: -freq[k])[:NUM_COLORS]
    desc = np.zeros((NUM_COLORS + 1, 4), dtype=np.uint16)
    for n, key in enumerate(keys):
        w16 = int(freq[key] * _U16 / max_freq) & 0xFFFF if max_freq > 0 else 0
        desc[n] = (key[0], key[1], key[2], w16)
    # reference quirk: numColors ends at count-1 (src/cvutil.cpp:1052)
    desc[NUM_COLORS, 0] = max(len(keys) - 1, 0)
    return desc


def descriptor_num_colors(desc: np.ndarray) -> int:
    return int(desc[NUM_COLORS, 0])


# ---------------------------------------------------------------------------
# batched distance search
# ---------------------------------------------------------------------------

BAD_SCORE = np.float32(3.0e38)


def _color_scores(n_colors, n_counts, h_colors, h_counts, h_valid):
    """[Q] needles vs [C] haystack rows → [Q, C] f32 scores (BAD_SCORE=miss).

    distance(a,b) = 1 + Σ_i min_j ‖a_i − b_j‖ where a is the side with more
    colors; rejected when |numA−numB| > 2 or either is 0
    (reference src/cvutil.cpp:682-748).

    The pairwise squared distances come from a broadcast subtraction, NOT
    the a²+b²−2ab matmul form: XLA fuses the [Q,32,C,32,(3)] elementwise
    producer straight into the min-reductions, so no pairwise tensor ever
    reaches HBM — the dot-product form materializes a [Q·32, C·32] product
    (16 GB at Q=1024, C=4096: OOM) and runs HBM-bound.  It is also exact
    where the expansion lost ~eps·|luv|² to cancellation; the 0.06 floor
    is kept for score-compat with indexes built before the switch.  sqrt
    and the floor are monotone, so they commute with the min and run on
    the small [.., C] minima instead of per pair."""
    iq = jnp.arange(NUM_COLORS)
    mask_n = iq[None, :] < n_counts[:, None]  # [Q,32]
    mask_h = iq[None, :] < h_counts[:, None]  # [C,32]
    inf = jnp.float32(3.0e38)

    # coordinates unrolled as explicit elementwise ops: a sum(axis=-1)
    # here is itself a reduce, and XLA does not fuse reduce-into-reduce —
    # the [Q,32,C,32] operand then materializes (16 GB at Q=1024/C=4096)
    d2 = None
    for k in range(3):
        dk = n_colors[:, :, None, None, k] - h_colors[None, None, :, :, k]
        d2 = dk * dk if d2 is None else d2 + dk * dk  # [Q,32,C,32] fused

    def finish(m2):
        d = jnp.sqrt(jnp.maximum(m2, 0.0))
        return jnp.where(d < 0.06, 0.0, d)

    # needle side sums (needle has >= colors): min over haystack colors
    min_j = finish(jnp.min(jnp.where(mask_h[None, None, :, :], d2, inf),
                           axis=3))  # [Q,32,C]
    s_ab = jnp.sum(jnp.where(mask_n[:, :, None], min_j, 0.0), axis=1)  # [Q,C]
    # haystack side sums
    min_i = finish(jnp.min(jnp.where(mask_n[:, :, None, None], d2, inf),
                           axis=1))  # [Q,C,32]
    s_ba = jnp.sum(jnp.where(mask_h[None, :, :], min_i, 0.0), axis=2)  # [Q,C]

    score = 1.0 + jnp.where(n_counts[:, None] >= h_counts[None, :], s_ab, s_ba)
    reject = ((n_counts[:, None] == 0) | (h_counts[None, :] == 0)
              | (jnp.abs(n_counts[:, None] - h_counts[None, :]) > 2)
              | ~h_valid[None, :])
    return jnp.where(reject, BAD_SCORE, score)


def _color_scores_oneside(n_colors, n_counts, h_colors, h_counts, h_valid,
                          side: str):
    """[Q, C] scores when the asymmetric side is known per dispatch.

    The general scorer computes BOTH directed sums and selects by
    numColors comparison per pair (src/cvutil.cpp:694: the side with more
    colors drives the Σ min).  The bucketed N² dispatches pairs whose
    count relationship is uniform — ``side='ab'`` for h_counts ≤ n_counts,
    ``'ba'`` for h_counts > n_counts — so only one min-reduction tree is
    built, roughly halving the per-pair VPU work."""
    iq = jnp.arange(NUM_COLORS)
    mask_n = iq[None, :] < n_counts[:, None]  # [Q,32]
    mask_h = iq[None, :] < h_counts[:, None]  # [C,32]
    inf = jnp.float32(3.0e38)
    d2 = None
    for k in range(3):
        dk = n_colors[:, :, None, None, k] - h_colors[None, None, :, :, k]
        d2 = dk * dk if d2 is None else d2 + dk * dk  # [Q,32,C,32] fused

    def finish(m2):
        d = jnp.sqrt(jnp.maximum(m2, 0.0))
        return jnp.where(d < 0.06, 0.0, d)

    if side == "ab":  # needle has >= colors: Σ_i min_j
        min_j = finish(jnp.min(jnp.where(mask_h[None, None, :, :], d2, inf),
                               axis=3))  # [Q,32,C]
        s = jnp.sum(jnp.where(mask_n[:, :, None], min_j, 0.0), axis=1)
    else:  # haystack has more colors: Σ_j min_i
        min_i = finish(jnp.min(jnp.where(mask_n[:, :, None, None], d2, inf),
                               axis=1))  # [Q,C,32]
        s = jnp.sum(jnp.where(mask_h[None, :, :], min_i, 0.0), axis=2)
    reject = (n_counts[:, None] == 0) | ~h_valid[None, :]
    return jnp.where(reject, BAD_SCORE, 1.0 + s)


@functools.partial(jax.jit,
                   static_argnames=("k", "side", "super_chunk", "chunk"))
def color_self_block(n_colors: jnp.ndarray, n_counts: jnp.ndarray,
                     hs_colors: jnp.ndarray, hs_counts: jnp.ndarray,
                     hs_valid: jnp.ndarray, start: jnp.ndarray,
                     lo: jnp.ndarray, hi: jnp.ndarray, k: int = 16,
                     side: str = "ab", super_chunk: int = 1 << 16,
                     chunk: int = 4096):
    """One needle block vs one super_chunk window of the count-sorted store.

    ``hs_*`` are the full store sorted by numColors; ``start`` (aligned)
    selects the slice, ``[lo, hi)`` bounds the rows whose counts satisfy
    the bucket relation for this dispatch — rows outside are masked, so
    bucket boundaries need no alignment.  Returns ([Q,k] scores ascending,
    [Q,k] indices into the SORTED order)."""
    hc = jax.lax.dynamic_slice(
        hs_colors, (start, 0, 0), (super_chunk, NUM_COLORS, 3))
    hn = jax.lax.dynamic_slice(hs_counts, (start,), (super_chunk,))
    hv = jax.lax.dynamic_slice(hs_valid, (start,), (super_chunk,))
    gi = start + jnp.arange(super_chunk, dtype=jnp.int32)
    hv = hv & (gi >= lo) & (gi < hi) & (hn > 0)
    q = n_colors.shape[0]
    k = min(k, super_chunk)
    if super_chunk <= chunk:
        score = _color_scores_oneside(n_colors, n_counts, hc, hn, hv, side)
        neg, idx = jax.lax.top_k(-score, k)
        return -neg, idx + start
    n_chunks = super_chunk // chunk
    hcc = hc.reshape(n_chunks, chunk, NUM_COLORS, 3)
    hnc = hn.reshape(n_chunks, chunk)
    hvc = hv.reshape(n_chunks, chunk)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(_, inp):
        hc_c, hn_c, hv_c, base = inp
        score = _color_scores_oneside(n_colors, n_counts, hc_c, hn_c, hv_c,
                                      side)
        neg, idx = jax.lax.top_k(-score, k)
        return None, (-neg, idx + base)

    _, (ds, is_) = jax.lax.scan(body, None, (hcc, hnc, hvc, bases))
    ds = jnp.moveaxis(ds, 0, 1).reshape(q, -1)
    is_ = jnp.moveaxis(is_, 0, 1).reshape(q, -1)
    neg, sel = jax.lax.top_k(-ds, k)
    return -neg, jnp.take_along_axis(is_, sel, axis=1) + start


def color_topk_local(n_colors: jnp.ndarray, n_counts: jnp.ndarray,
                     h_colors: jnp.ndarray, h_counts: jnp.ndarray,
                     h_valid: jnp.ndarray, k: int = 64, chunk: int = 4096):
    """Traceable body of color_topk (also used inside shard_map for the
    multi-chip path, parallel/sharded.py)."""
    q = n_colors.shape[0]
    n = h_colors.shape[0]
    k = min(k, n)
    if n <= chunk:
        score = _color_scores(n_colors, n_counts, h_colors, h_counts, h_valid)
        neg, idx = jax.lax.top_k(-score, k)
        return -neg, idx

    n_pad = -n % chunk
    if n_pad:
        h_colors = jnp.pad(h_colors, ((0, n_pad), (0, 0), (0, 0)))
        h_counts = jnp.pad(h_counts, (0, n_pad))
        h_valid = jnp.pad(h_valid, (0, n_pad))
    n_chunks = h_colors.shape[0] // chunk
    hc = h_colors.reshape(n_chunks, chunk, NUM_COLORS, 3)
    hn = h_counts.reshape(n_chunks, chunk)
    hv = h_valid.reshape(n_chunks, chunk)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(_, inp):
        hc_c, hn_c, hv_c, base = inp
        score = _color_scores(n_colors, n_counts, hc_c, hn_c, hv_c)
        neg, idx = jax.lax.top_k(-score, k)
        return None, (-neg, idx + base)

    _, (ds, is_) = jax.lax.scan(body, None, (hc, hn, hv, bases))
    ds = jnp.moveaxis(ds, 0, 1).reshape(q, -1)
    is_ = jnp.moveaxis(is_, 0, 1).reshape(q, -1)
    neg, sel = jax.lax.top_k(-ds, k)
    return -neg, jnp.take_along_axis(is_, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def color_topk(n_colors: jnp.ndarray, n_counts: jnp.ndarray,
               h_colors: jnp.ndarray, h_counts: jnp.ndarray,
               h_valid: jnp.ndarray, k: int = 64, chunk: int = 4096):
    """Asymmetric min-distance-sum color matching, batched.

    n_colors [Q,32,3] f32 needle Luv, n_counts [Q] numColors
    h_colors [N,32,3], h_counts [N], h_valid [N]
    @return (scores [Q,k] f32 ascending, indices [Q,k] i32); BAD_SCORE = miss

    The pairwise tensor is [Q,32,C,32] — materializing it for the whole
    store would need >100 GB at 500k items, so the haystack is scanned in
    ``chunk``-row blocks with a per-chunk top-k and one exact merge (same
    streaming pattern as ops/hamming.hamming_topk; the reference's O(N)
    CPU scan DNFs at this scale, readme.md:293)."""
    return color_topk_local(n_colors, n_counts, h_colors, h_counts, h_valid,
                            k=k, chunk=chunk)


class PackedColorStore:
    """Host+device packed color descriptor store (parallel arrays keyed by
    media id, tombstone removal — same contract as PackedHashStore)."""

    def __init__(self):
        self._descs = np.zeros((0, NUM_COLORS + 1, 4), dtype=np.uint16)
        self._ids = np.zeros(0, dtype=np.uint32)
        self._dev = None

    def __len__(self):
        return len(self._ids)

    @property
    def ids(self):
        return self._ids

    @property
    def descriptors(self):
        return self._descs

    def memory_usage(self) -> int:
        return self._descs.nbytes + self._ids.nbytes

    def add(self, descs: np.ndarray, ids: np.ndarray) -> None:
        if len(ids) == 0:
            return
        self._descs = np.concatenate([self._descs, np.asarray(descs, np.uint16)])
        self._ids = np.concatenate([self._ids, np.asarray(ids, np.uint32)])
        self._dev = None

    def remove(self, ids) -> None:
        if not len(self._ids):
            return
        kill = np.isin(self._ids, np.asarray(list(ids), dtype=np.uint32))
        if kill.any():
            self._ids[kill] = 0
            self._descs[kill] = 0
            self._dev = None

    def slice(self, media_ids) -> "PackedColorStore":
        keep = np.isin(self._ids, np.asarray(list(media_ids), dtype=np.uint32))
        keep &= self._ids != 0
        out = PackedColorStore()
        out.add(self._descs[keep], self._ids[keep])
        return out

    def _device(self):
        if self._dev is None:
            from .hamming import _bucket, _search_mesh
            mesh = _search_mesh()
            shards = mesh.devices.shape[1] if mesh is not None else 1
            b = _bucket(max(len(self._ids), 1), minimum=64, multiple=shards)
            colors = np.zeros((b, NUM_COLORS, 3), dtype=np.float32)
            counts = np.zeros(b, dtype=np.int32)
            valid = np.zeros(b, dtype=bool)
            if len(self._ids):
                colors[:len(self._ids)] = dequantize_luv(
                    self._descs[:, :NUM_COLORS, :3])
                counts[:len(self._ids)] = self._descs[:, NUM_COLORS, 0]
                valid[:len(self._ids)] = self._ids != 0
            if mesh is not None:  # shard descriptor rows over the mesh
                from ..parallel.sharded import shard_rows
                self._dev = shard_rows(mesh, colors, counts, valid)
            else:
                self._dev = (jnp.asarray(colors), jnp.asarray(counts),
                             jnp.asarray(valid))
        return self._dev

    def _dispatch_topk(self, ncol: np.ndarray, ncnt: np.ndarray, k: int):
        """One async device top-k launch for a fixed-shape needle block."""
        from .hamming import _search_mesh
        colors_d, counts_d, valid_d = self._device()
        mesh = _search_mesh()
        if mesh is not None:
            from ..parallel.sharded import sharded_color_topk
            return sharded_color_topk(mesh, jnp.asarray(ncol),
                                      jnp.asarray(ncnt), colors_d, counts_d,
                                      valid_d, k=k)
        return color_topk(jnp.asarray(ncol), jnp.asarray(ncnt),
                          colors_d, counts_d, valid_d, k=k)

    def _drain(self, pending, results):
        """Read back one dispatched block into per-needle (ids, scores)."""
        qb, (scores, idx) = pending.popleft()
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        for row in range(qb):
            hit = scores[row] < BAD_SCORE
            results.append((self._ids[idx[row][hit]], scores[row][hit]))

    def search(self, needle_descs: Sequence[Optional[np.ndarray]], k: int = 64,
               needle_batch: int = 64, window: int = 32):
        """@return per needle (ids, scores float32) sorted ascending.

        Blocks are dispatched ``window`` ahead of the readback so the
        per-call host↔device round-trip (5-30 ms through a remote-TPU
        tunnel) overlaps the device scans instead of serializing them."""
        import collections
        q_total = len(needle_descs)
        empty = (np.zeros(0, np.uint32), np.zeros(0, np.float32))
        if q_total == 0 or len(self._ids) == 0:
            return [empty] * q_total
        results: list = []
        pending = collections.deque()
        for s in range(0, q_total, needle_batch):
            chunk = needle_descs[s:s + needle_batch]
            qb = len(chunk)
            ncol = np.zeros((needle_batch, NUM_COLORS, 3), dtype=np.float32)
            ncnt = np.zeros(needle_batch, dtype=np.int32)
            for n, dsc in enumerate(chunk):
                if dsc is not None:
                    ncol[n] = dequantize_luv(dsc[:NUM_COLORS, :3])
                    ncnt[n] = dsc[NUM_COLORS, 0]
            pending.append((qb, self._dispatch_topk(ncol, ncnt, k)))
            if len(pending) >= window:
                self._drain(pending, results)
        while pending:
            self._drain(pending, results)
        return results

    def search_self(self, k: int = 16, needle_batch: int = 1024,
                    sparse: bool = False):
        """N² color search: every store row scored against the whole store.

        The reference DNFs this at 500k (readme.md:293 — its O(N·N) CPU
        scan, src/colordescindex.cpp:249-278, has no batch parallelism).
        Default path: count-bucketed one-sided scan (_search_self_bucketed)
        — the |numColors| ≤ 2 accept gate (src/cvutil.cpp:688) means a
        needle bucket only ever scores 5 of the ~13 populated count values,
        and within a (needle-count, haystack-count) pair the asymmetric
        reduction side is fixed, so the kernel builds one min-tree instead
        of two.  The unbucketed full scan remains for meshes (sharded row
        layout) and as CBIRD_COLOR_BUCKETS=off for A/B.

        @return {row: (ids, scores)} when sparse else a dense list."""
        import os as _os
        from .hamming import _search_mesh
        n = len(self._ids)
        if n == 0:
            return {} if sparse else []
        if (_search_mesh() is None
                and _os.environ.get("CBIRD_COLOR_BUCKETS", "on") != "off"):
            return self._search_self_bucketed(k, needle_batch, sparse)
        return self._search_self_scan(k, needle_batch, sparse)

    def _search_self_scan(self, k: int, needle_batch: int, sparse: bool):
        """Unbucketed N²: store rows streamed through the same chunked
        top-k kernel as ``search`` in wide batches, windowed-async."""
        import collections
        n = len(self._ids)
        out: dict = {}
        pending = collections.deque()

        def drain():
            s, qb, (scores, idx) = pending.popleft()
            scores = np.asarray(scores)
            idx = np.asarray(idx)
            for row in range(qb):
                hit = scores[row] < BAD_SCORE
                if hit.any():
                    out[s + row] = (self._ids[idx[row][hit]],
                                    scores[row][hit])

        for s in range(0, n, needle_batch):
            qb = min(needle_batch, n - s)
            block = self._descs[s:s + qb]
            ncol = np.zeros((needle_batch, NUM_COLORS, 3), dtype=np.float32)
            ncnt = np.zeros(needle_batch, dtype=np.int32)
            ncol[:qb] = dequantize_luv(block[:, :NUM_COLORS, :3])
            ncnt[:qb] = block[:, NUM_COLORS, 0]
            ncnt[:qb][self._ids[s:s + qb] == 0] = 0  # tombstones never match
            pending.append((s, qb, self._dispatch_topk(ncol, ncnt, k)))
            if len(pending) >= 32:
                drain()
        while pending:
            drain()
        if sparse:
            return out
        dense = [(np.zeros(0, np.uint32), np.zeros(0, np.float32))] * n
        for r, v in out.items():
            dense[r] = v
        return dense

    def _search_self_bucketed(self, k: int, needle_batch: int, sparse: bool,
                              window: int = 32):
        """Count-bucketed one-sided N² (see search_self).

        The store is sorted once by numColors; each equal-count needle
        bucket then scans two CONTIGUOUS ranges of the sorted order —
        counts in [c−2, c] with the needle-side reduction and [c+1, c+2]
        with the haystack-side one — in fixed-shape super_chunk slices
        (color_self_block), windowed-async like the plain scan.  Per-block
        partial top-ks merge on host; ties resolve by original row order
        to match the unbucketed kernel.

        Known tie divergence vs the scan path: the final lexsort only sees
        candidates that SURVIVED the per-chunk top-k, and within one chunk
        lax.top_k keeps equal-score rows by sorted-order position.  With
        more than k exactly-equal-score rows in a single chunk (a duplicate
        cluster larger than k), the k ids kept here can differ from the
        scan path's original-row tie-break.  Both selections are equally
        valid matches (identical scores), so this is accepted rather than
        paid for with per-chunk oversampling; tests compare against the
        scan path only below that regime."""
        import collections
        n = len(self._ids)
        counts = self._descs[:, NUM_COLORS, 0].astype(np.int32)
        counts = np.where(self._ids != 0, counts, 0)
        order = np.argsort(counts, kind="stable").astype(np.int64)
        sc = counts[order]
        from .hamming import _bucket
        super_chunk = min(1 << 16, _bucket(int(n), minimum=256))
        chunk = min(4096, super_chunk)
        qb_max = min(needle_batch, _bucket(int(n), minimum=64))
        ns = -(-n // super_chunk) * super_chunk
        colors_s = np.zeros((ns, NUM_COLORS, 3), np.float32)
        colors_s[:n] = dequantize_luv(self._descs[order][:, :NUM_COLORS, :3])
        cnt_s = np.zeros(ns, np.int32)
        cnt_s[:n] = sc
        val_s = np.zeros(ns, bool)
        val_s[:n] = self._ids[order] != 0
        hs_colors = jnp.asarray(colors_s)
        hs_counts = jnp.asarray(cnt_s)
        hs_valid = jnp.asarray(val_s)

        out: dict = {}
        pending = collections.deque()
        # per needle block accumulation: dispatches for one block are
        # contiguous in the deque, so older blocks finalize as soon as
        # their last pending dispatch drains (bounds host memory to a few
        # [qb, k·d] partials instead of all N/qb blocks)
        acc: dict = {}
        _idx: dict = {}

        def finalize(key):
            s, qb = key
            ds = np.concatenate(acc.pop(key), axis=1)[:qb]
            is_ = np.concatenate(_idx.pop(key), axis=1)[:qb]
            orig = order[np.minimum(is_, n - 1)]
            # tie order: score, then original row index (matches lax.top_k
            # over the original-order store)
            sel = np.lexsort((orig, ds), axis=1)[:, :k]
            ds = np.take_along_axis(ds, sel, axis=1)
            orig = np.take_along_axis(orig, sel, axis=1)
            for row in range(qb):
                hit = ds[row] < BAD_SCORE
                if hit.any():
                    out[int(order[s + row])] = (
                        self._ids[orig[row][hit]].astype(np.uint32),
                        ds[row][hit].astype(np.float32))

        def drain():
            key, (scores, idx) = pending.popleft()
            acc.setdefault(key, []).append(np.asarray(scores))
            _idx.setdefault(key, []).append(np.asarray(idx))

        bounds = np.searchsorted(sc, np.arange(0, NUM_COLORS + 4))
        done_keys: list = []
        for c in np.unique(sc[sc > 0]):
            c = int(c)
            blo, bhi = bounds[c], bounds[c + 1]
            ab_lo = int(bounds[max(c - 2, 1)])
            ab_hi = int(bounds[c + 1])
            ba_lo = int(bounds[c + 1])
            ba_hi = int(bounds[min(c + 3, NUM_COLORS + 3)])
            for s in range(int(blo), int(bhi), qb_max):
                qb = min(qb_max, int(bhi) - s)
                ncol = np.zeros((qb_max, NUM_COLORS, 3), np.float32)
                ncnt = np.zeros(qb_max, np.int32)
                ncol[:qb] = colors_s[s:s + qb]
                ncnt[:qb] = cnt_s[s:s + qb]
                ncol_d, ncnt_d = jnp.asarray(ncol), jnp.asarray(ncnt)
                key = (s, qb)
                done_keys.append(key)
                for rlo, rhi, side in ((ab_lo, ab_hi, "ab"),
                                       (ba_lo, ba_hi, "ba")):
                    if rhi <= rlo:
                        continue
                    first = rlo // super_chunk * super_chunk
                    for start in range(first, rhi, super_chunk):
                        pending.append((key, color_self_block(
                            ncol_d, ncnt_d, hs_colors, hs_counts, hs_valid,
                            jnp.int32(start), jnp.int32(rlo), jnp.int32(rhi),
                            k=k, side=side, super_chunk=super_chunk,
                            chunk=chunk)))
                        if len(pending) >= window:
                            drain()
                while len(done_keys) > 2:  # keep ≤2 blocks accumulating
                    old = done_keys.pop(0)
                    while any(p[0] == old for p in pending):
                        drain()
                    finalize(old)
        while pending:
            drain()
        for key in done_keys:
            finalize(key)
        if sparse:
            return out
        dense = [(np.zeros(0, np.uint32), np.zeros(0, np.float32))] * n
        for r, v in out.items():
            dense[r] = v
        return dense
