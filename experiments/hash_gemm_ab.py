"""A/B for VERDICT r04 #3: fewer/cheaper ops in the hash-pipeline map
construction (the measured tail bound: 1.33 ms of the 2.10 ms batch is
_axis_map construction, experiments/hash_tail_ab.py).

Variant B (closed form): blur(2r+1) ∘ area-resize is a windowed sum of the
per-cell overlap trapezoid, and the overlap's prefix sum over source pixels
has a closed form
    cum(i, Y) = (clip(clip(Y+1, 0, size), i·sy, (i+1)·sy) − i·sy) / sy,
so the whole interior collapses to cum(t+r) − cum(t−r−1) and each
reflect-101 edge to one more cum() term — ONE fused elementwise expression
over [32, n_canvas] instead of a 7-tap slice sum + 6 one-hot edge
corrections (~35 HLO ops → ~8).

Variant C (uniform shared map): when every row of the batch shares one
(box, size) — video frames, fixed-size thumbnail batches — build ONE map
and run two shared-operand GEMMs ("ih,bhw->biw": a single [32,H]×[H,B·W]
MXU matmul) instead of B batched [32,H]×[H,W] ones.

Checks map equality vs the production _axis_map, hash equality on
photographic-statistics images, then times the full hash step per variant.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import (_D32, _POW32, _ZZ64, _axis_map,
                                    _blur_radius, autocrop_boxes, full_boxes,
                                    dct_hash_from_boxes)

B, H, W = 512, 448, 448
ITERS = 32


def _axis_map_old(start, size, rblur, n_out: int, n_canvas: int):
    """The round-4 production construction (extended-domain resize matrix,
    7 tap slices + 6 one-hot edge corrections) — kept here as the A/B
    baseline after the closed form replaced it in ops/dct_hash.py."""
    size_f = size.astype(jnp.float32)
    sy = size_f / n_out
    i = jnp.arange(n_out, dtype=jnp.float32)[:, None]
    k_inv = 1.0 / (2.0 * rblur.astype(jnp.float32) + 1.0)

    def resize_w(y_int):
        y = y_int.astype(jnp.float32)[None, :]
        lo = jnp.maximum(i * sy, y)
        hi = jnp.minimum((i + 1.0) * sy, y + 1.0)
        wgt = jnp.maximum(hi - lo, 0.0) / sy
        inb = ((y_int >= 0) & (y_int < size)).astype(jnp.float32)
        return wgt * inb[None, :]

    def wd(d):
        return (rblur >= abs(d)).astype(jnp.float32) * k_inv

    tl = jnp.arange(n_canvas, dtype=jnp.int32) - start
    uext = jnp.arange(n_canvas + 6, dtype=jnp.int32) - 3 - start
    wext = resize_w(uext)
    m = jnp.zeros((n_out, n_canvas), jnp.float32)
    for d in range(-3, 4):
        m = m + wd(d) * jax.lax.slice_in_dim(wext, 3 - d, 3 - d + n_canvas,
                                             axis=1)
    r03 = resize_w(jnp.arange(4, dtype=jnp.int32))
    for t in (1, 2, 3):
        corr = sum(wd(d) * r03[:, -t - d] for d in range(-3, -t + 1))
        m = m + corr[:, None] * (tl == t).astype(jnp.float32)[None, :]
    rr = resize_w(size - 1 - jnp.arange(3, dtype=jnp.int32))
    for j in (2, 1, 0):
        corr = sum(wd(d) * rr[:, d - j - 1] for d in range(j + 1, 4))
        m = m + corr[:, None] * (tl == size - 2 - j).astype(
            jnp.float32)[None, :]
    valid_t = ((tl >= 0) & (tl < size)).astype(jnp.float32)
    return m * valid_t[None, :]


def hash_from_boxes_old(canvas, boxes):
    Bc, Hc, Wc = canvas.shape
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh, ww = bottom - top, right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(_axis_map_old, n_out=32, n_canvas=Hc))(
        top, hh, rblur)
    mw = jax.vmap(functools.partial(_axis_map_old, n_out=32, n_canvas=Wc))(
        left, ww, rblur)
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("bih,bhw->biw", mh, x)
    g = jnp.einsum("biw,bjw->bij", g, mw)
    return _hash_epilogue(g, Bc)


def _axis_map_cum(start, size, rblur, n_out: int, n_canvas: int):
    """Closed-form candidate (see module docstring)."""
    size_f = size.astype(jnp.float32)
    sy = size_f / n_out
    i = jnp.arange(n_out, dtype=jnp.float32)[:, None]
    lo = i * sy
    hi = (i + 1.0) * sy
    k_inv = 1.0 / (2.0 * rblur.astype(jnp.float32) + 1.0)
    r = rblur.astype(jnp.int32)
    tl = jnp.arange(n_canvas, dtype=jnp.int32) - start  # crop-local [C]

    def cum(y_excl):
        """Σ_{y=0}^{Y} overlap(i, y) with Y = y_excl−1 (y_excl int [C])."""
        yf = jnp.clip(y_excl.astype(jnp.float32), 0.0, size_f)[None, :]
        return (jnp.clip(yf, lo, hi) - lo) / sy

    interior = cum(tl + r + 1) - cum(tl - r)
    left = jnp.where(tl >= 1, 1.0, 0.0)[None, :] * cum(r - tl + 1)
    right = jnp.where(tl <= size - 2, 1.0, 0.0)[None, :] * (
        cum(jnp.broadcast_to(size, tl.shape)) - cum(2 * size - 2 - tl - r))
    valid_t = ((tl >= 0) & (tl < size)).astype(jnp.float32)
    return k_inv * (interior + left + right) * valid_t[None, :]


def _hash_epilogue(g, Bc):
    hp = jax.lax.Precision.HIGHEST
    d = jnp.asarray(_D32)
    freq = jnp.einsum("ki,bij->bkj", d, g, precision=hp)
    freq = jnp.einsum("bkj,lj->bkl", freq, d, precision=hp)
    blk = freq[:, :9, :9].reshape(Bc, 81)
    v = blk[:, jnp.asarray(_ZZ64)]
    thresh = jnp.sum(v, axis=1, keepdims=True) / 64.0
    bits = v > thresh
    bits = bits.at[:, 0].set(False)
    pw = jnp.asarray(_POW32)
    lo = jnp.sum(bits[:, :32].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    hi = jnp.sum(bits[:, 32:].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    lo = jnp.where((lo == 0) & (hi == 0), jnp.uint32(1), lo)
    return jnp.stack([lo, hi], axis=1)


def hash_from_boxes_cum(canvas, boxes):
    Bc, Hc, Wc = canvas.shape
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh, ww = bottom - top, right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(_axis_map_cum, n_out=32, n_canvas=Hc))(
        top, hh, rblur)
    mw = jax.vmap(functools.partial(_axis_map_cum, n_out=32, n_canvas=Wc))(
        left, ww, rblur)
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("bih,bhw->biw", mh, x)
    g = jnp.einsum("biw,bjw->bij", g, mw)
    return _hash_epilogue(g, Bc)


def hash_uniform(canvas, box1, size1):
    """Variant C: one shared map per axis, two shared-operand GEMMs."""
    Bc, Hc, Wc = canvas.shape
    hh = box1[1] - box1[0]
    ww = box1[3] - box1[2]
    rblur = _blur_radius(hh * ww)
    mh = _axis_map_cum(box1[0], hh, rblur, n_out=32, n_canvas=Hc)
    mw = _axis_map_cum(box1[2], ww, rblur, n_out=32, n_canvas=Wc)
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("ih,bhw->biw", mh, x)
    g = jnp.einsum("biw,jw->bij", g, mw)
    return _hash_epilogue(g, Bc)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best * 1e3:8.3f} ms/batch  {B / best:12,.0f} img/s",
          flush=True)
    return best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # ---- correctness: maps + hashes across crop geometries ---------------
    sizes = np.stack([rng.integers(33, 448, 64), rng.integers(33, 448, 64)],
                     axis=1).astype(np.int32)
    sizes[0] = (448, 448)
    sizes[1] = (32, 32)   # blur radius 0
    sizes[2] = (65, 120)  # radius 1
    starts = np.zeros_like(sizes)
    starts[4] = (7, 13)   # offset crops
    starts[5] = (100, 5)
    worst = 0.0
    for s, (hh, ww) in zip(starts, sizes):
        for st, sz, n_can in ((s[0], hh, H), (s[1], ww, W)):
            a = _axis_map_old(jnp.int32(st), jnp.int32(sz),
                              _blur_radius(jnp.int32(hh) * jnp.int32(ww)),
                              n_out=32, n_canvas=n_can)
            b = _axis_map(jnp.int32(st), jnp.int32(sz),
                          _blur_radius(jnp.int32(hh) * jnp.int32(ww)),
                          n_out=32, n_canvas=n_can)
            worst = max(worst, float(jnp.max(jnp.abs(a - b))))
    print(f"map |diff| worst: {worst:.3e}", flush=True)

    # hash equality on photographic-statistics content
    sys.path.insert(0, "tests")
    from corpus import photo_image
    canvas = np.zeros((B, H, W), np.uint8)
    szs = np.zeros((B, 2), np.int32)
    for n in range(B):
        hh = int(rng.integers(64, 440))
        ww = int(rng.integers(64, 440))
        canvas[n, :hh, :ww] = photo_image(rng, hh, ww)[..., 1] \
            if n < 32 else rng.integers(0, 255, (hh, ww))
        szs[n] = (hh, ww)
    cj = jnp.asarray(canvas)
    sj = jnp.asarray(szs)
    boxes = autocrop_boxes(cj, sj, 20)
    ha = np.asarray(jax.jit(hash_from_boxes_old)(cj, boxes))
    hb = np.asarray(dct_hash_from_boxes(cj, boxes))
    x = (ha[:, 0].astype(np.uint64) | (ha[:, 1].astype(np.uint64) << 32)) ^ \
        (hb[:, 0].astype(np.uint64) | (hb[:, 1].astype(np.uint64) << 32))
    flips = np.array([bin(int(v)).count("1") for v in x])
    print(f"hash bit flips old vs closed-form: rows≠ {int((flips > 0).sum())}/{B}, "
          f"max {int(flips.max())} bits", flush=True)

    # ---- timing ----------------------------------------------------------
    @jax.jit
    def step_old(c, s):
        return hash_from_boxes_old(c, autocrop_boxes(c, s, 20))

    @jax.jit
    def step_prod(c, s):
        return dct_hash_from_boxes(c, autocrop_boxes(c, s, 20))

    canvas_u = rng.integers(0, 255, size=(B, H, W)).astype(np.uint8)
    sizes_u = np.full((B, 2), (400, 400), np.int32)
    cu, su = jnp.asarray(canvas_u), jnp.asarray(sizes_u)
    timeit("r04 slice+onehot maps", step_old, cu, su)
    timeit("production closed-form cum maps", step_prod, cu, su)

    @jax.jit
    def step_uniform(c, s):
        return hash_uniform(c, jnp.concatenate(
            [jnp.zeros(1, jnp.int32), s[0, 0:1],
             jnp.zeros(1, jnp.int32), s[0, 1:2]]), s[0])

    hu = np.asarray(step_uniform(cu, su))
    hp = np.asarray(step_prod(cu, jnp.asarray(sizes_u)))
    # uniform path must agree where autocrop found nothing (noise: full box)
    same = (hu == hp).all(axis=1).sum()
    print(f"uniform vs production equal rows: {same}/{B}", flush=True)
    timeit("uniform shared-map (1 GEMM pair)", step_uniform, cu, su)


if __name__ == "__main__":
    main()
