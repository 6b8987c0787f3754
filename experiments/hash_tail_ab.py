"""Honest matmul-tail A/B for the DCT hash pipeline (tiny outputs only).

maps are resident device inputs; every variant ends in [B,2] u32 hashes so
tunnel readback is negligible.  Questions:
  1. what does the tail (blur/resize matmul + DCT + pack) really cost?
  2. does a single-pass bf16 contraction win, and how many hash bits flip
     on worst-case (noise) images vs photographic-statistics images?
  3. map construction honest cost (scalar-reduced output).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import (_D32, _POW32, _ZZ64, _axis_map,
                                    _blur_radius, full_boxes)

B, H, W = 512, 448, 448
ITERS = 32


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:30s} {best * 1e3:8.3f} ms/batch  {B / best:12,.0f} img/s")
    return best


def _pack(v, Bc):
    thresh = jnp.sum(v, axis=1, keepdims=True) / 64.0
    bits = v > thresh
    bits = bits.at[:, 0].set(False)
    pw = jnp.asarray(_POW32)
    lo = jnp.sum(bits[:, :32].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    hi = jnp.sum(bits[:, 32:].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    lo = jnp.where((lo == 0) & (hi == 0), jnp.uint32(1), lo)
    return jnp.stack([lo, hi], axis=1)


def _dct_pack(g, Bc):
    hp = jax.lax.Precision.HIGHEST
    d = jnp.asarray(_D32)
    freq = jnp.einsum("ki,bij->bkj", d, g, precision=hp)
    freq = jnp.einsum("bkj,lj->bkl", freq, d, precision=hp)
    blk = freq[:, :9, :9].reshape(Bc, 81)
    return _pack(blk[:, jnp.asarray(_ZZ64)], Bc)


@jax.jit
def tail_f32(canvas, mh, mw):
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("bih,bhw->biw", mh, x)
    g = jnp.einsum("biw,bjw->bij", g, mw)
    return _dct_pack(g, canvas.shape[0])


@jax.jit
def tail_bf16(canvas, mh, mw):
    x = canvas.astype(jnp.bfloat16)
    g = jnp.einsum("bih,bhw->biw", mh.astype(jnp.bfloat16), x)
    g = jnp.einsum("biw,bjw->bij", g, mw.astype(jnp.bfloat16)).astype(jnp.float32)
    return _dct_pack(g, canvas.shape[0])


@jax.jit
def tail_dctfold_f32(canvas, mh, mw):
    # fold the DCT into the maps: freq = (D@mh) @ x @ (D@mw)^T
    d = jnp.asarray(_D32)
    dmh = jnp.einsum("ki,bih->bkh", d, mh, precision=jax.lax.Precision.HIGHEST)
    dmw = jnp.einsum("ki,bih->bkh", d, mw, precision=jax.lax.Precision.HIGHEST)
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("bih,bhw->biw", dmh, x)
    freq = jnp.einsum("biw,bjw->bij", g, dmw)
    Bc = canvas.shape[0]
    blk = freq[:, :9, :9].reshape(Bc, 81)
    return _pack(blk[:, jnp.asarray(_ZZ64)], Bc)


@jax.jit
def maps_scalar(boxes):
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh = bottom - top
    ww = right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=H))(top, hh, rblur)
    mw = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=W))(left, ww, rblur)
    return jnp.max(mh) + jnp.max(mw)


@jax.jit
def maps_make(boxes):
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh = bottom - top
    ww = right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=H))(top, hh, rblur)
    mw = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=W))(left, ww, rblur)
    return mh, mw


def synth_batch(rng):
    """photographic-statistics images: smooth sines + blobs."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32) / H
    out = np.zeros((B, H, W), np.float32)
    fx = rng.uniform(1, 5, B)
    fy = rng.uniform(1, 5, B)
    for i in range(B):
        img = 120 + 60 * np.sin(2 * np.pi * (fx[i] * x + fy[i] * y))
        out[i] = img
    out += rng.normal(0, 6, out.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.integers(0, 255, size=(B, H, W)).astype(np.uint8))
    photo = jnp.asarray(synth_batch(rng))
    sizes = jnp.asarray(np.full((B, 2), (400, 400), dtype=np.int32))
    boxes = jnp.asarray(np.asarray(full_boxes(sizes)))
    mh, mw = maps_make(boxes)
    mh = jax.block_until_ready(mh)
    mw = jax.block_until_ready(mw)

    for name, canvas in (("noise", noise), ("photo", photo)):
        h0 = np.asarray(tail_f32(canvas, mh, mw))
        h1 = np.asarray(tail_bf16(canvas, mh, mw))
        h2 = np.asarray(tail_dctfold_f32(canvas, mh, mw))
        pop = lambda a, b: int(np.unpackbits(
            np.ascontiguousarray(a ^ b).view(np.uint8)).sum())
        print(f"{name}: bf16 flips {(h0 != h1).any(1).sum()}/{B} imgs, "
              f"{pop(h0, h1)} bits total; dctfold flips "
              f"{(h0 != h2).any(1).sum()}/{B} imgs, {pop(h0, h2)} bits")

    timeit("maps construction (scalar)", maps_scalar, boxes)
    timeit("tail f32 (current)", tail_f32, noise, mh, mw)
    timeit("tail bf16", tail_bf16, noise, mh, mw)
    timeit("tail dct-folded f32", tail_dctfold_f32, noise, mh, mw)


if __name__ == "__main__":
    main()
