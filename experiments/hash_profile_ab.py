"""Component timing for the DCT hash pipeline on the real chip.

Breaks hash_step (autocrop + dct_hash_from_boxes) into stages to find the
bound: autocrop reductions, per-image linear-map construction, canvas
matmuls, DCT+pack tail.  Same process, 32 dispatches per timing, host
readback sync (CLAUDE.md: block_until_ready under-measures on the tunnel).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import (_D32, _POW32, _ZZ64, _axis_map,
                                    _blur_radius, autocrop_boxes,
                                    dct_hash_from_boxes, full_boxes)

B, H, W = 512, 448, 448
ITERS = 32


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:8.3f} ms/batch  {B / dt:12,.0f} img/s")
    return dt


@jax.jit
def full_step(canvas, sizes):
    boxes = autocrop_boxes(canvas, sizes, 20)
    return dct_hash_from_boxes(canvas, boxes)


@jax.jit
def crop_only(canvas, sizes):
    return autocrop_boxes(canvas, sizes, 20)


@jax.jit
def hash_only(canvas, boxes):
    return dct_hash_from_boxes(canvas, boxes)


@jax.jit
def maps_only(boxes):
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh = bottom - top
    ww = right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=H))(top, hh, rblur)
    mw = jax.vmap(functools.partial(_axis_map, n_out=32, n_canvas=W))(left, ww, rblur)
    return mh, mw


@jax.jit
def matmul_tail(canvas, mh, mw):
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("bih,bhw->biw", mh, x)
    g = jnp.einsum("biw,bjw->bij", g, mw)
    hp = jax.lax.Precision.HIGHEST
    d = jnp.asarray(_D32)
    freq = jnp.einsum("ki,bij->bkj", d, g, precision=hp)
    freq = jnp.einsum("bkj,lj->bkl", freq, d, precision=hp)
    blk = freq[:, :9, :9].reshape(B, 81)
    v = blk[:, jnp.asarray(_ZZ64)]
    thresh = jnp.sum(v, axis=1, keepdims=True) / 64.0
    bits = v > thresh
    bits = bits.at[:, 0].set(False)
    pw = jnp.asarray(_POW32)
    lo = jnp.sum(bits[:, :32].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    hi = jnp.sum(bits[:, 32:].astype(jnp.uint32) * pw, axis=1, dtype=jnp.uint32)
    return jnp.stack([lo, hi], axis=1)


@jax.jit
def matmul_bf16(canvas, mh, mw):
    x = canvas.astype(jnp.bfloat16)
    g = jnp.einsum("bih,bhw->biw", mh.astype(jnp.bfloat16), x)
    g = jnp.einsum("biw,bjw->bij", g, mw.astype(jnp.bfloat16))
    return g.astype(jnp.float32)


@jax.jit
def matmul_f32only(canvas, mh, mw):
    x = canvas.astype(jnp.float32)
    g = jnp.einsum("bih,bhw->biw", mh, x)
    return jnp.einsum("biw,bjw->bij", g, mw)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 255, size=(B, H, W)).astype(np.uint8))
    sizes = jnp.asarray(np.full((B, 2), (400, 400), dtype=np.int32))

    boxes = np.asarray(crop_only(canvas, sizes))
    boxes_d = jnp.asarray(boxes)
    mh, mw = maps_only(boxes_d)
    mh = jax.block_until_ready(mh)
    mw = jax.block_until_ready(mw)

    for _ in range(2):  # repeat: pool speed varies within a process too
        t_full = timeit("full hash_step", full_step, canvas, sizes)
        t_crop = timeit("  autocrop_boxes", crop_only, canvas, sizes)
        t_hash = timeit("  dct_hash_from_boxes", hash_only, canvas, boxes_d)
        t_maps = timeit("    map construction", maps_only, boxes_d)
        t_mm = timeit("    matmuls+dct+pack", matmul_tail, canvas, mh, mw)
        t_f32 = timeit("      canvas matmuls f32", matmul_f32only, canvas, mh, mw)
        t_bf16 = timeit("      canvas matmuls bf16", matmul_bf16, canvas, mh, mw)
        print(f"sum of parts {1e3 * (t_crop + t_maps + t_mm):.3f} ms "
              f"vs full {1e3 * t_full:.3f} ms")


if __name__ == "__main__":
    main()
