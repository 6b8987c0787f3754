"""A/B: old 21-full-width-eval _axis_map vs the extended-domain slice+edge
formulation (ops/dct_hash.py).  Checks map equality (exact away from the ≤6
reflect-101 edge columns, ULP-level there) and times construction + the full
hash_batch pipeline on the live device.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import (_axis_map, _blur_radius, autocrop_boxes,
                                    full_boxes, hash_batch)

B, H, W = 512, 448, 448
ITERS = 32


def _axis_map_old(start, size, rblur, n_out: int, n_canvas: int) -> jnp.ndarray:
    """The pre-2026-08-20 construction: 21 full-width resize_w evaluations."""
    size_f = size.astype(jnp.float32)
    sy = size_f / n_out
    i = jnp.arange(n_out, dtype=jnp.float32)[:, None]
    tl = jnp.arange(n_canvas, dtype=jnp.int32) - start
    valid_t = ((tl >= 0) & (tl < size)).astype(jnp.float32)
    k_inv = 1.0 / (2.0 * rblur.astype(jnp.float32) + 1.0)

    def resize_w(y_int):
        y = y_int.astype(jnp.float32)[None, :]
        lo = jnp.maximum(i * sy, y)
        hi = jnp.minimum((i + 1.0) * sy, y + 1.0)
        wgt = jnp.maximum(hi - lo, 0.0) / sy
        inb = ((y_int >= 0) & (y_int < size)).astype(jnp.float32)
        return wgt * inb[None, :]

    m = jnp.zeros((n_out, n_canvas), jnp.float32)
    for d in range(-3, 4):
        wd = (jnp.abs(d) <= rblur).astype(jnp.float32) * k_inv
        contrib = resize_w(tl - d)
        contrib = contrib + resize_w(-tl - d) * (tl >= 1).astype(jnp.float32)[None, :]
        contrib = contrib + (resize_w(2 * size - 2 - tl - d)
                             * (tl <= size - 2).astype(jnp.float32)[None, :])
        m = m + wd * contrib
    return m * valid_t[None, :]


def _maps(fn, boxes, h, w):
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    hh, ww = bottom - top, right - left
    rblur = _blur_radius(hh * ww)
    mh = jax.vmap(functools.partial(fn, n_out=32, n_canvas=h))(top, hh, rblur)
    mw = jax.vmap(functools.partial(fn, n_out=32, n_canvas=w))(left, ww, rblur)
    return mh, mw


maps_new = jax.jit(functools.partial(_maps, _axis_map), static_argnums=(1, 2))
maps_old = jax.jit(functools.partial(_maps, _axis_map_old), static_argnums=(1, 2))
# scalar-reduced variants: honest construction cost, negligible readback
maps_new_s = jax.jit(lambda b: sum(jnp.max(m) for m in _maps(_axis_map, b, H, W)))
maps_old_s = jax.jit(lambda b: sum(jnp.max(m) for m in _maps(_axis_map_old, b, H, W)))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best * 1e3:8.3f} ms/batch  {B / best:12,.0f} img/s")
    return best


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 255, size=(B, H, W)).astype(np.uint8))
    # exercise every blur radius + odd crops, incl. tiny sizes for the
    # edge-correction bound checks
    hs = rng.integers(1, H + 1, size=B).astype(np.int32)
    ws = rng.integers(1, W + 1, size=B).astype(np.int32)
    hs[:8] = [1, 2, 3, 4, 5, 6, 7, 448]
    ws[:8] = [1, 2, 3, 4, 5, 448, 7, 1]
    tops = (rng.integers(0, 8, size=B) % np.maximum(H - hs, 1)).astype(np.int32)
    lefts = (rng.integers(0, 8, size=B) % np.maximum(W - ws, 1)).astype(np.int32)
    boxes = jnp.asarray(np.stack([tops, tops + hs, lefts, lefts + ws], axis=1))

    mh_n, mw_n = jax.tree.map(np.asarray, maps_new(boxes, H, W))
    mh_o, mw_o = jax.tree.map(np.asarray, maps_old(boxes, H, W))
    for name, a, b in (("mh", mh_n, mh_o), ("mw", mw_n, mw_o)):
        exact = float((a == b).mean())
        dmax = float(np.abs(a - b).max())
        print(f"{name}: exact-equal {exact:.6f} of entries, max |diff| {dmax:.3e}")
        assert dmax < 1e-6, dmax

    sizes = jnp.asarray(np.stack([hs, ws], axis=1))
    hb = jax.jit(lambda c, s: hash_batch(c, s, do_crop=False)[0])
    timeit("maps construction old (scalar)", maps_old_s, boxes)
    timeit("maps construction new (scalar)", maps_new_s, boxes)
    timeit("hash_batch full (new maps)", hb, canvas, sizes)


if __name__ == "__main__":
    main()
