"""Pigeonhole band-kernel cost decomposition.

The band scan runs ~120-160G pairs/s vs 419-510G for the streaming count
tiles.  Candidate costs: the first-equal-block dedup masks (4 u32 ops
per prev block), the dual-axis reduction (col_ct reduces over the
middle/needle axis, which the repo's triangular-scan learnings say
defeats the VPU row reduce), and the attribution compare.  This measures
perf-only variants (results intentionally wrong for the ablations) to
see where the time goes:

  a) current: masks + row_ct + col_ct
  b) no col_ct (row-axis reduce only)
  c) no dedup masks (d<t only), dual reduce
  d) no masks, row-only (the streaming-kernel op mix)
  e) two-pass fwd/bwd row-only with masks (correct attribution without
     a needle-axis reduce; 2x pair evals)

Usage: python experiments/ph_band_ab.py [n_millions] [s] [threshold]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cbird_tpu.ops import pigeonhole
from cbird_tpu.ops.pigeonhole import _hit_mask
from cbird_tpu.ops.dct_hash import split_u64


def _slices(slo, shi, srow, svalid, p0, r, s, off):
    a = lambda x: jax.lax.dynamic_slice(x, (p0 + off,), (r,))
    return a(slo), a(shi), a(srow), a(svalid)


def _win(x, p0, r, s, g, off):
    return jax.lax.dynamic_slice(x, (p0 + off,), (r,)).reshape(g, s)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("mask_cur", "mask_prev", "s", "g", "t",
                                    "variant"))
def band_variant(csort, slo, shi, srow, svalid, p0, *, mask_cur, mask_prev,
                 s, g, t, variant):
    r = g * s
    a_lo = _win(slo, p0, r, s, g, 0)
    a_hi = _win(shi, p0, r, s, g, 0)
    a_row = _win(srow, p0, r, s, g, 0)
    a_v = _win(svalid, p0, r, s, g, 0)
    w_lo = _win(slo, p0, r, s, g, s)
    w_hi = _win(shi, p0, r, s, g, s)
    w_row = _win(srow, p0, r, s, g, s)
    w_v = _win(svalid, p0, r, s, g, s)
    b_lo = jnp.concatenate([a_lo, w_lo], axis=1)
    b_hi = jnp.concatenate([a_hi, w_hi], axis=1)
    b_row = jnp.concatenate([a_row, w_row], axis=1)
    b_v = jnp.concatenate([a_v, w_v], axis=1)
    x_lo = a_lo[:, :, None] ^ b_lo[:, None, :]
    x_hi = a_hi[:, :, None] ^ b_hi[:, None, :]
    if variant in ("a", "b", "e"):
        hit = _hit_mask(x_lo, x_hi, t, mask_cur, mask_prev)
    else:
        d = (jax.lax.population_count(x_lo)
             + jax.lax.population_count(x_hi)).astype(jnp.int32)
        hit = d < t
    hit &= a_v[:, :, None] & b_v[:, None, :]
    hit &= (jnp.arange(s, dtype=jnp.int32)[:, None]
            < jnp.arange(2 * s, dtype=jnp.int32)[None, :])
    att = a_row[:, :, None] < b_row[:, None, :]
    contrib = jnp.zeros(r + s, jnp.int32)
    if variant in ("a", "c"):
        row_ct = (hit & att).sum(axis=2, dtype=jnp.int32).reshape(r)
        col_ct = (hit & ~att).sum(axis=1, dtype=jnp.int32)
        contrib = contrib.at[:r].add(row_ct + col_ct[:, :s].reshape(r))
        contrib = contrib.at[s:].add(col_ct[:, s:].reshape(r))
    elif variant in ("b", "d"):
        row_ct = (hit & att).sum(axis=2, dtype=jnp.int32).reshape(r)
        contrib = contrib.at[:r].add(row_ct)
    elif variant == "e":
        # forward half: credit a-side when a_row smaller
        row_ct = (hit & att).sum(axis=2, dtype=jnp.int32).reshape(r)
        # backward window: previous tile + own (i > j)
        c_lo = jnp.concatenate([jnp.roll(a_lo, 1, axis=0), a_lo], axis=1)
        c_hi = jnp.concatenate([jnp.roll(a_hi, 1, axis=0), a_hi], axis=1)
        c_row = jnp.concatenate([jnp.roll(a_row, 1, axis=0), a_row], axis=1)
        c_v = jnp.concatenate([jnp.roll(a_v, 1, axis=0), a_v], axis=1)
        y_lo = a_lo[:, :, None] ^ c_lo[:, None, :]
        y_hi = a_hi[:, :, None] ^ c_hi[:, None, :]
        hit2 = _hit_mask(y_lo, y_hi, t, mask_cur, mask_prev)
        hit2 &= a_v[:, :, None] & c_v[:, None, :]
        hit2 &= (jnp.arange(s, dtype=jnp.int32)[:, None] + s
                 > jnp.arange(2 * s, dtype=jnp.int32)[None, :])
        att2 = a_row[:, :, None] < c_row[:, None, :]
        row_ct2 = (hit2 & att2).sum(axis=2, dtype=jnp.int32).reshape(r)
        contrib = contrib.at[:r].add(row_ct + row_ct2)
    cur = jax.lax.dynamic_slice(csort, (p0,), (r + s,))
    return jax.lax.dynamic_update_slice(csort, cur + contrib, (p0,))


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    n_pad = n + (-n % (1 << 21))
    masks = pigeonhole.block_masks(t)
    mask_cur = masks[2]
    mask_prev = masks[:2]  # median dedup-mask count
    pairs = np.pad(split_u64(hashes), ((0, n_pad - n), (0, 0)))
    order = np.argsort(pairs[:, 0] & np.uint32(mask_cur[0]))
    slo = jnp.asarray(np.pad(pairs[order, 0], (0, s)))
    shi = jnp.asarray(np.pad(pairs[order, 1], (0, s)))
    srow = jnp.asarray(np.pad(order.astype(np.int32), (0, s)))
    svalid = jnp.asarray(np.pad(np.ones(n_pad, bool), (0, s)))
    g = max(2, min(128, (1 << 29) // (2 * s * s)))
    while n_pad % (g * s):
        g //= 2
    r = g * s
    print(f"n={n} s={s} g={g} t={t} prev={len(mask_prev)} "
          f"device={jax.devices()[0]}")
    pairs_total = n_pad * 2 * s
    for v in ("a", "b", "c", "d", "e"):
        for it in range(2):
            csort = jnp.zeros(n_pad + s, jnp.int32)
            t0 = time.monotonic()
            for p0 in range(0, n_pad, r):
                csort = band_variant(csort, slo, shi, srow, svalid,
                                     jnp.int32(p0), mask_cur=mask_cur,
                                     mask_prev=mask_prev, s=s, g=g, t=t,
                                     variant=v)
            total = int(np.asarray(csort).sum())
            dt = time.monotonic() - t0
        rate = pairs_total / dt / 1e9
        print(f"variant {v}: {dt:.3f}s warm ({rate:.0f}G pairs/s nominal, "
              f"sum={total})")


if __name__ == "__main__":
    main()
