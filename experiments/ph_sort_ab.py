"""Pigeonhole block-sort formulation A/B.

The count phase sorts the store T times (one per bit-block); at 10M that
is now ~2.8 s of the ~5.7 s count phase.  The current sort keys on the
two masked u32 words (lax.sort num_keys=2) and gathers slo/shi/svalid by
srow afterwards.  A block only has ceil(64/T) ≤ 13 distinct bits, so a
compacted ≤16-bit single key should sort cheaper.  Variants:

  a) current: sort (klo, khi, iota) num_keys=2, then 3 gathers
  b) compact u32 key: sort (key, iota) num_keys=1, then 3 gathers
  c) compact key, payload-carry: sort (key, iota, lo, hi, valid) — no
     gathers

Usage: python experiments/ph_sort_ab.py [n_millions] [threshold]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cbird_tpu.ops import pigeonhole
from cbird_tpu.ops.dct_hash import split_u64

_U32 = jnp.uint32(0xFFFFFFFF)


def _mask_positions(mask_lo: int, mask_hi: int, width: int):
    """(word_sel [width], shift [width], live [width]) — bit i of the
    compact key comes from word[word_sel[i]] >> shift[i]; dead slots
    (block narrower than width) contribute 0."""
    sel, sh, live = [], [], []
    for p in range(64):
        if (mask_lo if p < 32 else mask_hi) >> (p % 32) & 1:
            sel.append(0 if p < 32 else 1)
            sh.append(p % 32)
            live.append(1)
    while len(sel) < width:
        sel.append(0)
        sh.append(0)
        live.append(0)
    return (np.array(sel, np.int32), np.array(sh, np.uint32),
            np.array(live, np.uint32))


@functools.partial(jax.jit, static_argnames=("width",))
def _compact_key(pairs, valid, sel, sh, live, *, width):
    lo, hi = pairs[:, 0], pairs[:, 1]
    key = jnp.zeros(lo.shape, jnp.uint32)
    for i in range(width):
        w = jnp.where(sel[i] == 0, lo, hi)
        key |= (((w >> sh[i]) & live[i]) << jnp.uint32(i))
    # invalid rows sink to the end (same sentinel trick as _sort_block)
    return jnp.where(valid, key, _U32)


@jax.jit
def _sort_a(pairs, valid, cmlo, cmhi):
    lo, hi = pairs[:, 0], pairs[:, 1]
    n = lo.shape[0]
    klo = jnp.where(valid, lo & cmlo, _U32)
    khi = jnp.where(valid, hi & cmhi, _U32)
    _, _, srow = jax.lax.sort(
        (klo, khi, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
    return jnp.take(lo, srow), jnp.take(hi, srow), srow, jnp.take(valid, srow)


@functools.partial(jax.jit, static_argnames=("width",))
def _sort_b(pairs, valid, sel, sh, live, *, width):
    lo, hi = pairs[:, 0], pairs[:, 1]
    n = lo.shape[0]
    key = _compact_key(pairs, valid, sel, sh, live, width=width)
    _, srow = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1)
    return jnp.take(lo, srow), jnp.take(hi, srow), srow, jnp.take(valid, srow)


@functools.partial(jax.jit, static_argnames=("width",))
def _sort_c(pairs, valid, sel, sh, live, *, width):
    lo, hi = pairs[:, 0], pairs[:, 1]
    n = lo.shape[0]
    key = _compact_key(pairs, valid, sel, sh, live, width=width)
    _, srow, slo, shi, sv = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32), lo, hi,
         valid.astype(jnp.uint32)), num_keys=1)
    return slo, shi, srow, sv.astype(bool)


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    n_pad = -n % (1 << 21)
    pairs = jnp.asarray(np.pad(split_u64(hashes), ((0, n_pad), (0, 0))))
    valid = jnp.asarray(np.pad(np.ones(n, bool), (0, n_pad)))
    masks = pigeonhole.block_masks(t)
    width = max(bin(lo).count("1") + bin(hi).count("1") for lo, hi in masks)
    print(f"n={n} t={t} T={len(masks)} width={width} "
          f"device={jax.devices()[0]}")

    outs = {}
    for name, fn in (
        ("a:two-key", lambda m: _sort_a(pairs, valid, jnp.uint32(m[0]),
                                        jnp.uint32(m[1]))),
        ("b:compact+gather", lambda m: _sort_b(
            pairs, valid, *map(jnp.asarray, _mask_positions(*m, width)),
            width=width)),
        ("c:compact+carry", lambda m: _sort_c(
            pairs, valid, *map(jnp.asarray, _mask_positions(*m, width)),
            width=width)),
    ):
        for it in range(2):
            t0 = time.monotonic()
            res = [fn(m) for m in masks]
            jax.block_until_ready(res)
            dt = time.monotonic() - t0
        outs[name] = res
        print(f"{name}: {dt:.3f}s warm for {len(masks)} blocks "
              f"({dt/len(masks)*1000:.0f} ms/block)")

    # parity: same multiset per key — compare sorted (key,row) histograms
    ra = outs["a:two-key"]
    for name in ("b:compact+gather", "c:compact+carry"):
        for b, m in enumerate(masks):
            sa = np.sort(np.asarray(ra[b][2]) * 0 + np.asarray(ra[b][0]))
            sb = np.sort(np.asarray(outs[name][b][0]))
            assert np.array_equal(sa, sb), (name, b)
    print("sorted-word multisets identical across variants")


if __name__ == "__main__":
    main()
