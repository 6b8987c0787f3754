"""Pallas vs XLA band-scan A/B for the pigeonhole count phase.

Times one block's full band scan (all tiles) both ways in one process
and asserts the csort contributions identical.

Usage: python experiments/pallas_band_ab.py [n_millions] [s] [threshold] \
           [n_prev] [bc ...]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cbird_tpu.ops import pigeonhole, pallas_band
from cbird_tpu.ops.dct_hash import split_u64


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_prev = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    bcs = [int(a) for a in sys.argv[5:]] or [0]
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # plant near-duplicates so `identical` checks real contributions
    srcs = rng.choice(n, size=2000, replace=False)
    for src in srcs:
        h = int(hashes[src])
        for b in rng.choice(64, size=int(rng.integers(0, t)), replace=False):
            h ^= 1 << int(b)
        hashes[int(rng.integers(0, n))] = np.uint64(h)
    n_pad = n + (-n % (1 << 21))
    pairs = jnp.asarray(np.pad(split_u64(hashes), ((0, n_pad - n), (0, 0))))
    valid = jnp.asarray(np.pad(np.ones(n, bool), (0, n_pad - n)))
    masks = pigeonhole.block_masks(t)
    mask_cur = masks[n_prev]
    mask_prev = masks[:n_prev]
    width = -(-64 // t)
    slo, shi, srow, svalid, _, _, _ = pigeonhole._prep_block(
        pairs, valid, mask_cur, width, s=s)
    g = max(2, min(128, (1 << 29) // (2 * s * s)))
    while n_pad % (g * s):
        g //= 2
    print(f"n={n} s={s} t={t} n_prev={n_prev} g={g} "
          f"device={jax.devices()[0]}")
    pairs_total = n_pad * 2 * s

    for it in range(2):
        t0 = time.monotonic()
        ref = jnp.zeros(n_pad + s, jnp.int32)
        for p0 in range(0, n_pad, g * s):
            ref = pigeonhole._band_chunk(
                ref, slo, shi, srow, svalid, jnp.int32(p0),
                mask_cur=mask_cur, mask_prev=mask_prev, s=s, g=g, t=t)
        ref_np = np.asarray(ref)
        dt_x = time.monotonic() - t0
    print(f"XLA band: {dt_x:.3f}s warm ({pairs_total/dt_x/1e9:.0f}G pairs/s)")

    marr = np.zeros((t, 2), np.uint32)
    marr[0] = mask_cur
    for p, m in enumerate(mask_prev):
        marr[1 + p] = m
    for bc in bcs:
        for it in range(2):
            t0 = time.monotonic()
            got = pigeonhole._band_epilogue(
                pallas_band.band_counts(slo, shi, srow, svalid,
                                        jnp.asarray(marr), jnp.int32(t),
                                        s=s, t_blocks=t, bc=bc), s=s)
            got_np = np.asarray(got)
            dt_p = time.monotonic() - t0
        print(f"Pallas band bc={bc or pallas_band.BC}: {dt_p:.3f}s warm "
              f"({pairs_total/dt_p/1e9:.0f}G pairs/s; {dt_x/dt_p:.1f}x XLA) "
              f"identical: {np.array_equal(ref_np, got_np)} "
              f"(sum={got_np.sum()})")


if __name__ == "__main__":
    main()
