"""Pigeonhole vs classic N² count-phase A/B on the real TPU.

Stages timed separately (sort is the wildcard — XLA sort on TPU is
O(N log² N) bitonic-ish and could eat the win):
  1. _prep_block (sort + gathers + run masks) per block
  2. band chunks per block
  3. _unsort_add scatter per block
  4. full self_counts wall
  5. classic triangular count phase (MXU tiles) same process
Counts are compared for exact equality.

Usage: python experiments/pigeonhole_ab.py [n_millions] [threshold] [s]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cbird_tpu.ops import pigeonhole as ph
from cbird_tpu.ops.dct_hash import split_u64
from cbird_tpu.ops.hamming import PackedHashStore, _bucket
from cbird_tpu.ops import hamming


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    s_force = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n = int(n_m * 1e6)
    rng = np.random.default_rng(7)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # ~0.1% planted dup pairs at distance ≤ t-1
    n_dup = n // 1000
    src = rng.choice(n, size=n_dup, replace=False)
    dst = rng.choice(n, size=n_dup, replace=False)
    for a, b in zip(src, dst):
        h = int(hashes[a])
        for bit in rng.choice(64, size=int(rng.integers(0, t)), replace=False):
            h ^= 1 << int(bit)
        hashes[b] = np.uint64(h)
    ids = np.arange(1, n + 1, dtype=np.uint32)
    store = PackedHashStore(hashes, ids)
    hamming._MESH = None  # single real chip

    pairs_dev, valid_dev = store._device_arrays()
    n_pad = pairs_dev.shape[0]
    print(f"n={n} n_pad={n_pad} t={t} device={jax.devices()[0]}")

    masks = ph.block_masks(t)
    s = s_force or ph._pick_s(n, n_pad, 64 // t)
    print(f"s={s} (avg_run={n / (1 << (64 // t)):.0f})")
    if not s:
        return
    g = max(2, min(128, (1 << 29) // (2 * s * s)))
    while n_pad % (g * s):
        g //= 2
    r = g * s

    # --- stage timings (block 0 cold+warm, block 1 warm) -------------------
    for rep in range(2):
        b = rep  # block index: block1 has one dedup mask
        t0 = time.monotonic()
        prep = ph._prep_block(pairs_dev, valid_dev, jnp.uint32(masks[b][0]),
                              jnp.uint32(masks[b][1]), s=s)
        slo, shi, srow, svalid, os_start, os_end, n_os = prep
        n_os_i = int(n_os)
        t1 = time.monotonic()
        csort = jnp.zeros(n_pad + s, jnp.int32)
        for p0 in range(0, n_pad, r):
            csort = ph._band_chunk(csort, slo, shi, srow, svalid,
                                   jnp.int32(p0), mask_cur=masks[b],
                                   mask_prev=masks[:b], s=s, g=g, t=t)
        _ = int(np.asarray(csort[:8]).sum())
        t2 = time.monotonic()
        counts = jnp.zeros(n_pad + s, jnp.int32)
        counts = ph._unsort_add(counts, csort, srow)
        _ = int(np.asarray(counts[:8]).sum())
        t3 = time.monotonic()
        print(f"block{b} ({'cold' if rep == 0 else 'warm'}): "
              f"prep+sort {t1-t0:.2f}s  band {t2-t1:.2f}s  "
              f"scatter {t3-t2:.2f}s  n_os={n_os_i}")

    # --- full pigeonhole (warm) --------------------------------------------
    t0 = time.monotonic()
    pc = ph.self_counts(pairs_dev, valid_dev, t, n, s=s)
    t1 = time.monotonic()
    assert pc is not None
    print(f"pigeonhole self_counts: {t1-t0:.2f}s (cold incl. remaining "
          f"block compiles)")
    t0 = time.monotonic()
    pc = ph.self_counts(pairs_dev, valid_dev, t, n, s=s)
    t1 = time.monotonic()
    print(f"pigeonhole self_counts: {t1-t0:.2f}s warm")

    # --- classic (MXU when available) ----------------------------------------
    from cbird_tpu.ops import mxu_count as mc
    rows = 16384 if n_pad <= 1 << 20 else 32768
    cols = min(1 << 16 if n_pad <= 1 << 20 else 1 << 17, n_pad)
    use_mxu = (mc.mxu_enabled(n_pad) and t < 64
               and rows % mc.BQ == 0 and cols % mc.BC_MASKED == 0)
    for rep in range(2):
        t0 = time.monotonic()
        cc = store._classic_self_counts(pairs_dev, valid_dev, t, n_pad,
                                        rows, cols, use_mxu)
        t1 = time.monotonic()
        print(f"classic count phase (mxu={use_mxu}): {t1-t0:.2f}s "
              f"({'cold' if rep == 0 else 'warm'})")

    same = np.array_equal(pc[:n], cc)
    print(f"counts identical: {same}  "
          f"(pigeon nonzero {int((pc[:n] > 0).sum())}, "
          f"classic nonzero {int((cc > 0).sum())})")
    if not same:
        bad = np.nonzero(pc[:n] != cc)[0][:10]
        print("first mismatches:", [(int(i), int(pc[i]), int(cc[i]))
                                    for i in bad])


if __name__ == "__main__":
    main()
