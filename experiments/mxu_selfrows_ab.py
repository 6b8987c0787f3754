"""ARCHIVED MEASUREMENT (2026-08-18): targets the pre-packed-operand
mxu_count API (unpack_pm1/unpack_haystack_t), replaced by in-kernel
unpacking after experiments/mxu_epilogue_ab.py v4 measured it
performance-neutral.  Numbers recorded in docs/TODO.md; to re-run,
check out the commit that introduced this file.

Three-way count-phase A/B at the raw kernel level, same process:
  1. VPU _self_count_tile host tile loop (production fallback)
  2. MXU mxu_self_tile host tile loop (one pallas dispatch per [rows,cols])
  3. MXU mxu_self_rows (one pallas dispatch per row block, full width)
Counts-phase only (no topk), N = 2^21 and optionally 10M via argv[1].
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cbird_tpu.ops import mxu_count as mc
from cbird_tpu.ops.hamming import _self_count_tile, split_u64, _bucket

N = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 21) - 37
T = 5


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        out = [np.asarray(x) for x in out]
        best = min(best, time.perf_counter() - t0)
    return best, np.concatenate(out)


def main():
    rng = np.random.default_rng(11)
    hashes = rng.integers(1, 2**63, size=N, dtype=np.uint64)
    idx = rng.integers(0, N - 1, N // 500)
    flip = rng.integers(0, 64, len(idx))
    hashes[idx + 1] = hashes[idx] ^ (np.uint64(1) << flip.astype(np.uint64))

    n_pad = _bucket(N)
    pairs = np.zeros((n_pad, 2), np.uint32)
    pairs[:N] = split_u64(hashes)
    valid = np.zeros(n_pad, bool)
    valid[:N] = True
    pairs_dev = jnp.asarray(pairs)
    valid_dev = jnp.asarray(valid)
    t_dev = jnp.int32(T)
    rows = 16384 if n_pad <= 1 << 20 else 32768
    cols = 1 << 16 if n_pad <= 1 << 20 else 1 << 17
    work = n_pad * n_pad / 2

    a_all = jax.block_until_ready(mc.unpack_pm1(pairs_dev, penalty_col=False))
    bt_all = jax.block_until_ready(mc.unpack_haystack_t(pairs_dev, valid_dev))

    def vpu():
        parts = []
        for rb in range(0, n_pad, rows):
            acc = jnp.zeros(rows, jnp.int32)
            for cb in range(0, n_pad, cols):
                if cb + cols <= rb:
                    continue
                acc = _self_count_tile(acc, jnp.int32(rb), jnp.int32(cb),
                                       pairs_dev, valid_dev, t_dev,
                                       rows=rows, cols=cols,
                                       masked=cb < rb + rows)
            parts.append(acc)
        return parts

    def mxu_tiles():
        parts = []
        for rb in range(0, n_pad, rows):
            acc = jnp.zeros(rows, jnp.int32)
            for cb in range(0, n_pad, cols):
                if cb + cols <= rb:
                    continue
                acc = mc.mxu_self_tile(acc, jnp.int32(rb), jnp.int32(cb),
                                       a_all, bt_all, valid_dev, t_dev,
                                       rows=rows, cols=cols,
                                       masked=cb < rb + rows)
            parts.append(acc)
        return parts

    def mxu_rows():
        return [mc.mxu_self_rows(a_all, bt_all, valid_dev, t_dev,
                                 jnp.int32(rb), rows=rows)
                for rb in range(0, n_pad, rows)]

    ref = None
    for name, fn in [("VPU tiles", vpu), ("MXU tiles", mxu_tiles),
                     ("MXU rows ", mxu_rows), ("VPU tiles2", vpu),
                     ("MXU rows2", mxu_rows)]:
        t, out = timed(fn)
        if ref is None:
            ref = out
            note = ""
        else:
            # VPU masks row validity inside; MXU zeroes counts — same here
            note = f" match={np.array_equal(out, ref)}"
        print(f"{name}: {t:8.2f} s  {work/t/1e9:7.1f} G pairs/s{note}",
              flush=True)


if __name__ == "__main__":
    main()
