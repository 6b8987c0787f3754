"""ARCHIVED MEASUREMENT (2026-08-18): targets the pre-packed-operand
mxu_count API (unpack_pm1/unpack_haystack_t), replaced by in-kernel
unpacking after experiments/mxu_epilogue_ab.py v4 measured it
performance-neutral.  Numbers recorded in docs/TODO.md; to re-run,
check out the commit that introduced this file.

A/B: MXU matmul count kernel vs the production VPU fused count tile.

Run on the real TPU (axon default platform):
    timeout 1800 python experiments/mxu_count_ab.py

Protocol (CLAUDE.md): same-process A/B, np.asarray readback for timing,
fixed shapes, every config run twice (pool speed varies).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from cbird_tpu.ops import mxu_count as mc
from cbird_tpu.ops.hamming import _count_tile, split_u64

Q = 16384
N = 1 << 21
T = 6


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**64, size=N, dtype=np.uint64)
    valid = np.ones(N, dtype=bool)
    valid[rng.integers(0, N, N // 100)] = False
    needles64 = hashes[rng.integers(0, N, Q)]
    # plant near-duplicates so some counts are non-zero
    flip = rng.integers(0, 64, Q)
    needles64 = needles64 ^ (np.uint64(1) << flip.astype(np.uint64))

    pairs = split_u64(hashes)
    npairs = split_u64(needles64)

    pairs_dev = jnp.asarray(pairs)
    valid_dev = jnp.asarray(valid)
    nb_dev = jnp.asarray(npairs)
    t_dev = jnp.int32(T)

    # --- VPU baseline: production host-tiled loop ---
    def vpu():
        acc = jnp.zeros(Q, jnp.int32)
        for cb in range(0, N, 1 << 17):
            acc = _count_tile(acc, nb_dev, jnp.int32(cb), pairs_dev,
                              valid_dev, t_dev, cols=1 << 17)
        return acc

    t_vpu, ref = timed(vpu)
    rate = Q * N / t_vpu / 1e9
    print(f"VPU _count_tile loop: {t_vpu*1e3:8.1f} ms  {rate:7.1f} G pairs/s")

    # --- unpack cost (one-time per search) ---
    t0 = time.perf_counter()
    bt = jax.block_until_ready(mc.unpack_haystack_t(pairs_dev, valid_dev))
    _ = np.asarray(bt[0, :4])
    print(f"unpack_haystack_t ({N} rows): {time.perf_counter()-t0:6.2f} s "
          f"(incl compile)")
    t0 = time.perf_counter()
    bt = jax.block_until_ready(mc.unpack_haystack_t(pairs_dev, valid_dev))
    _ = np.asarray(bt[0, :4])
    print(f"unpack_haystack_t warm: {(time.perf_counter()-t0)*1e3:6.1f} ms")
    a = jax.block_until_ready(mc.unpack_pm1(nb_dev, penalty_col=False))

    # --- MXU kernel sweep ---
    for bq, bc in [(256, 1024), (512, 1024), (512, 2048), (1024, 2048),
                   (512, 4096), (256, 4096)]:
        try:
            t0 = time.perf_counter()
            out = np.asarray(mc.mxu_count_below(a, bt, t_dev, bq=bq, bc=bc))
            t_compile = time.perf_counter() - t0
            ok = np.array_equal(out, np.asarray(ref))
            t_run, out = timed(
                lambda bq=bq, bc=bc: mc.mxu_count_below(a, bt, t_dev,
                                                        bq=bq, bc=bc))
            rate = Q * N / t_run / 1e9
            print(f"MXU bq={bq:5d} bc={bc:5d}: {t_run*1e3:8.1f} ms "
                  f"{rate:7.1f} G pairs/s  match={ok} "
                  f"(first call {t_compile:.1f} s)")
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"MXU bq={bq:5d} bc={bc:5d}: FAILED {type(e).__name__}: "
                  f"{msg}")

    # --- triangle variant at the best plain config ---
    try:
        a2 = jax.block_until_ready(
            mc.unpack_pm1(pairs_dev[:Q], penalty_col=False))
        t0 = time.perf_counter()
        np.asarray(mc.mxu_count_triangle(a2, bt, t_dev, jnp.int32(0),
                                         jnp.int32(0), bq=512, bc=2048))
        print(f"triangle first call {time.perf_counter()-t0:.1f} s")
        t_run, _ = timed(lambda: mc.mxu_count_triangle(
            a2, bt, t_dev, jnp.int32(0), jnp.int32(0), bq=512, bc=2048))
        rate = Q * N / t_run / 1e9
        print(f"MXU triangle 512x2048: {t_run*1e3:8.1f} ms "
              f"{rate:7.1f} G pairs/s")
    except Exception as e:
        print(f"triangle FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
