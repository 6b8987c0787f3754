"""ARCHIVED MEASUREMENT (2026-08-18): targets the pre-packed-operand
mxu_count API (unpack_pm1/unpack_haystack_t), replaced by in-kernel
unpacking after experiments/mxu_epilogue_ab.py v4 measured it
performance-neutral.  Numbers recorded in docs/TODO.md; to re-run,
check out the commit that introduced this file.

Sweep 2: wider configs + bf16 operand variant + pool-drift control."""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from cbird_tpu.ops import mxu_count as mc
from cbird_tpu.ops.hamming import _count_tile, split_u64

Q = 16384
N = 1 << 21
T = 6


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best, out


# bf16 variant of the count kernel
def _count_kernel_bf16(t_ref, a_ref, b_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rhs = (64 - 2 * t_ref[0, 0]).astype(jnp.float32)
    hit = (dot > rhs).astype(jnp.int32)
    out_ref[:] += jnp.sum(hit, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bq", "bc"))
def mxu_count_bf16(a, bt, threshold, bq, bc):
    q, n = a.shape[0], bt.shape[1]
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    out = pl.pallas_call(
        _count_kernel_bf16,
        grid=(q // bq, n // bc),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, bc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
    )(t2d, a, bt)
    return out[:, 0]


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**64, size=N, dtype=np.uint64)
    valid = np.ones(N, dtype=bool)
    valid[rng.integers(0, N, N // 100)] = False
    needles64 = hashes[rng.integers(0, N, Q)]
    flip = rng.integers(0, 64, Q)
    needles64 = needles64 ^ (np.uint64(1) << flip.astype(np.uint64))

    pairs_dev = jnp.asarray(split_u64(hashes))
    valid_dev = jnp.asarray(valid)
    nb_dev = jnp.asarray(split_u64(needles64))
    t_dev = jnp.int32(T)

    def vpu():
        acc = jnp.zeros(Q, jnp.int32)
        for cb in range(0, N, 1 << 17):
            acc = _count_tile(acc, nb_dev, jnp.int32(cb), pairs_dev,
                              valid_dev, t_dev, cols=1 << 17)
        return acc

    t_vpu, ref = timed(vpu)
    print(f"VPU baseline (start): {t_vpu*1e3:8.1f} ms "
          f"{Q*N/t_vpu/1e9:7.1f} G pairs/s")

    bt = jax.block_until_ready(mc.unpack_haystack_t(pairs_dev, valid_dev))
    a = jax.block_until_ready(mc.unpack_pm1(nb_dev, penalty_col=False))
    a_bf = jax.block_until_ready(a.astype(jnp.bfloat16))
    bt_bf = jax.block_until_ready(bt.astype(jnp.bfloat16))

    configs = [(128, 4096), (256, 4096), (128, 8192), (256, 8192),
               (512, 8192), (256, 16384), (128, 16384)]
    for bq, bc in configs:
        try:
            np.asarray(mc.mxu_count_below(a, bt, t_dev, bq=bq, bc=bc))
            t_run, out = timed(lambda bq=bq, bc=bc: mc.mxu_count_below(
                a, bt, t_dev, bq=bq, bc=bc))
            ok = np.array_equal(out, np.asarray(ref))
            print(f"i8  bq={bq:5d} bc={bc:5d}: {t_run*1e3:8.1f} ms "
                  f"{Q*N/t_run/1e9:7.1f} G pairs/s  match={ok}")
        except Exception as e:
            print(f"i8  bq={bq:5d} bc={bc:5d}: FAILED "
                  f"{str(e).splitlines()[0][:120]}")
    for bq, bc in configs:
        try:
            np.asarray(mxu_count_bf16(a_bf, bt_bf, t_dev, bq=bq, bc=bc))
            t_run, out = timed(lambda bq=bq, bc=bc: mxu_count_bf16(
                a_bf, bt_bf, t_dev, bq=bq, bc=bc))
            ok = np.array_equal(out, np.asarray(ref))
            print(f"bf16 bq={bq:5d} bc={bc:5d}: {t_run*1e3:8.1f} ms "
                  f"{Q*N/t_run/1e9:7.1f} G pairs/s  match={ok}")
        except Exception as e:
            print(f"bf16 bq={bq:5d} bc={bc:5d}: FAILED "
                  f"{str(e).splitlines()[0][:120]}")

    # triangle re-check at the best configs
    a2 = jax.block_until_ready(
        mc.unpack_pm1(pairs_dev[:Q], penalty_col=False))
    for bq, bc in [(256, 4096), (256, 8192)]:
        np.asarray(mc.mxu_count_triangle(a2, bt, t_dev, jnp.int32(0),
                                         jnp.int32(0), bq=bq, bc=bc))
        t_run, _ = timed(lambda bq=bq, bc=bc: mc.mxu_count_triangle(
            a2, bt, t_dev, jnp.int32(0), jnp.int32(0), bq=bq, bc=bc))
        print(f"tri bq={bq:5d} bc={bc:5d}: {t_run*1e3:8.1f} ms "
              f"{Q*N/t_run/1e9:7.1f} G pairs/s")

    t_vpu2, _ = timed(vpu)
    print(f"VPU baseline (end):   {t_vpu2*1e3:8.1f} ms "
          f"{Q*N/t_vpu2/1e9:7.1f} G pairs/s")


if __name__ == "__main__":
    main()
