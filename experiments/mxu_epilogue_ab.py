"""ARCHIVED MEASUREMENT (2026-08-18): targets the pre-packed-operand
mxu_count API (unpack_pm1/unpack_haystack_t), replaced by in-kernel
unpacking after experiments/mxu_epilogue_ab.py v4 measured it
performance-neutral.  Numbers recorded in docs/TODO.md; to re-run,
check out the commit that introduced this file.

Epilogue A/B for the MXU count kernel (ops/mxu_count.py): the ±1
matmul hits ~840G pairs/s — is the bound the VPU epilogue (compare +
cross-lane row-sum of the [bq, bc] i32 dot tile) or the MXU itself?

Variants (same grid/blocking as production, real TPU, same process):
  v0  production: hit = (dot > rhs).i32; out += hit.sum(axis=1)
  v1  matmul-reduce: hit.i8 @ ones[bc, 1] on the MXU (no cross-lane VPU
      reduce; N=1 pads to the MXU width, so the reduce matmul costs as
      many MACs as the main matmul — testing whether Mosaic's N=1 path
      is cheaper than the VPU reduce in practice)
  v2  two-stage reduce: reshape [bq, G, 128] then sum twice (cross-lane
      reduce only on the last 128-wide stage)
  v3  column-outer grid: grid (n/bc, q/bq) with the FULL [q, 1] count
      vector resident in VMEM and accumulated via dynamic stores — each
      b block is fetched ONCE per dispatch instead of once per row
      sub-block (q/bq fetches), cutting haystack DMA ~q/bq x.  Tests
      whether v0 is HBM-bound on b re-fetches (~0.5 B/pair).
"""

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

N = 1 << 21
Q = 16384
T = 5
BQ, BC = mc.BQ, mc.BC


def make_kernel(variant):
    def kernel(t_ref, a_ref, b_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dot = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rhs = 64 - 2 * t_ref[0, 0]
        if variant == 0:
            hit = (dot > rhs).astype(jnp.int32)
            out_ref[:] += jnp.sum(hit, axis=1, keepdims=True)
        elif variant == 1:
            hit = (dot > rhs).astype(jnp.int8)
            ones = jnp.ones((hit.shape[1], 1), jnp.int8)
            out_ref[:] += jax.lax.dot_general(
                hit, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            hit = (dot > rhs).astype(jnp.int32)
            g = hit.reshape(hit.shape[0], -1, 128)
            out_ref[:] += jnp.sum(jnp.sum(g, axis=1), axis=1,
                                  keepdims=True)
    return kernel


def _jouter_kernel(t_ref, a_ref, b_ref, out_ref, *, bq):
    j = pl.program_id(0)  # column block: OUTER (b_ref fetched once per j)
    i = pl.program_id(1)  # row sub-block: inner (a_ref is 32 KB)

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    rhs = 64 - 2 * t_ref[0, 0]
    hit = (dot > rhs).astype(jnp.int32)
    inc = jnp.sum(hit, axis=1, keepdims=True)
    sl = pl.ds(i * bq, bq)
    out_ref[sl] += inc


@jax.jit
def count_jouter(a, bt, t):
    q, n = a.shape[0], bt.shape[1]
    t2d = jnp.full((1, 1), t, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_jouter_kernel, bq=BQ),
        grid=(n // BC, q // BQ),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, mc.K_PAD), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc.K_PAD, BC), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, 1), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
    )(t2d, a, bt)
    return out[:, 0]


def _packed_kernel(t_ref, a_ref, b_ref, v_ref, out_ref, bt_scr, *, bq, bc):
    """v4: b arrives PACKED ([bc, 2] u32 + [bc] validity as i8); unpack to
    the ±1 [128, bc] i8 operand in VMEM scratch once per column block
    (i == 0), amortized over all row sub-blocks.  No unpacked operand in
    HBM at all — removes the 128 B/row cost and the store-size cap."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        # all math in 32-bit lanes; ONE [128, bc] downcast at the end
        # (small-shape bitwidth changes hit Mosaic's minor-tiling limit)
        k = jax.lax.broadcasted_iota(jnp.uint32, (mc.K_PAD, bc), 0)
        word = jnp.where(k < 32, b_ref[:, 0][None, :], b_ref[:, 1][None, :])
        sh = jnp.where(k < 32, k, k - 32) & jnp.uint32(31)
        bit = ((word >> sh) & jnp.uint32(1)).astype(jnp.int32)
        v32 = v_ref[:][None, :]  # [1, bc] int32 0/1
        # rows 0..63 = ±1 bits; row 64 = validity penalty 0/-128; rest 0
        pm32 = jnp.where(k < 64, 1 - 2 * bit,
                         jnp.where(k == 64, -128 * (1 - v32), 0))
        bt_scr[:] = pm32.astype(jnp.int8)

    dot = jax.lax.dot_general(
        a_ref[:], bt_scr[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    rhs = 64 - 2 * t_ref[0, 0]
    hit = (dot > rhs).astype(jnp.int32)
    inc = jnp.sum(hit, axis=1, keepdims=True)
    sl = pl.ds(i * bq, bq)
    out_ref[sl] += inc


@jax.jit
def count_packed(a, pairs, valid, t):
    q, n = a.shape[0], pairs.shape[0]
    t2d = jnp.full((1, 1), t, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, bq=BQ, bc=BC),
        grid=(n // BC, q // BQ),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, mc.K_PAD), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, 2), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC,), lambda j, i: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, 1), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((mc.K_PAD, BC), jnp.int8)],
    )(t2d, a, pairs, valid.astype(jnp.int32))
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("variant",))
def count(a, bt, t, variant):
    q, n = a.shape[0], bt.shape[1]
    t2d = jnp.full((1, 1), t, jnp.int32)
    out = pl.pallas_call(
        make_kernel(variant),
        grid=(q // BQ, n // BC),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, mc.K_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc.K_PAD, BC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
    )(t2d, a, bt)
    return out[:, 0]


def main():
    rng = np.random.default_rng(11)
    hashes = rng.integers(1, 2**63, size=N, dtype=np.uint64)
    idx = rng.integers(0, N - 1, N // 500)
    flip = rng.integers(0, 64, len(idx))
    hashes[idx + 1] = hashes[idx] ^ (np.uint64(1) << flip.astype(np.uint64))
    pairs = jnp.asarray(hashes.view(np.uint32).reshape(-1, 2))
    valid = jnp.asarray(rng.random(N) > 0.03)  # exercises the penalty row
    a_all = jax.block_until_ready(mc.unpack_pm1(pairs, penalty_col=False))
    bt = jax.block_until_ready(mc.unpack_haystack_t(pairs, valid))
    a = a_all[:Q]
    t = jnp.int32(T)
    work = Q * N

    ref = None
    variants = [("v0 vpu-sum ", lambda: count(a, bt, t, 0)),
                ("v4 packed  ", lambda: count_packed(a, pairs, valid, t)),
                ("v3 j-outer ", lambda: count_jouter(a, bt, t)),
                ("v0 again   ", lambda: count(a, bt, t, 0)),
                ("v4 again   ", lambda: count_packed(a, pairs, valid, t))]
    if "--full" in sys.argv:
        variants[1:1] = [("v1 mm-ones ", lambda: count(a, bt, t, 1)),
                         ("v2 2stage  ", lambda: count(a, bt, t, 2))]
    for name, fn in variants:
        np.asarray(fn())  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        if ref is None:
            ref = out
            note = ""
        else:
            note = f" match={np.array_equal(out, ref)}"
        print(f"{name}: {best * 1000:8.2f} ms  {work / best / 1e9:7.1f} "
              f"G pairs/s{note}", flush=True)


if __name__ == "__main__":
    main()
