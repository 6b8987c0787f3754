"""Epilogue A/B for the MXU count kernel (ops/mxu_count.py): the ±1
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
    valid = jnp.ones(N, bool)
    a_all = jax.block_until_ready(mc.unpack_pm1(pairs, penalty_col=False))
    bt = jax.block_until_ready(mc.unpack_haystack_t(pairs, valid))
    a = a_all[:Q]
    t = jnp.int32(T)
    work = Q * N

    ref = None
    for name, v in [("v0 vpu-sum ", 0), ("v1 mm-ones ", 1),
                    ("v2 2stage  ", 2), ("v0 again   ", 0),
                    ("v1 again   ", 1)]:
        np.asarray(count(a, bt, t, v))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(count(a, bt, t, v))
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
