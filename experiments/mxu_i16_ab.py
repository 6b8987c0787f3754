"""int16 dot-output variant of the packed MXU count kernel: the epilogue
(compare + row-sum of the [bq, bc] dot tile) is the kernel's bound; an
i16 tile is half the VPU lanes per op.  Dot range with the validity
penalty is [-192, 64] — fits i16.  A/B vs the production i32 kernel
(ops/mxu_count.mxu_count_below), real TPU, same process.

RESOLVED NEGATIVE (2026-08-18): Mosaic rejects the kernel outright —
'tpu.matmul op Expected matmul acc to be 32-bit'.  The MXU accumulator
is architecturally 32-bit; a narrower dot output tile does not exist,
and converting i32→i16 after the dot adds an op per element instead of
removing one.  The i32 epilogue stands as the floor."""

import functools
import sys
import time

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


def _i16_kernel(t_ref, n_ref, b_ref, v_ref, out_ref, bt_scr, *, bq, bc):
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        bt_scr[:] = mc._unpack_haystack(b_ref, v_ref, bc)

    a = mc._unpack_needles(n_ref, bq)
    dot = jax.lax.dot_general(
        a, bt_scr[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int16)
    rhs = (64 - 2 * t_ref[0, 0]).astype(jnp.int16)
    hit = (dot > rhs)
    out_ref[pl.ds(i * bq, bq)] += jnp.sum(hit, axis=1, keepdims=True,
                                          dtype=jnp.int32)


@jax.jit
def count_i16(needles, pairs, v32, t):
    q, n = needles.shape[0], pairs.shape[0]
    bq, bc = mc.BQ, mc.BC
    t2d = jnp.full((1, 1), t, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_i16_kernel, bq=bq, bc=bc),
        grid=(n // bc, q // bq),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, 2), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 2), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc,), lambda j, i: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, 1), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((mc.K_PAD, bc), jnp.int8)],
    )(t2d, needles, pairs, v32)
    return out[:, 0]


def main():
    rng = np.random.default_rng(11)
    hashes = rng.integers(1, 2**63, size=N, dtype=np.uint64)
    idx = rng.integers(0, N - 1, N // 500)
    flip = rng.integers(0, 64, len(idx))
    hashes[idx + 1] = hashes[idx] ^ (np.uint64(1) << flip.astype(np.uint64))
    pairs = jnp.asarray(hashes.view(np.uint32).reshape(-1, 2))
    v32 = jnp.asarray((rng.random(N) > 0.03).astype(np.int32))
    nd = pairs[:Q]
    t = jnp.int32(T)
    work = Q * N

    ref = None
    for name, fn in [("i32 prod", lambda: mc.mxu_count_below(
                          nd, pairs, v32, t, bq=mc.BQ, bc=mc.BC)),
                     ("i16 dot ", lambda: count_i16(nd, pairs, v32, t)),
                     ("i32 agn ", lambda: mc.mxu_count_below(
                          nd, pairs, v32, t, bq=mc.BQ, bc=mc.BC)),
                     ("i16 agn ", lambda: count_i16(nd, pairs, v32, t))]:
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
