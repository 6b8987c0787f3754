"""MXU matmul formulation of the Hamming count-below-threshold phase.

Rebuilds the hot loop of the reference's N^2 search (dct hash scan,
/root/reference/src/dcthashindex.cpp:193-220 via src/hamm.h:24-26) as a
systolic-array matmul instead of a VPU popcount scan.

Identity: for hashes unpacked to +/-1 bit vectors a, b in {-1,+1}^64,
    dot(a, b) = 64 - 2 * hamming(a, b)
so   hamming < t  <=>  dot > 64 - 2t.

The count phase only needs #{columns with dot > rhs} per needle row — the
[Q, C] distance tile never has to leave VMEM.  That is the piece XLA cannot
express (a reduce consumer is not fused into a dot producer, so the plain
jnp.dot formulation materializes the [Q, C] product to HBM and goes
HBM-bound at ~100G pairs/s).  This Pallas kernel does dot -> compare ->
row-sum entirely in VMEM and writes only [Q] counts.

Speed-of-light: v5e MXU int8 is ~394 TMAC/s.  With K padded 64->128 (the
+/-1 payload is 64 wide; row 64 carries the validity penalty) the useful
rate is ~3.1T pairs/s vs ~0.44T pairs/s for the fused VPU
xor+popcount+compare+reduce tile (ops/hamming.py _count_tile), a ~7x
ceiling.  Measured A/B lives in experiments/mxu_count_ab.py.

Epilogue verdict (experiments/mxu_epilogue_ab.py, v5e): the VPU
compare + row-sum epilogue IS the right one — replacing the cross-lane
sum with a hits @ ones[bc, 1] MXU matmul measured 0.79x (the N=1 matmul
pads to the MXU width and costs as much as the main dot), and a two-stage
reshape reduce 0.40x.  Mosaic's native axis-1 reduction wins.

Validity: tombstoned rows (id 0) must never hit.  Column 64 of the packed
operand holds 0 for valid rows and -128 for invalid ones; the needle side
carries a constant +1 there, so invalid columns contribute dot <= 64-128 =
-64 < 64-2t for every threshold t <= 63 (thresholds are hamming distances,
< 64 by construction; the wrapper clamps).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD = 128  # MXU-native contraction width (64 bits + validity + zero pad)

# Tuned on v5e (experiments/mxu_count_ab.py, 2026-08): int8 operands are
# native (bf16 measured ~2.3x slower), small row blocks x wide col blocks
# win; 256x4096 ran within noise of 256x8192 with half the VMEM footprint.
BQ = 256
BC = 4096
BC_MASKED = 1024  # diagonal tiles add two [bq, bc] i32 iota temps in VMEM

# Tests flip this to run the kernels through the Pallas interpreter on the
# CPU backend; must be set before the first call (jit traces capture it).
_INTERPRET = False


def mxu_enabled(n_pad: int) -> bool:
    """Whether the MXU count path applies to a store of n_pad bucket rows.

    Requires a real TPU backend (Mosaic kernels don't run on the CPU
    backend outside interpret mode), bucket divisibility by the column
    block, and a memory cap: the unpacked operands cost 128 bytes/row each
    (vs 8 packed), so huge stores stay on the VPU scan.  CBIRD_MXU=off
    disables; CBIRD_MXU=force skips the backend check (interpret-mode
    tests); CBIRD_MXU_CAP overrides the row cap.
    """
    mode = os.environ.get("CBIRD_MXU", "on").lower()
    if mode in ("off", "0", "no"):
        return False
    if mode != "force" and jax.default_backend() != "tpu":
        return False
    if n_pad % BC:
        return False
    cap = int(os.environ.get("CBIRD_MXU_CAP", str(1 << 24)))
    return n_pad <= cap


@functools.partial(jax.jit, static_argnames=("penalty_col",))
def unpack_pm1(pairs: jnp.ndarray, valid: jnp.ndarray | None = None,
               penalty_col: bool = True) -> jnp.ndarray:
    """[N, 2] u32 hash pairs -> [N, 128] int8 +/-1 bit matrix.

    Column layout: 0..31 low-word bits, 32..63 high-word bits (bit k of the
    word at column offset k), encoded bit=0 -> +1, bit=1 -> -1; column 64 is
    the validity penalty (0 valid / -128 invalid) matched by a constant +1
    on the needle side; 65..127 zero (K padding to the MXU width).
    """
    n = pairs.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    lo = (pairs[:, 0:1] >> shifts[None, :]) & jnp.uint32(1)
    hi = (pairs[:, 1:2] >> shifts[None, :]) & jnp.uint32(1)
    bits = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)  # [N, 64]
    pm = (1 - 2 * bits).astype(jnp.int8)
    if penalty_col:
        if valid is None:
            pen = jnp.zeros((n, 1), jnp.int8)
        else:
            pen = jnp.where(valid, 0, -128).astype(jnp.int8)[:, None]
    else:  # needle side: constant +1 multiplies the haystack penalty
        pen = jnp.ones((n, 1), jnp.int8)
    pad = jnp.zeros((n, K_PAD - 65), jnp.int8)
    return jnp.concatenate([pm, pen, pad], axis=1)


@jax.jit
def unpack_haystack_t(pairs: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] u32 + [N] bool -> [128, N] int8 transposed +/-1 operand."""
    return unpack_pm1(pairs, valid, penalty_col=True).T


def _count_kernel(t_ref, a_ref, b_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    rhs = 64 - 2 * t_ref[0, 0]
    hit = (dot > rhs).astype(jnp.int32)
    out_ref[:] += jnp.sum(hit, axis=1, keepdims=True)


def _mask_kernel(t_ref, base_ref, a_ref, b_ref, out_ref, *, bq: int, bc: int):
    """Triangular variant: counts only columns with global col id > row id.

    base_ref holds (row_base, col_base) element offsets of the dispatched
    tile; block-local offsets come from program ids.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dot = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    rhs = 64 - 2 * t_ref[0, 0]
    row_ids = (base_ref[0, 0] + i * bq
               + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 0))
    col_ids = (base_ref[0, 1] + j * bc
               + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 1))
    hit = ((dot > rhs) & (col_ids > row_ids)).astype(jnp.int32)
    out_ref[:] += jnp.sum(hit, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bq", "bc"))
def mxu_count_below(a_pm1: jnp.ndarray, bt_pm1: jnp.ndarray,
                    threshold: jnp.ndarray,
                    bq: int = 512, bc: int = 2048) -> jnp.ndarray:
    """Per-needle count of haystack rows with hamming distance < threshold.

    @param a_pm1  [Q, 128] int8 needles (unpack_pm1(penalty_col=False))
    @param bt_pm1 [128, N] int8 transposed haystack (unpack_haystack_t)
    @param threshold scalar int (clamped to <= 63 by callers)
    @return [Q] int32 counts
    Q must divide by bq, N by bc (callers pad to store buckets).
    """
    q, n = a_pm1.shape[0], bt_pm1.shape[1]
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    out = pl.pallas_call(
        _count_kernel,
        grid=(q // bq, n // bc),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, K_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, bc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
        interpret=_INTERPRET,
    )(t2d, a_pm1, bt_pm1)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("bq", "bc"))
def mxu_count_triangle(a_pm1: jnp.ndarray, bt_pm1: jnp.ndarray,
                       threshold: jnp.ndarray, row_base: jnp.ndarray,
                       col_base: jnp.ndarray,
                       bq: int = 512, bc: int = 2048) -> jnp.ndarray:
    """Diagonal-tile variant of mxu_count_below: strict col > row mask in
    global coordinates (self-search upper triangle, excludes self-pairs)."""
    q, n = a_pm1.shape[0], bt_pm1.shape[1]
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    base2d = jnp.stack([jnp.int32(row_base), jnp.int32(col_base)])[None, :]
    out = pl.pallas_call(
        functools.partial(_mask_kernel, bq=bq, bc=bc),
        grid=(q // bq, n // bc),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, K_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, bc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
        interpret=_INTERPRET,
    )(t2d, base2d, a_pm1, bt_pm1)
    return out[:, 0]


def _self_rows_kernel(t_ref, base_ref, a_ref, b_ref, out_ref, *,
                      bq: int, bc: int):
    """One row block of the triangular self-search against the FULL store
    width: grid cell (i, j) covers global rows [base + i*bq, +bq) x cols
    [j*bc, +bc).  Cells entirely below the diagonal skip compute (their b
    blocks still prefetch — ~half a store sweep of DMA, noise next to the
    MXU work); cells straddling it apply the strict col > row mask; cells
    above run the plain count.  Collapses the host tile loop to ONE
    dispatch per row block (the VPU path's 1-2 ms/dispatch host cost was
    ~15% of the 10M count phase).

    KEPT AS A MEASURED NEGATIVE (experiments/mxu_selfrows_ab.py, real
    v5e, same process): 2M 4.59 s vs 4.15 s, 10M 96.6 s vs 65.4 s for the
    mxu_self_tile host loop — traversing (and prefetching) the skipped
    below-diagonal half of the grid costs more than the host dispatches
    it saves; production search_self uses mxu_self_tile."""
    i = pl.program_id(0)  # row sub-block; j (cols) is the inner/fast dim
    j = pl.program_id(1)  # so the out block (i) is revisited across j

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row0 = base_ref[0, 0] + i * bq
    col0 = j * bc
    rhs = 64 - 2 * t_ref[0, 0]
    some_above = col0 + bc > row0 + 1   # some (r, c) with c > r exists
    straddles = col0 < row0 + bq        # some (r, c) with c <= r exists

    def _dot_hits():
        dot = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (dot > rhs).astype(jnp.int32)

    # two predicated bodies (NOT lax.cond — cond lowers to computing both
    # sides, which would pay the iota mask on every cell): the common
    # fully-above-diagonal cell runs the 2-op epilogue, only the one or
    # two diagonal-straddling cells per row pay the mask
    @pl.when(some_above & jnp.logical_not(straddles))
    def _():
        out_ref[:] += jnp.sum(_dot_hits(), axis=1, keepdims=True)

    @pl.when(some_above & straddles)
    def _():
        row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 0)
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 1)
        hit = jnp.where(col_ids > row_ids, _dot_hits(), 0)
        out_ref[:] += jnp.sum(hit, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("rows", "bq", "bc"))
def mxu_self_rows(a_all: jnp.ndarray, bt_all: jnp.ndarray,
                  valid: jnp.ndarray, threshold: jnp.ndarray,
                  row_base: jnp.ndarray, rows: int,
                  bq: int = BQ, bc: int = BC) -> jnp.ndarray:
    """Triangular self-search counts for rows [row_base, row_base + rows)
    against the whole store in one dispatch (see _self_rows_kernel).

    a_all [N, 128] i8, bt_all [128, N] i8, valid [N] bool; row_base must be
    a bq multiple (callers use power-of-two row blocks).
    @return [rows] int32 — #{c > r : dist(r, c) < threshold}, 0 for
            tombstoned rows."""
    n = bt_all.shape[1]
    a = jax.lax.dynamic_slice(a_all, (row_base, 0), (rows, K_PAD))
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    base2d = jnp.full((1, 1), row_base, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_self_rows_kernel, bq=bq, bc=bc),
        grid=(rows // bq, n // bc),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, K_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, bc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.int32),
        interpret=_INTERPRET,
    )(t2d, base2d, a, bt_all)
    rv = jax.lax.dynamic_slice(valid, (row_base,), (rows,))
    return out[:, 0] * rv.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "masked"))
def mxu_self_tile(acc: jnp.ndarray, row_base: jnp.ndarray,
                  col_base: jnp.ndarray, a_all: jnp.ndarray,
                  bt_all: jnp.ndarray, valid: jnp.ndarray,
                  threshold: jnp.ndarray, rows: int, cols: int,
                  masked: bool) -> jnp.ndarray:
    """MXU drop-in for ops.hamming._self_count_tile: one [rows x cols] tile
    of the triangular self-search count phase (needles are store rows).

    a_all [N, 128] i8 unpacked store rows (needle side), bt_all [128, N] i8
    transposed haystack, valid [N] bool (tombstone mask — the VPU tile
    masks needle rows with it; here invalid rows' counts are zeroed, which
    is equivalent for the gate).  The dynamic slices cost ~2 HBM copies of
    the tile operands (~10 MB) — noise next to the tile's MXU work.
    """
    a = jax.lax.dynamic_slice(a_all, (row_base, 0), (rows, K_PAD))
    bt = jax.lax.dynamic_slice(bt_all, (0, col_base), (K_PAD, cols))
    if masked:
        counts = mxu_count_triangle(a, bt, threshold, row_base, col_base,
                                    bq=BQ, bc=BC_MASKED)
    else:
        counts = mxu_count_below(a, bt, threshold, bq=BQ, bc=BC)
    rv = jax.lax.dynamic_slice(valid, (row_base,), (rows,))
    return acc + counts * rv.astype(jnp.int32)
