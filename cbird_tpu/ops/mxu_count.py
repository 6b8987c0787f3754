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

Both operands arrive PACKED ([_, 2] uint32 hash pairs, the store's native
layout) and are unpacked to +/-1 int8 inside the kernel: the haystack
column block into a VMEM scratch buffer once per column step (the grid is
column-outer, so the unpack amortizes over all row sub-blocks — measured
performance-neutral vs pre-unpacked HBM operands, which cost 128 B/row of
HBM and capped usable store size; experiments/mxu_epilogue_ab.py v4), the
needle block in registers per cell (~0.26 VPU ops/pair).

Speed-of-light: v5e MXU int8 is ~394 TMAC/s; with K padded 64->128 the
matmul could do ~3.1T pairs/s.  Measured is 590-840G pairs/s by pool —
the bound is the VPU epilogue (compare + row-sum ~3 ops/pair), NOT the
matmul and NOT HBM: a hits @ ones MXU reduce measured 0.79x (N=1 pads to
MXU width), a two-stage reshape reduce 0.40x, and cutting haystack
re-fetch DMA ~64x with this column-outer grid changed nothing
(experiments/mxu_epilogue_ab.py).  Still 1.4-2x the fused VPU
xor+popcount scan (ops/hamming.py) in same-window A/Bs, and bit-identical.
A one-dispatch-per-row-block triangular kernel (skipping below-diagonal
cells with pl.when) measured SLOWER than the host tile loop — traversing
the dead half of the grid costs more than the host dispatches it saves
(experiments/mxu_selfrows_ab.py: 10M 96.6 s vs 65.4 s).

Validity: tombstoned rows (id 0) must never hit.  Lane 64 of the unpacked
haystack operand holds 0 for valid rows and -128 for invalid ones; the
needle side carries a constant +1 there, so invalid columns contribute
dot <= 64-128 = -64 < 64-2t for every threshold t <= 63 (thresholds are
hamming distances, < 64 by construction; callers gate on threshold < 64).
Validity arrives as int32 0/1 (bitwidth changes on narrow blocks hit
Mosaic's minor-tiling limit; callers cache the int32 view).
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
    backend outside interpret mode) and bucket divisibility by the column
    block.  CBIRD_MXU=off disables; CBIRD_MXU=force skips the backend
    check (interpret-mode tests)."""
    mode = os.environ.get("CBIRD_MXU", "on").lower()
    if mode in ("off", "0", "no"):
        return False
    if mode != "force" and jax.default_backend() != "tpu":
        return False
    return n_pad % BC == 0 and n_pad > 0


def _unpack_needles(n_ref, bq: int):
    """[bq, 2] u32 block -> [bq, 128] int8 +/-1 needle operand (in
    registers).  Lanes 0..31 low-word bits, 32..63 high-word bits
    (bit k of the word at lane offset k), bit=0 -> +1, bit=1 -> -1;
    lane 64 is the constant +1 matching the haystack validity penalty;
    65..127 zero.  All math in 32-bit lanes with one 2D downcast."""
    k = jax.lax.broadcasted_iota(jnp.uint32, (bq, K_PAD), 1)
    word = jnp.where(k < 32, n_ref[:, 0:1], n_ref[:, 1:2])
    sh = jnp.where(k < 32, k, k - 32) & jnp.uint32(31)
    bit = ((word >> sh) & jnp.uint32(1)).astype(jnp.int32)
    pm32 = jnp.where(k < 64, 1 - 2 * bit, jnp.where(k == 64, 1, 0))
    return pm32.astype(jnp.int8)


def _unpack_haystack(b_ref, v_ref, bc: int):
    """[bc, 2] u32 + [bc] int32 validity -> [128, bc] int8 transposed +/-1
    haystack operand (lane 64 = 0 valid / -128 invalid)."""
    k = jax.lax.broadcasted_iota(jnp.uint32, (K_PAD, bc), 0)
    word = jnp.where(k < 32, b_ref[:, 0][None, :], b_ref[:, 1][None, :])
    sh = jnp.where(k < 32, k, k - 32) & jnp.uint32(31)
    bit = ((word >> sh) & jnp.uint32(1)).astype(jnp.int32)
    v32 = v_ref[:][None, :]
    pm32 = jnp.where(k < 64, 1 - 2 * bit,
                     jnp.where(k == 64, -128 * (1 - v32), 0))
    return pm32.astype(jnp.int8)


def _dot_hits(a, bt_scr, rhs):
    dot = jax.lax.dot_general(
        a, bt_scr[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (dot > rhs).astype(jnp.int32)


def _count_kernel(t_ref, n_ref, b_ref, v_ref, out_ref, bt_scr, *,
                  bq: int, bc: int):
    j = pl.program_id(0)  # column block: OUTER — the scratch unpack and
    i = pl.program_id(1)  # the b DMA amortize over the inner row steps

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        bt_scr[:] = _unpack_haystack(b_ref, v_ref, bc)

    a = _unpack_needles(n_ref, bq)
    hit = _dot_hits(a, bt_scr, 64 - 2 * t_ref[0, 0])
    out_ref[pl.ds(i * bq, bq)] += jnp.sum(hit, axis=1, keepdims=True)


def _mask_kernel(t_ref, base_ref, n_ref, b_ref, v_ref, out_ref, bt_scr, *,
                 bq: int, bc: int):
    """Triangular variant: counts only columns with global col id > row id
    (self-search upper triangle, excludes self-pairs).  base_ref holds
    (row_base, col_base) element offsets of the dispatched tile."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        bt_scr[:] = _unpack_haystack(b_ref, v_ref, bc)

    a = _unpack_needles(n_ref, bq)
    hit = _dot_hits(a, bt_scr, 64 - 2 * t_ref[0, 0])
    row_ids = (base_ref[0, 0] + i * bq
               + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 0))
    col_ids = (base_ref[0, 1] + j * bc
               + jax.lax.broadcasted_iota(jnp.int32, (bq, bc), 1))
    hit = jnp.where(col_ids > row_ids, hit, 0)
    out_ref[pl.ds(i * bq, bq)] += jnp.sum(hit, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bq", "bc"))
def mxu_count_below(needles: jnp.ndarray, pairs: jnp.ndarray,
                    valid_i32: jnp.ndarray, threshold: jnp.ndarray,
                    bq: int = BQ, bc: int = BC) -> jnp.ndarray:
    """Per-needle count of haystack rows with hamming distance < threshold.

    @param needles   [Q, 2] u32 packed needle hashes
    @param pairs     [N, 2] u32 packed haystack
    @param valid_i32 [N] int32 0/1 tombstone mask
    @param threshold scalar int (callers gate threshold < 64)
    @return [Q] int32 counts
    Q must divide by bq, N by bc (callers pad to store buckets).
    """
    q, n = needles.shape[0], pairs.shape[0]
    # a non-divisible operand would silently truncate the grid (q//bq,
    # n//bc) and drop the tail rows/columns from the counts
    assert q % bq == 0 and n % bc == 0, (q, bq, n, bc)
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_count_kernel, bq=bq, bc=bc),
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
        scratch_shapes=[pltpu.VMEM((K_PAD, bc), jnp.int8)],
        interpret=_INTERPRET,
    )(t2d, needles, pairs, valid_i32)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("bq", "bc"))
def mxu_count_triangle(needles: jnp.ndarray, pairs: jnp.ndarray,
                       valid_i32: jnp.ndarray, threshold: jnp.ndarray,
                       row_base: jnp.ndarray, col_base: jnp.ndarray,
                       bq: int = BQ, bc: int = BC_MASKED) -> jnp.ndarray:
    """Diagonal-tile variant of mxu_count_below: strict col > row mask in
    global coordinates.  needles are the store rows at [row_base, +Q);
    pairs/valid are the store columns at [col_base, +N)."""
    q, n = needles.shape[0], pairs.shape[0]
    assert q % bq == 0 and n % bc == 0, (q, bq, n, bc)  # see mxu_count_below
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    base2d = jnp.stack([jnp.int32(row_base), jnp.int32(col_base)])[None, :]
    out = pl.pallas_call(
        functools.partial(_mask_kernel, bq=bq, bc=bc),
        grid=(n // bc, q // bq),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda j, i: (0, 0),
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
        scratch_shapes=[pltpu.VMEM((K_PAD, bc), jnp.int8)],
        interpret=_INTERPRET,
    )(t2d, base2d, needles, pairs, valid_i32)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("rows", "cols", "masked"))
def mxu_self_tile(acc: jnp.ndarray, row_base: jnp.ndarray,
                  col_base: jnp.ndarray, pairs: jnp.ndarray,
                  valid_i32: jnp.ndarray, threshold: jnp.ndarray,
                  rows: int, cols: int, masked: bool) -> jnp.ndarray:
    """MXU drop-in for ops.hamming._self_count_tile: one [rows x cols] tile
    of the triangular self-search count phase (needles are store rows).

    pairs [N, 2] u32 packed store, valid_i32 [N] int32 tombstone mask (the
    VPU tile masks needle rows with it; here invalid rows' counts are
    zeroed, which is equivalent for the gate).  The dynamic slices cost
    two packed copies of the tile operands (8 B/row) — noise."""
    nd = jax.lax.dynamic_slice(pairs, (row_base, 0), (rows, 2))
    hs = jax.lax.dynamic_slice(pairs, (col_base, 0), (cols, 2))
    vs = jax.lax.dynamic_slice(valid_i32, (col_base,), (cols,))
    if masked:
        counts = mxu_count_triangle(nd, hs, vs, threshold, row_base,
                                    col_base, bq=BQ, bc=BC_MASKED)
    else:
        # callers gate on cols % BC_MASKED == 0 only; fall back to the
        # narrow column block when the wide one doesn't divide (a bc that
        # doesn't divide cols would silently truncate the kernel grid)
        counts = mxu_count_below(nd, hs, vs, threshold, bq=BQ,
                                 bc=BC if cols % BC == 0 else BC_MASKED)
    rv = jax.lax.dynamic_slice(valid_i32, (row_base,), (rows,))
    return acc + counts * rv


def count_below_padded(needles, pairs: jnp.ndarray, valid_i32: jnp.ndarray,
                       threshold) -> jnp.ndarray:
    """mxu_count_below with the needle batch padded up to a BQ multiple and
    the result sliced back to the true batch — the call pattern every host
    dispatcher shares (hamming._count_call, video_search.flat_hit_counts).
    ``needles`` may be a host numpy array; pairs/valid stay resident."""
    q = needles.shape[0]
    pad = -q % BQ
    nd = jnp.asarray(needles)
    if pad:
        nd = jnp.pad(nd, ((0, pad), (0, 0)))
    return mxu_count_below(nd, pairs, valid_i32, jnp.int32(threshold),
                           bq=BQ, bc=BC)[:q]
