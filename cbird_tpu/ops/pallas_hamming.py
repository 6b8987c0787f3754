"""Fused Hamming top-k scan as a Pallas TPU kernel.

The XLA path (ops/hamming.py) materializes a [Q, chunk] distance matrix in
HBM for approx_min_k to sort — several extra GB of traffic per N² batch.
This kernel keeps everything in VMEM: the grid walks (needle tile, haystack
chunk); each step computes XOR+popcount distances for a [TQ, TN] tile on
the VPU and folds them into a running [TQ, K] top-k that lives in the
output block (revisited across the chunk axis, standard accumulation
pattern), using K iterative min-extractions — K passes over VMEM, zero HBM
round-trips for intermediates.

HBM traffic = haystack read once + [Q, K] result: the scan runs at memory
speed-of-light regardless of K (for small K).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(0x7FFF0000)  # distance<<16 | idx packing headroom


def _kernel(n_ref, h_ref, v_ref, d_ref, i_ref, *, tq: int, tn: int, k: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d_ref[:] = jnp.full((tq, k), BIG, jnp.int32)
        i_ref[:] = jnp.full((tq, k), -1, jnp.int32)

    n_lo = n_ref[:, 0:1]  # [TQ,1]
    n_hi = n_ref[:, 1:2]
    h_lo = h_ref[:, 0]  # [TN]
    h_hi = h_ref[:, 1]

    x = jax.lax.population_count(jnp.bitwise_xor(n_lo, h_lo[None, :]))
    y = jax.lax.population_count(jnp.bitwise_xor(n_hi, h_hi[None, :]))
    d = (x + y).astype(jnp.int32)  # [TQ, TN]
    d = jnp.where(v_ref[:, 0][None, :] != 0, d, jnp.int32(0x7FFF))

    base = j * tn
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1)
    # pack (distance, position) into one int32 so a single min reduction
    # carries both: dist<<16 | local column (tn <= 0xFFFF); distances are
    # <= 0x7FFF so packing never overflows
    packed = (d << 16) | col
    gone = jnp.int32(0x7FFFFFFF)

    # phase 1: extract the chunk's k smallest (ascending) — k min passes
    # over the VMEM-resident tile, no sort primitive needed
    ext_d = []
    ext_i = []
    for _ in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)  # [TQ,1]
        ext_d.append(m >> 16)
        ext_i.append((m & 0xFFFF) + base)
        packed = jnp.where(packed == m, gone, packed)  # col bits make m unique
    ext_d = jnp.concatenate(ext_d, axis=1)  # [TQ,k]
    ext_i = jnp.concatenate(ext_i, axis=1)

    # phase 2: merge with the running top-k — same extraction trick over
    # [TQ, 2k], with a one-hot select (no dynamic gather) for the index
    all_d = jnp.concatenate([d_ref[:], ext_d], axis=1)  # [TQ, 2k]
    all_i = jnp.concatenate([i_ref[:], ext_i], axis=1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tq, 2 * k), 1)
    spacked = (jnp.minimum(all_d, 0x7FFF) << 16) | slot
    for t in range(k):
        m = jnp.min(spacked, axis=1, keepdims=True)
        sel = (slot == (m & 0xFFFF))
        d_ref[:, t:t + 1] = m >> 16
        i_ref[:, t:t + 1] = jnp.sum(jnp.where(sel, all_i, 0), axis=1,
                                    keepdims=True)
        spacked = jnp.where(spacked == m, gone, spacked)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tn", "interpret"))
def hamming_topk_pallas(needles: jnp.ndarray, haystack: jnp.ndarray,
                        valid: jnp.ndarray, k: int = 16, tq: int = 256,
                        tn: int = 2048, interpret: bool = False):
    """Exact per-needle k-nearest by Hamming distance, fused in VMEM.

    needles [Q,2] uint32 (Q % tq == 0), haystack [N,2] uint32 (N % tn == 0),
    valid [N] int32 (0 = tombstone).
    @return (dists [Q,k] int32 ascending, indices [Q,k] int32)
    """
    q = needles.shape[0]
    n = haystack.shape[0]
    assert q % tq == 0 and n % tn == 0, (q, tq, n, tn)
    assert k <= 64 and tn <= 0xFFFF

    grid = (q // tq, n // tn)
    kernel = functools.partial(_kernel, tq=tq, tn=tn, k=k)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 2), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, 2), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.int32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        interpret=interpret,
    )(needles.astype(jnp.uint32), haystack.astype(jnp.uint32),
      valid.astype(jnp.int32).reshape(-1, 1))
    # packed running distances still carry the BIG sentinel for missing rows
    return jnp.where(out_d >= 0x7FFF, jnp.int32(0x7FFF), out_d), out_i
