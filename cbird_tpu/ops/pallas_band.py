"""Pallas band-count kernel for the pigeonhole N² count phase.

RESOLVED NEGATIVE on warm runs — kept OPT-IN (CBIRD_PALLAS_BAND=on).
Store-level 10M/t=5 search_self A/B (experiments/ph_pallas_store_ab.py,
same process, modes interleaved, results identical): WARM 11.32 s with
this kernel vs 7.89 s XLA band chunks; COLD (first compile) 196 s vs
738 s.  The XLA loop (ops/pigeonhole.py _band_chunk) compiles one
program per (s, g, n_prev) — ~10 programs at 10M — while this kernel
takes masks via SMEM and compiles once per (s, T), hence the 3.8x cold
advantage; but warm it loses because the symmetric window evaluates
1.5x the pairs (3s vs 2s per row) and the per-slot rate advantage
measured on v5e doesn't cover that at the large adaptive band widths
(micro A/B, useful pairs/s, same window: s=2048 23G vs 15G — 1.5x;
s=4096 29G vs 24G — 1.2x; the adaptive picker chooses s=8192 for most
10M blocks, where the inflation dominates).

Why the symmetric window exists at all: the forward window
([i·s, i·s+2s), credit either side by store-row order) needs a
column-axis accumulation for the pairs whose smaller store row is the
LATER sorted position — and that cross-sublane reduction + scratch
read-modify-write measured 3x slower still (9-19G pairs/s; the repo's
triangular-scan learnings hit the same wall and solved it the same
way: docs/TODO.md "mirror hits into never-scanned needles").  Each
tile i scans the centered window [(i-1)·s, (i+2)·s) and counts a pair
ONLY from the side holding the smaller ORIGINAL store row: every
same-or-adjacent-tile pair is seen from both sides, so the row-side
sum alone credits it exactly once, with no position iotas (self-pairs
p == q die on the strict row compare) and validity folded into the
attribution compare (invalid rows encode srow = -1; pair counted iff
0 <= a_row < w_row).

Lessons encoded here for the next kernel attempt: (1) separate 1D hash
words — a stacked [_, 2] u32 operand makes every load a cross-lane
column extract (14G → 19G pairs/s); (2) dynamic 1D slices inside a
block need offsets statically provable as 1024-element i32 tile
multiples (bq = 1024); (3) wide column tiles amortize per-subtile
overhead (bc 1024 → 2048 was 2.6x); (4) avoid column-axis reductions
entirely; (5) Mosaic materializes every full-tile intermediate, so the
~30-op/pair mask chain caps ~25-35G useful pairs/s regardless of VPU
peak — an op-count reduction (e.g. precomputed run-id compares), not
more tiling, is the remaining lever.

Semantics (must match _band_contrib, ops/pigeonhole.py): pair (p, q)
scores a hit when Hamming distance < t, the current block's masked bits
are EQUAL, every previous block's masked bits are UNEQUAL
(first-equal-block dedup → exact global counts), and both rows are
valid.  The hit credits the side with the smaller original store row.
Coverage = all pairs within the same or adjacent s-tiles — identical to
the forward band, so the oversized-run dense tiles (tb ≥ ta + 2) stay
disjoint and complete.

Masks and threshold arrive via SMEM (traced), so one program serves all
T blocks of a threshold — and would serve store-adaptive re-balanced
masks without recompiling.  Dead prev-mask slots (both words zero) pass
automatically, so the prev-mask loop always runs T-1 iterations and the
program count stays one per (s, bq, bc, T) tuple.

Rebuilds the same reference hot loop as ops/mxu_count.py
(/root/reference/src/dcthashindex.cpp:193-220).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 1024  # needle-side rows per VMEM tile.  Must stay a multiple of the
#            1024-element i32 1D tile (8 sublanes x 128 lanes): the needle
#            rows are dynamically sliced out of the resident window block
#            at offset r*BQ, and Mosaic requires that offset statically
#            provable as a tile multiple ("cannot statically prove that
#            index in dimension 0 is a multiple of 1024" otherwise).
BC = 4096  # window columns per VMEM tile; wider amortizes per-subtile
#            overhead (2M/s=2048 sweep: bc=1024 9G, 2048 23G pairs/s;
#            s=4096: bc=2048 26G, 4096 29G).  [bq, bc] i32 temps = 16 MB.

# Tests flip this to run through the Pallas interpreter on the CPU
# backend; must be set before the first call (jit traces capture it).
_INTERPRET = False


def enabled() -> bool:
    """Default OFF (measured slower warm at 10M — see module docstring);
    CBIRD_PALLAS_BAND=on enables on a real TPU backend (useful when
    compile time dominates: 3.8x faster cold), =force bypasses the
    backend check for interpret-mode tests."""
    mode = os.environ.get("CBIRD_PALLAS_BAND", "off").lower()
    if mode in ("off", "0", "no", ""):
        return False
    return mode == "force" or jax.default_backend() == "tpu"


def _band_kernel(t_ref, m_ref,
                 w0lo_ref, w0hi_ref, w0row_ref,
                 w1lo_ref, w1hi_ref, w1row_ref,
                 w2lo_ref, w2hi_ref, w2row_ref,
                 orow_ref, *, s: int, bq: int, bc: int, n_prev: int):
    r = pl.program_id(1)

    t = t_ref[0, 0]
    # the needle rows are the center block of the resident 3s window (one
    # array must not carry two different block sizes — Mosaic requires a
    # single layout per buffer).  bq is a multiple of the 1024-element
    # i32 tile (or covers the whole block), so the r*bq offsets are
    # statically provable tile multiples.
    if bq == s:
        a_lo, a_hi = w1lo_ref[:], w1hi_ref[:]
        a_row = w1row_ref[:]
    else:
        a_lo = w1lo_ref[pl.ds(r * bq, bq)]
        a_hi = w1hi_ref[pl.ds(r * bq, bq)]
        a_row = w1row_ref[pl.ds(r * bq, bq)]
    row_acc = jnp.zeros((bq,), jnp.int32)
    clo = m_ref[0, 0]
    chi = m_ref[0, 1]
    a_row2 = a_row[:, None]
    for wlo, whi, wrow in ((w0lo_ref, w0hi_ref, w0row_ref),
                           (w1lo_ref, w1hi_ref, w1row_ref),
                           (w2lo_ref, w2hi_ref, w2row_ref)):
        for cc in range(s // bc):
            c0 = cc * bc
            b_lo = wlo[pl.ds(c0, bc)]
            b_hi = whi[pl.ds(c0, bc)]
            x_lo = a_lo[:, None] ^ b_lo[None, :]
            x_hi = a_hi[:, None] ^ b_hi[None, :]
            d = (jax.lax.population_count(x_lo)
                 + jax.lax.population_count(x_hi)).astype(jnp.int32)
            hit = (d < t) & (((x_lo & clo) | (x_hi & chi)) == 0)
            for p in range(n_prev):
                plo = m_ref[1 + p, 0]
                phi = m_ref[1 + p, 1]
                # dead slots (both words 0) pass: the prev-mask loop is
                # always T-1 long so one program serves every block
                hit &= (((x_lo & plo) | (x_hi & phi)) != 0) | (
                    (plo | phi) == 0)
            # attribution + validity + self-exclusion in two compares:
            # invalid rows carry srow = -1, so 0 <= a_row < w_row holds
            # exactly for valid pairs credited to this (smaller-row) side
            hit &= (a_row2 >= 0) & (a_row2 < wrow[pl.ds(c0, bc)][None, :])
            row_acc += jnp.sum(hit.astype(jnp.int32), axis=1)
    orow_ref[:] = row_acc


@functools.partial(jax.jit, static_argnames=("s", "t_blocks", "bq", "bc"))
def band_counts(slo: jnp.ndarray, shi: jnp.ndarray, srow: jnp.ndarray,
                svalid: jnp.ndarray, masks: jnp.ndarray,
                threshold: jnp.ndarray, *, s: int, t_blocks: int,
                bq: int = 0, bc: int = 0):
    """Band contributions for one block's sorted order.

    @param slo, shi   [n_pad + s] u32 sorted hash words (back-padded;
                      separate 1D arrays — a stacked [_, 2] operand makes
                      every hash load a cross-lane column extract)
    @param srow       [n_pad + s] int32 original store rows
    @param svalid     [n_pad + s] bool validity (folded into the row
                      encoding; pad slots may carry any srow)
    @param masks      [t_blocks, 2] u32: row 0 = current block mask,
                      rows 1..n_prev = previous blocks' masks, remaining
                      rows zero (dead)
    @param threshold  scalar int32
    @param s          static band half-width (tile size)
    @param t_blocks   static mask-row count (threshold — fixes the
                      prev-loop length so one program serves all blocks)
    @return row_credit [n_pad] int32: csort[:n_pad] += row_credit
    """
    n_tot = slo.shape[0]
    n_pad = n_tot - s
    bq = bq or min(BQ, s)
    bc = bc or min(BC, s)
    n_tiles = n_pad // s
    # centered window: pad the FRONT by one tile too (slices below), and
    # encode validity into the row ids (invalid/pad rows -> -1)
    srow_enc = jnp.where(svalid, srow, -1)
    fp = ((s, 0),)
    flo, fhi = jnp.pad(slo, fp), jnp.pad(shi, fp)
    frow = jnp.pad(srow_enc, fp, constant_values=-1)
    t2d = jnp.full((1, 1), threshold, jnp.int32)
    grid = (n_tiles, s // bq)
    blk = s // bq
    wspec = [pl.BlockSpec((s,), lambda i, r, d=d: (i + d,),
                          memory_space=pltpu.VMEM)
             for d in (0, 1, 2) for _ in (0, 1, 2)]
    # reorder: three shifts x three arrays -> (lo,hi,row) per shift
    out = pl.pallas_call(
        functools.partial(_band_kernel, s=s, bq=bq, bc=bc,
                          n_prev=t_blocks - 1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((masks.shape[0], 2), lambda i, r: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + wspec,
        out_specs=pl.BlockSpec((bq,), lambda i, r, b=blk: (i * b + r,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        interpret=_INTERPRET,
    )(t2d, masks,
      flo, fhi, frow, flo, fhi, frow, flo, fhi, frow)
    return out
