"""Multi-chip sharded search: index sharding over ICI + top-k merge.

The TPU-native equivalent of the reference's single communication need
(SURVEY.md §2.4): there are no gradients or pipelines in this workload —
the one collective primitive is *sharded scan + top-k combine*.

Design: the packed hash array is sharded across chips on the item axis
(``index`` mesh axis); needles are replicated (or sharded over ``batch``
for all-pairs search).  Each chip scans its HBM-resident shard with the
XOR-popcount kernel, produces a local top-k, then an ``all_gather`` over
ICI merges the per-shard candidates — k·S values per needle instead of N,
so the collective is tiny (kilobytes) while the scan bandwidth scales
linearly with chip count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hamming import BAD_DIST, _chunk_dists


def make_mesh(devices=None, axes: tuple[str, str] = ("batch", "index")) -> Mesh:
    """Factor available devices into a 2D (batch, index) mesh: batch shards
    needles (data parallel), index shards the haystack (the analog of tensor
    parallelism for this workload)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    bi = 1
    for f in (2, 3, 5, 7):
        while bi * f <= max(1, int(np.sqrt(n))) and n % (bi * f) == 0:
            bi *= f
    mesh_devices = np.array(devices).reshape(bi, n // bi)
    return Mesh(mesh_devices, axes)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host (DCN) bring-up: initialize jax.distributed once per
    process, from args or the standard env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID — auto-detected on Cloud TPU pods).

    The search workload needs no cross-host work beyond more index shards
    (SURVEY.md §2.4): after this, build the mesh with make_multihost_mesh
    and every sharded_* entry point works unchanged — XLA routes the tiny
    top-k all_gather over DCN between slices and ICI within them.
    @return process count"""
    import os

    import jax
    # do NOT probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count()  # already initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return jax.process_count()


def make_multihost_mesh(axes: tuple[str, str] = ("batch", "index")) -> Mesh:
    """Global 2D mesh for a multi-host deployment: the ``index`` axis (which
    carries the top-k all_gather) stays inside each slice on ICI; the
    ``batch`` axis (no collectives at all) spans hosts over DCN.  On a
    single process this degenerates to make_mesh()."""
    if jax.process_count() == 1:
        return make_mesh()
    local = jax.local_device_count()
    try:
        from jax.experimental import mesh_utils
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, local),
            dcn_mesh_shape=(jax.process_count(), 1))
    except ValueError:
        # backends without slice metadata (e.g. the CPU backend used for
        # multi-process validation): group devices by process manually —
        # the same topology intent, index axis within a process
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        dev = np.array(devs).reshape(jax.process_count(), local)
    return Mesh(dev, axes)


def _local_topk(needles, haystack, valid, k: int, recall: float = 0.99):
    """Single-shard top-k (no jit wrapper — runs inside shard_map);
    recall >= 1.0 selects the exact sort (invariant-repair rescans).
    k is clamped to the shard's rows — a shard can't contribute more
    candidates than it holds; the gathered merge restores the caller's k."""
    k = min(k, haystack.shape[0])
    d = _chunk_dists(needles[:, 0], needles[:, 1], haystack[:, 0], haystack[:, 1])
    d = jnp.where(valid[None, :], d, BAD_DIST)
    if haystack.shape[0] > 4096 and recall < 1.0:
        dk, ik = jax.lax.approx_min_k(d.astype(jnp.float32), k,
                                      recall_target=recall)
        return dk.astype(jnp.int32), ik
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def sharded_hamming_topk(mesh: Mesh, needles: jnp.ndarray, haystack: jnp.ndarray,
                         valid: jnp.ndarray, k: int = 64,
                         recall: float = 0.99):
    """Distributed threshold/top-k search.

    needles [Q, 2] u32 (replicated), haystack [N, 2] u32 sharded over the
    ``index`` axis (N divisible by the index axis size), valid [N] bool.
    @return (dists [Q, k], global indices [Q, k]) fully replicated.
    """
    idx_axis = mesh.axis_names[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(idx_axis, None), P(idx_axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def run(n, h, v):
        local_d, local_i = _local_topk(n, h, v, k, recall)
        local_i = local_i + jax.lax.axis_index(idx_axis) * h.shape[0]
        # merge the per-shard candidate sets (k·S values/needle over ICI)
        return _merge_gathered(local_d, local_i, idx_axis, k_out=k)

    return run(needles, haystack, valid)


def sharded_all_pairs_step(mesh: Mesh, needles: jnp.ndarray,
                           haystack: jnp.ndarray, valid: jnp.ndarray,
                           k: int = 16):
    """One all-pairs (-similar) step over a 2D mesh: needles sharded over
    ``batch``, haystack sharded over ``index``; each (b, i) chip scans its
    (needle, item) block, the ``index`` axis merges top-k."""
    b_axis, i_axis = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(b_axis, None), P(i_axis, None), P(i_axis)),
        out_specs=(P(b_axis, None), P(b_axis, None)),
        check_vma=False)
    def run(n, h, v):
        local_d, local_i = _local_topk(n, h, v, k)
        local_i = local_i + jax.lax.axis_index(i_axis) * h.shape[0]
        # k_out: a small store clamps the per-shard k, but the gathered
        # candidate pool is s*k wide — merge back at the caller's k
        return _merge_gathered(local_d, local_i, i_axis, k_out=k)

    return run(needles, haystack, valid)


def shard_rows(mesh: Mesh, *arrays):
    """device_put each array sharded along axis 0 over the ``index`` axis
    (row counts must be divisible by the index-axis size — stores guarantee
    this by bucketing with _bucket(multiple=shards))."""
    idx_axis = mesh.axis_names[1]
    return tuple(
        jax.device_put(a, NamedSharding(
            mesh, P(idx_axis, *(None,) * (np.ndim(a) - 1))))
        for a in arrays)


def index_shards(mesh: Mesh) -> int:
    return mesh.devices.shape[1]


def shard_index_arrays(mesh: Mesh, haystack: np.ndarray, valid: np.ndarray):
    """Place packed host arrays onto the mesh with index-axis sharding."""
    return shard_rows(mesh, haystack, valid)


def _merge_gathered(local_d, local_i, axis_name, k_out: int | None = None):
    """all_gather per-shard [Q,k] candidates over the index axis and take
    the global top-k (shared tail of every sharded scan).
    @param k_out merged width (the caller's k, which can exceed the
    per-shard clamped k); defaults to the local k, capped at s*k."""
    all_d = jax.lax.all_gather(local_d, axis_name)  # [S, Q, k]
    all_i = jax.lax.all_gather(local_i, axis_name)
    s, q, kk = all_d.shape
    all_d = jnp.moveaxis(all_d, 0, 1).reshape(q, s * kk)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(q, s * kk)
    neg, sel = jax.lax.top_k(-all_d, min(k_out or kk, s * kk))
    return -neg, jnp.take_along_axis(all_i, sel, axis=1)


def sharded_lanes_topk(mesh: Mesh, needles: jnp.ndarray, haystack: jnp.ndarray,
                       valid: jnp.ndarray, k: int = 10):
    """Multi-lane (e.g. 256-bit ORB descriptor) distributed knn: needles
    [Q, L] u32 replicated, haystack [N, L] u32 sharded over ``index``."""
    from ..ops.hamming import BAD_DIST as BAD, _chunk_dists_lanes
    idx_axis = mesh.axis_names[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(idx_axis, None), P(idx_axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def run(n, h, v):
        d = _chunk_dists_lanes(n, h)
        d = jnp.where(v[None, :], d, BAD)
        if h.shape[0] > 4096:
            dk, ik = jax.lax.approx_min_k(d.astype(jnp.float32), k,
                                          recall_target=0.99)
            dk = dk.astype(jnp.int32)
        else:
            neg, ik = jax.lax.top_k(-d, min(k, h.shape[0]))
            dk = -neg
        ik = ik + jax.lax.axis_index(idx_axis) * h.shape[0]
        out_d, out_i = _merge_gathered(dk, ik, idx_axis, k_out=k)
        return out_d.astype(jnp.int32), out_i

    return run(needles, haystack, valid)


def sharded_color_topk(mesh: Mesh, n_colors: jnp.ndarray, n_counts: jnp.ndarray,
                       h_colors: jnp.ndarray, h_counts: jnp.ndarray,
                       h_valid: jnp.ndarray, k: int = 64):
    """Distributed color descriptor scan: needle Luv/count replicated,
    haystack arrays sharded over ``index``; per-shard chunked min-distance
    scan + the same top-k all_gather merge."""
    from ..ops.color import color_topk_local
    idx_axis = mesh.axis_names[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(idx_axis, None, None), P(idx_axis), P(idx_axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def run(nc, nn, hc, hn, hv):
        local_s, local_i = color_topk_local(nc, nn, hc, hn, hv,
                                            k=min(k, hc.shape[0]))
        local_i = local_i + jax.lax.axis_index(idx_axis) * hc.shape[0]
        return _merge_gathered(local_s, local_i, idx_axis, k_out=k)

    return run(n_colors, n_counts, h_colors, h_counts, h_valid)


def sharded_frame_search(mesh: Mesh, needles: jnp.ndarray, hashes: jnp.ndarray,
                         vidx: jnp.ndarray, frame_no: jnp.ndarray,
                         valid: jnp.ndarray, num_videos: int,
                         chunk: int = 1 << 16):
    """Distributed per-video segment-min (video index, algo 4): frame rows
    sharded over ``index`` (video ids stay global), each shard reduces its
    frames into a packed [Q, V] (dist<<24|frame) accumulator, then one
    pmin over ICI combines — distance dominates the packing so the min
    carries the nearest frame along."""
    from ..ops.video_search import _FRAME_BITS, _FRAME_MASK, frame_search_packed
    idx_axis = mesh.axis_names[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(idx_axis, None), P(idx_axis), P(idx_axis), P(idx_axis)),
        out_specs=(P(), P()),
        check_vma=False)
    def run(n, h, v, fr, o):
        acc = frame_search_packed(n, h, v, fr, o, num_videos,
                                  min(chunk, h.shape[0]))
        acc = jax.lax.pmin(acc, idx_axis)
        return acc >> _FRAME_BITS, acc & _FRAME_MASK

    return run(needles, hashes, vidx, frame_no, valid)


def _mxu_shard_rows(mesh: Mesh, n_pad: int, threshold) -> bool:
    """Whether the per-shard MXU count kernel applies: each chip's local
    slice of an index-sharded [n_pad] store must pass ops/mxu_count's
    enablement gates (TPU backend, column-block divisibility, row cap)."""
    from ..ops import mxu_count as mc
    if threshold >= 64 or n_pad % index_shards(mesh):
        return False
    return mc.mxu_enabled(n_pad // index_shards(mesh))


def _sharded_mxu_counts(mesh: Mesh, needles: jnp.ndarray,
                        haystack: jnp.ndarray, valid: jnp.ndarray,
                        threshold) -> jnp.ndarray:
    """Per-shard ±1-matmul count (ops/mxu_count: distances on the MXU, the
    [Q, C] tile never leaves VMEM; the packed shard is unpacked in-kernel)
    + one psum over ICI — the MXU routing shared by sharded_count_below
    and sharded_flat_counts."""
    from ..ops import mxu_count as mc
    idx_axis = mesh.axis_names[1]
    q = needles.shape[0]
    pad = -q % mc.BQ
    if pad:
        needles = jnp.pad(needles, ((0, pad), (0, 0)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(idx_axis, None), P(idx_axis), P()),
        out_specs=P(),
        check_vma=False)
    def run(n, h, v, t):
        local = mc.mxu_count_below(n, h, v.astype(jnp.int32), t[0],
                                   bq=mc.BQ, bc=mc.BC)
        return jax.lax.psum(local, idx_axis)

    return run(needles, haystack, valid,
               jnp.asarray([threshold], jnp.int32))[:q]


def sharded_flat_counts(mesh: Mesh, needles: jnp.ndarray, haystack: jnp.ndarray,
                        valid: jnp.ndarray, threshold, chunk: int = 1 << 16):
    """Distributed per-needle flat hit count over a frame-sharded store
    (the video↔video N² pre-gate, ops/video_search.flat_hit_counts): each
    chip scans its frame shard in fused [Q × chunk] tiles, one psum over
    ICI combines the exact counts — the collective is Q int32s per batch.

    needles [Q, 2] u32 replicated; haystack [F, 2] u32 + valid [F] bool
    sharded over the ``index`` axis.  @return counts [Q] int32 replicated."""
    if _mxu_shard_rows(mesh, haystack.shape[0], threshold):
        return _sharded_mxu_counts(mesh, needles, haystack, valid, threshold)
    idx_axis = mesh.axis_names[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(idx_axis, None), P(idx_axis), P()),
        out_specs=P(),
        check_vma=False)
    def run(n, h, v, t):
        f = h.shape[0]
        c = min(chunk, f)
        pad = -f % c
        if pad:
            h = jnp.pad(h, ((0, pad), (0, 0)))
            v = jnp.pad(v, (0, pad))
        hs = h.reshape(-1, c, 2)
        vs = v.reshape(-1, c)

        def body(acc, inp):
            hc, vc = inp
            d = _chunk_dists(n[:, 0], n[:, 1], hc[:, 0], hc[:, 1])
            hit = (d < t[0]) & vc[None, :]
            return acc + hit.sum(axis=1, dtype=jnp.int32), None

        acc, _ = jax.lax.scan(body, jnp.zeros(n.shape[0], jnp.int32), (hs, vs))
        return jax.lax.psum(acc, idx_axis)

    return run(needles, haystack, valid, jnp.asarray([threshold], jnp.int32))


def sharded_count_below(mesh: Mesh, needles: jnp.ndarray, haystack: jnp.ndarray,
                        valid: jnp.ndarray, threshold):
    """Distributed count-below-threshold: each shard reduces its slice, one
    psum over ICI combines (the cheap phase of two-phase search)."""
    if _mxu_shard_rows(mesh, haystack.shape[0], threshold):
        return _sharded_mxu_counts(mesh, needles, haystack, valid, threshold)
    idx_axis = mesh.axis_names[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(idx_axis, None), P(idx_axis), P()),
        out_specs=P(),
        check_vma=False)
    def run(n, h, v, t):
        d = _chunk_dists(n[:, 0], n[:, 1], h[:, 0], h[:, 1])
        hit = (d < t[0]) & v[None, :]
        local = hit.sum(axis=1, dtype=jnp.int32)
        return jax.lax.psum(local, idx_axis)

    return run(needles, haystack, valid, jnp.asarray([threshold], jnp.int32))


# ---------------------------------------------------------------------------
# triangular N² self-search count phase over all mesh devices
# ---------------------------------------------------------------------------

_SELF_COUNT_CACHE: dict = {}


def _self_count_step_fn(mesh: Mesh, rows: int, cols: int, span: int,
                        use_mxu: bool = False):
    """Build (and cache) the per-step program for sharded_self_count: every
    chip processes one [rows × cols] tile of the replicated haystack and
    accumulates row counts into its local slice of the state array.

    With use_mxu the per-chip tile runs the ±1-matmul triangle count
    (ops/mxu_count.mxu_count_triangle, unpacking the packed replicated
    store in-kernel) instead of the VPU xor+popcount tile.  Every MXU tile
    pays the iota triangle mask (tile kind can't be static under SPMD —
    chips process different tiles in one program); single-chip A/Bs put
    the masked kernel well above the VPU tile still."""
    key = (mesh, rows, cols, span, use_mxu)  # Mesh hashes by devices+axes
    # — an id() key could alias a dead mesh whose address was reused
    fn = _SELF_COUNT_CACHE.get(key)
    if fn is not None:
        return fn
    ax = tuple(mesh.axis_names)  # flatten both axes: one tile per device

    def run(st, off, rb, cb, h, v, t):
        # st [1, span] local counts; off/rb/cb [1] this chip's assignment;
        # h [N, 2] u32 + v [N] bool replicated packed store
        nd = jax.lax.dynamic_slice(h, (rb[0], 0), (rows, 2))
        rv = jax.lax.dynamic_slice(v, (rb[0],), (rows,))
        cb0 = jnp.maximum(cb[0], 0)  # cb < 0 = idle padding step
        hs = jax.lax.dynamic_slice(h, (cb0, 0), (cols, 2))
        vs = jax.lax.dynamic_slice(v, (cb0,), (cols,))
        if use_mxu:
            from ..ops import mxu_count as mc
            counts = mc.mxu_count_triangle(nd, hs, vs.astype(jnp.int32), t,
                                           rb[0], cb0,
                                           bq=mc.BQ, bc=mc.BC_MASKED)
            inc = counts * (rv & (cb[0] >= 0)).astype(jnp.int32)
        else:
            d = _chunk_dists(nd[:, 0], nd[:, 1], hs[:, 0], hs[:, 1])
            hit = (d < t) & (vs & rv[:, None])
            # strict upper triangle: j > i excludes self-pairs and the
            # below-diagonal corner of the one diagonal-straddling tile
            hit &= (cb0 + jnp.arange(cols, dtype=jnp.int32))[None, :] \
                > (rb[0] + jnp.arange(rows, dtype=jnp.int32))[:, None]
            hit &= cb[0] >= 0
            inc = hit.sum(axis=1, dtype=jnp.int32)
        seg = jax.lax.dynamic_slice(st, (0, off[0]), (1, rows))
        return jax.lax.dynamic_update_slice(st, seg + inc[None], (0, off[0]))

    sm = shard_map(
        run, mesh=mesh,
        in_specs=(P(ax, None), P(ax), P(ax), P(ax), P(), P(), P()),
        out_specs=P(ax, None), check_vma=False)
    fn = jax.jit(sm, donate_argnums=(0,))
    _SELF_COUNT_CACHE[key] = fn
    return fn


def sharded_self_count(mesh: Mesh, haystack_rep: jnp.ndarray,
                       valid_rep: jnp.ndarray, threshold: int,
                       rows: int, cols: int,
                       use_mxu: bool = False) -> np.ndarray:
    """Triangular self-search count phase, balanced over all mesh devices.

    The haystack is REPLICATED (capacity = one chip's HBM; beyond that the
    caller falls back to the plain index-sharded scan) so any chip can
    process any tile.  All live (on/above-diagonal) tiles cost the same
    [rows × cols] work, so balance is just interleaved block ownership:
    block b → chip b mod C.  Each chip chains its row counts in a local
    slice of a donated [C, span] state array — no cross-chip collective at
    all; one readback at the end.

    @param use_mxu run the per-chip tiles as MXU ±1-matmul counts
           (ops/mxu_count, in-kernel unpack) instead of the VPU scan
           (~2x on v5e single-chip A/Bs)
    @return counts [n_pad] int32 — per store row #{j > i: dist < threshold}
    """
    n_pad = haystack_rep.shape[0]
    devs = int(np.prod(mesh.devices.shape))
    blocks = list(range(0, n_pad, rows))
    span_blocks = -(-len(blocks) // devs)
    span = span_blocks * rows
    seqs: list[list] = [[] for _ in range(devs)]
    for i, rb in enumerate(blocks):
        c, slot = i % devs, i // devs
        for cb in range(rb // cols * cols, n_pad, cols):
            seqs[c].append((slot * rows, rb, cb))
    steps = max(len(s) for s in seqs)
    for s in seqs:
        s.extend([(0, 0, -1)] * (steps - len(s)))

    ax = tuple(mesh.axis_names)
    sharded_vec = NamedSharding(mesh, P(ax))
    state = jax.device_put(np.zeros((devs, span), np.int32),
                           NamedSharding(mesh, P(ax, None)))
    step = _self_count_step_fn(mesh, rows, cols, span, use_mxu)
    t = jnp.int32(threshold)
    for i in range(steps):
        offs, rbs, cbs = (np.array([s[i][j] for s in seqs], np.int32)
                          for j in range(3))
        state = step(state, jax.device_put(offs, sharded_vec),
                     jax.device_put(rbs, sharded_vec),
                     jax.device_put(cbs, sharded_vec),
                     haystack_rep, valid_rep, t)
    host = jax.device_get(state)
    counts = np.zeros(n_pad, np.int32)
    for i, rb in enumerate(blocks):
        c, slot = i % devs, i // devs
        counts[rb:rb + rows] = host[c, slot * rows:(slot + 1) * rows]
    return counts


# ---------------------------------------------------------------------------
# pigeonhole-sorted N² count phase over all mesh devices (ops/pigeonhole.py)
# ---------------------------------------------------------------------------

_PH_STEP_CACHE: dict = {}


def ph_band_step_fn(mesh: Mesh, mask_cur, mask_prev, s: int, g: int, t: int):
    """Per-step program for the sharded pigeonhole band scan: every chip
    processes one [g, s, 2s] band chunk of the REPLICATED sorted arrays at
    its own offset and accumulates into its local row of the [C, n_pad+s]
    per-sorted-position state (p0 < 0 = idle padding step).  Mirrors
    _self_count_step_fn's no-collective design; one psum at block end
    (ph_reduce_fn) combines the chips."""
    key = ("band", mesh, mask_cur, mask_prev, s, g, t)
    fn = _PH_STEP_CACHE.get(key)
    if fn is not None:
        return fn
    from ..ops.pigeonhole import _band_contrib
    ax = tuple(mesh.axis_names)
    r = g * s

    def run(st, p0, slo, shi, srow, svalid):
        q0 = jnp.maximum(p0[0], 0)
        contrib = _band_contrib(slo, shi, srow, svalid, q0,
                                mask_cur=mask_cur, mask_prev=mask_prev,
                                s=s, g=g, t=t)
        contrib *= (p0[0] >= 0).astype(jnp.int32)
        seg = jax.lax.dynamic_slice(st, (0, q0), (1, r + s))
        return jax.lax.dynamic_update_slice(st, seg + contrib[None], (0, q0))

    sm = shard_map(run, mesh=mesh,
                   in_specs=(P(ax, None), P(ax), P(), P(), P(), P()),
                   out_specs=P(ax, None), check_vma=False)
    fn = jax.jit(sm, donate_argnums=(0,))
    _PH_STEP_CACHE[key] = fn
    return fn


def ph_run_step_fn(mesh: Mesh, mask_cur, mask_prev, s: int, t: int):
    """Per-step program for the sharded oversized-run tiles: every chip
    processes one dense [s, s] tile (ra < 0 = idle)."""
    key = ("run", mesh, mask_cur, mask_prev, s, t)
    fn = _PH_STEP_CACHE.get(key)
    if fn is not None:
        return fn
    from ..ops.pigeonhole import _run_contribs
    ax = tuple(mesh.axis_names)

    def run(st, ra, ca, slo, shi, srow, svalid):
        qa = jnp.maximum(ra[0], 0)
        qc = jnp.maximum(ca[0], 0)
        row_ct, col_ct = _run_contribs(slo, shi, srow, svalid, qa, qc,
                                       mask_cur=mask_cur,
                                       mask_prev=mask_prev, s=s, t=t)
        live = (ra[0] >= 0).astype(jnp.int32)
        row_ct *= live
        col_ct *= live
        seg = jax.lax.dynamic_slice(st, (0, qa), (1, s))
        st = jax.lax.dynamic_update_slice(st, seg + row_ct[None], (0, qa))
        seg = jax.lax.dynamic_slice(st, (0, qc), (1, s))
        return jax.lax.dynamic_update_slice(st, seg + col_ct[None], (0, qc))

    sm = shard_map(run, mesh=mesh,
                   in_specs=(P(ax, None), P(ax), P(ax), P(), P(), P(), P()),
                   out_specs=P(ax, None), check_vma=False)
    fn = jax.jit(sm, donate_argnums=(0,))
    _PH_STEP_CACHE[key] = fn
    return fn


def ph_reduce_fn(mesh: Mesh):
    """Combine the per-chip pigeonhole states: one psum over all mesh axes
    → the block's replicated csort vector."""
    key = ("reduce", mesh)
    fn = _PH_STEP_CACHE.get(key)
    if fn is not None:
        return fn
    ax = tuple(mesh.axis_names)

    def run(st):
        acc = jax.lax.psum(st[0], ax[0])
        return jax.lax.psum(acc, ax[1]) if len(ax) > 1 else acc

    sm = shard_map(run, mesh=mesh, in_specs=(P(ax, None),), out_specs=P(),
                   check_vma=False)
    fn = jax.jit(sm, donate_argnums=(0,))
    _PH_STEP_CACHE[key] = fn
    return fn


def ph_state(mesh: Mesh, m: int):
    """Fresh per-chip [C, m] int32 state, one row per device."""
    devs = int(np.prod(mesh.devices.shape))
    ax = tuple(mesh.axis_names)
    return jax.device_put(np.zeros((devs, m), np.int32),
                          NamedSharding(mesh, P(ax, None)))


def ph_replicate(mesh: Mesh, *arrays):
    """Commit arrays fully-replicated on the mesh (pigeonhole's sorted
    operands are read by every chip)."""
    sh = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sh) for a in arrays)
