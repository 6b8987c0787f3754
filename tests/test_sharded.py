"""Sharded search over the 8-virtual-device CPU mesh: results must equal the
single-device scan bit-for-bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbird_tpu.ops.dct_hash import split_u64
from cbird_tpu.ops.hamming import hamming_topk
from cbird_tpu.parallel.sharded import (make_mesh, shard_index_arrays,
                                        sharded_all_pairs_step,
                                        sharded_hamming_topk)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("batch", "index")
    assert mesh.devices.shape == (2, 4)


def test_sharded_matches_single(mesh, rng):
    n = 4096  # divisible by index axis (4)
    q = 16
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    needles = np.concatenate([haystack[:8], rng.integers(1, 2**63, 8, np.uint64)])
    hs = split_u64(haystack)
    ns = split_u64(needles)
    valid = np.ones(n, dtype=bool)

    d1, i1 = hamming_topk(jnp.asarray(ns), jnp.asarray(hs), jnp.asarray(valid), k=8)
    hs_d, vs_d = shard_index_arrays(mesh, hs, valid)
    d2, i2 = sharded_hamming_topk(mesh, jnp.asarray(ns), hs_d, vs_d, k=8)

    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    # exact self matches must resolve to identical rows
    assert np.array_equal(np.asarray(i1)[:8, 0], np.asarray(i2)[:8, 0])


def test_sharded_all_pairs(mesh, rng):
    n = 1024
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hs = split_u64(haystack)
    valid = np.ones(n, dtype=bool)
    # needles = the haystack itself (self-similar), sharded over batch
    d, i = sharded_all_pairs_step(mesh, jnp.asarray(hs), jnp.asarray(hs),
                                  jnp.asarray(valid), k=4)
    d, i = np.asarray(d), np.asarray(i)
    assert d.shape == (n, 4)
    # every needle's best match is itself at distance 0
    assert (d[:, 0] == 0).all()
    assert (i[:, 0] == np.arange(n)).all()


def test_sharded_small_store_keeps_k(mesh, rng):
    """A store with fewer rows per shard than k must still merge back to
    the caller's k (regression: the per-shard clamp shrank the output to
    rows_per_shard, silently dropping matches beyond it)."""
    n = 32  # 8 rows per index shard (4 shards), k=16 > 8
    base = rng.integers(1, 2**63, size=1, dtype=np.uint64)[0]
    # 20 near-duplicates of the needle (distance 1), rest random
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    haystack[:20] = base ^ (np.uint64(1) << rng.integers(0, 63, 20).astype(np.uint64))
    hs = split_u64(haystack)
    valid = np.ones(n, dtype=bool)
    ns = split_u64(np.array([base], dtype=np.uint64))
    hs_d, vs_d = shard_index_arrays(mesh, hs, valid)
    d, i = sharded_hamming_topk(mesh, jnp.asarray(ns), hs_d, vs_d, k=16)
    d = np.asarray(d)
    assert d.shape == (1, 16)
    assert (d[0] <= 1).sum() == 16  # all 16 slots hold real near-dups
    d2, i2 = sharded_all_pairs_step(mesh, jnp.asarray(ns).repeat(2, 0),
                                    jnp.asarray(hs), jnp.asarray(valid), k=16)
    assert np.asarray(d2).shape == (2, 16)
    assert (np.asarray(d2)[0] <= 1).sum() == 16


def test_sharded_tombstones(mesh, rng):
    n = 2048
    haystack = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hs = split_u64(haystack)
    valid = np.ones(n, dtype=bool)
    valid[:1024] = False
    hs_d, vs_d = shard_index_arrays(mesh, hs, valid)
    ns = split_u64(haystack[:4])  # tombstoned needles
    d, i = sharded_hamming_topk(mesh, jnp.asarray(ns), hs_d, vs_d, k=4)
    i = np.asarray(i)
    assert (i >= 1024).all()  # no tombstoned row ever returned


def test_sharded_frame_search(mesh, rng):
    """Per-video segment-min over frame-sharded rows must equal the
    single-device reduction bit-for-bit (packed dist<<24|frame pmin)."""
    from cbird_tpu.ops.video_search import frame_search
    from cbird_tpu.parallel.sharded import shard_rows, sharded_frame_search
    f, v, q = 2048, 16, 8  # f divisible by the index axis (4)
    hashes = rng.integers(0, 2**32, size=(f, 2), dtype=np.uint32)
    vidx = rng.integers(0, v, size=f).astype(np.int32)
    frame_no = rng.integers(0, 5000, size=f).astype(np.int32)
    valid = rng.random(f) > 0.1
    needles = np.concatenate([hashes[:4], rng.integers(0, 2**32, (4, 2), dtype=np.uint32)])

    d1, f1 = frame_search(jnp.asarray(needles), jnp.asarray(hashes),
                          jnp.asarray(vidx), jnp.asarray(frame_no),
                          jnp.asarray(valid), num_videos=v)
    hs, vs, fs, ok = shard_rows(mesh, hashes, vidx, frame_no, valid)
    d2, f2 = sharded_frame_search(mesh, jnp.asarray(needles), hs, vs, fs, ok,
                                  num_videos=v)
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(f1), np.asarray(f2))


def test_sharded_flat_counts(mesh, rng):
    """The sharded video-gate count must be exact (== numpy brute force)."""
    from cbird_tpu.parallel.sharded import shard_rows, sharded_flat_counts
    f, q = 4096, 32
    hashes = rng.integers(0, 2**32, size=(f, 2), dtype=np.uint32)
    valid = rng.random(f) > 0.2
    needles = np.concatenate([hashes[:16],
                              rng.integers(0, 2**32, (16, 2), dtype=np.uint32)])
    t = 12
    hs, ok = shard_rows(mesh, hashes, valid)
    got = np.asarray(sharded_flat_counts(mesh, jnp.asarray(needles), hs, ok, t))
    d = (np.bitwise_count(needles[:, None, 0] ^ hashes[None, :, 0])
         + np.bitwise_count(needles[:, None, 1] ^ hashes[None, :, 1]))
    want = ((d < t) & valid[None, :]).sum(axis=1).astype(np.int32)
    assert np.array_equal(got, want)


def test_video_store_gate_on_mesh(rng):
    """PackedVideoStore.flat_hit_counts follows the sharded path under the
    8-device conftest mesh and must equal brute-force frame counts."""
    from cbird_tpu.ops.dct_hash import combine_u32
    from cbird_tpu.ops.hamming import _search_mesh
    from cbird_tpu.ops.video_search import PackedVideoStore
    assert _search_mesh() is not None, "conftest mesh missing"
    store = PackedVideoStore()
    all_hashes = []
    for mid in range(1, 6):
        n = 40 + 8 * mid
        h = rng.integers(1, 2**63, size=n, dtype=np.uint64)
        store.add_video(mid, np.arange(n, dtype=np.int32) * 10, h)
        all_hashes.append(h)
    flat = np.concatenate(all_hashes)
    needles = np.concatenate([flat[:10], rng.integers(1, 2**63, 6, np.uint64)])
    t = 14
    got = store.flat_hit_counts(needles, t)
    pairs = flat.view(np.uint32).reshape(-1, 2)
    np_pairs = needles.view(np.uint32).reshape(-1, 2)
    d = (np.bitwise_count(np_pairs[:, None, 0] ^ pairs[None, :, 0])
         + np.bitwise_count(np_pairs[:, None, 1] ^ pairs[None, :, 1]))
    want = (d < t).sum(axis=1).astype(np.int32)
    assert np.array_equal(got, want)


def test_multihost_helpers():
    """Single-process degeneration of the multi-host API (full DCN path
    needs real pods; here init is a no-op and the mesh falls back)."""
    import jax
    from cbird_tpu.parallel.sharded import init_distributed, make_multihost_mesh
    assert init_distributed() == 1  # no coordinator configured → local only
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("batch", "index")
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())


def test_multihost_two_process():
    """Execute make_multihost_mesh + sharded_hamming_topk under a REAL
    two-process jax.distributed bring-up (CPU backend, 2 virtual devices
    each): the all_gather stays on the in-process axis, batch replication
    spans processes, and both processes verify against numpy brute force."""
    import os
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)),
         env.get("PYTHONPATH", "")])
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert "MULTIHOST-OK proc=0" in outs[0], outs[0][-2000:]
    assert "MULTIHOST-OK proc=1" in outs[1], outs[1][-2000:]


def test_sharded_mxu_counts_interpret(mesh, rng, monkeypatch):
    """The per-shard MXU ±1-matmul count (Pallas interpreter on the CPU
    mesh; CBIRD_MXU=force bypasses the TPU-backend gate) must equal the
    VPU sharded count bit-for-bit."""
    from cbird_tpu.ops import mxu_count as mc
    from cbird_tpu.parallel.sharded import (_mxu_shard_rows, shard_rows,
                                            sharded_count_below)
    mc._INTERPRET = True  # must precede the first kernel trace
    n, q, t = 16384, 96, 9  # local shard 4096 = one BC column block
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    valid = rng.random(n) > 0.1
    needles = split_u64(np.concatenate(
        [hashes[:48], rng.integers(1, 2**63, 48, np.uint64)]))
    hs, ok = shard_rows(mesh, split_u64(hashes), valid)
    vpu = np.asarray(sharded_count_below(mesh, jnp.asarray(needles),
                                         hs, ok, t))
    monkeypatch.setenv("CBIRD_MXU", "force")
    assert _mxu_shard_rows(mesh, n, t)
    mxu = np.asarray(sharded_count_below(mesh, jnp.asarray(needles),
                                         hs, ok, t))
    assert np.array_equal(mxu, vpu)
    d = (np.bitwise_count(needles[:, None, 0]
                          ^ hashes.view(np.uint32).reshape(-1, 2)[None, :, 0])
         + np.bitwise_count(needles[:, None, 1]
                            ^ hashes.view(np.uint32).reshape(-1, 2)[None, :, 1]))
    want = ((d < t) & valid[None, :]).sum(axis=1).astype(np.int32)
    assert np.array_equal(mxu, want)


def test_sharded_self_count_mxu_interpret(mesh, rng, monkeypatch):
    """The MXU step of the balanced triangular self-count must equal the
    VPU step's counts bit-for-bit (CPU mesh, Pallas interpreter)."""
    from cbird_tpu.ops import mxu_count as mc
    from cbird_tpu.parallel.sharded import sharded_self_count
    mc._INTERPRET = True
    monkeypatch.setenv("CBIRD_MXU", "force")
    n, t = 8192, 6
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    for src, dst in [(5, 8000), (7200, 10), (100, 101), (0, n - 1)]:
        hashes[dst] = hashes[src] ^ np.uint64(1 << int(rng.integers(0, 64)))
    pairs = split_u64(hashes)
    valid = rng.random(n) > 0.05
    rep = jax.device_put(jnp.asarray(pairs))
    vrep = jax.device_put(jnp.asarray(valid))
    vpu = sharded_self_count(mesh, rep, vrep, t, rows=512, cols=2048)
    mxu = sharded_self_count(mesh, rep, vrep, t, rows=512, cols=2048,
                             use_mxu=True)
    assert np.array_equal(mxu, vpu)
    d = (np.bitwise_count(hashes[:, None] ^ hashes[None, :])).astype(np.int32)
    tri = ((d < t) & valid[None, :] & valid[:, None]
           & (np.arange(n)[None, :] > np.arange(n)[:, None]))
    assert np.array_equal(mxu, tri.sum(axis=1).astype(np.int32))
