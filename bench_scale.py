"""500k-item search benchmarks for every algo, on the real chip.

Reference numbers at 500k images (readme.md:276-293 / BASELINE.md):
  dct   10 needles: 1.3 s      | N² thresh 5: 8.9 s
  fdct  10 needles: 1.5 s
  orb   10 needles: 84.4 s (partial disk cache)
  color 10 needles: DNF (no search structure; O(N) CPU scan)

This script builds synthetic stores at the same scale and measures the
device search paths.  Secondary evidence for BENCH — bench.py stays the
one-line contract; run this ad hoc: `python bench_scale.py [algos...]`.
"""

import sys
import time

import numpy as np


def _sync(x):
    return np.asarray(x)


def bench_dct(n=500_000, needles=10):
    import jax.numpy as jnp
    from cbird_tpu.ops.hamming import PackedHashStore
    rng = np.random.default_rng(0)
    store = PackedHashStore()
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    store.add(hashes, np.arange(1, n + 1, dtype=np.uint32))
    nh = hashes[rng.integers(0, n, needles)]
    store.search(nh, 5)  # compile (same shapes as the timed call)
    t0 = time.perf_counter()
    res = store.search(nh, 5)
    dt = time.perf_counter() - t0
    print(f"dct: {needles} needles vs {n / 1e3:.0f}k in {dt * 1000:.1f} ms "
          f"(reference 1.3 s → {1.3 / dt:,.0f}x)")


def bench_color(n=500_000, needles=10):
    import jax.numpy as jnp
    from cbird_tpu.ops.color import NUM_COLORS, PackedColorStore, quantize_luv
    rng = np.random.default_rng(1)
    # plausible Luv-ish clusters: L 5..95, u/v -80..80, weights descending
    descs = np.zeros((n, NUM_COLORS + 1, 4), dtype=np.uint16)
    luv = np.stack([rng.uniform(5, 95, (n, NUM_COLORS)),
                    rng.uniform(-80, 80, (n, NUM_COLORS)),
                    rng.uniform(-80, 80, (n, NUM_COLORS))], axis=-1)
    descs[:, :NUM_COLORS, :3] = quantize_luv(luv.astype(np.float32))
    descs[:, :NUM_COLORS, 3] = 100
    descs[:, NUM_COLORS, 0] = rng.integers(20, 32, n)
    store = PackedColorStore()
    store.add(descs, np.arange(1, n + 1, dtype=np.uint32))
    nd = [descs[i] for i in rng.integers(0, n, needles)]
    store.search(nd, k=16)  # compile (same shapes as the timed call)
    t0 = time.perf_counter()
    res = store.search(nd, k=16)
    dt = time.perf_counter() - t0
    hits = sum(int(r[0][0]) > 0 for r in res if len(r[0]))
    print(f"color: {needles} needles vs {n / 1e3:.0f}k in {dt:.2f} s, "
          f"{hits}/{needles} self-hits (reference: DNF at this scale)")


def bench_orb(n_images=500_000, desc_per_image=100, needles=10):
    """256-bit descriptor knn at 500k-image scale (the reference's FLANN
    LSH takes 84 s for 10 needles and needs a disk cache)."""
    from cbird_tpu.index.cv_features_index import _PackedDescStore
    rng = np.random.default_rng(2)
    n = n_images * desc_per_image  # 50M descriptors = 1.6 GB packed
    desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    ids = np.repeat(np.arange(1, n_images + 1, dtype=np.uint32),
                    desc_per_image)
    store = _PackedDescStore()
    store.add(desc, ids)
    q = desc[rng.integers(0, n, needles * desc_per_image)]
    store.knn(q)  # compile (same shapes as the timed call)
    t0 = time.perf_counter()
    store.knn(q)
    dt = time.perf_counter() - t0
    print(f"orb: {needles} needles ({len(q)} descriptors) vs {n / 1e6:.0f}M "
          f"stored descriptors in {dt:.2f} s (reference 84.4 s → "
          f"{84.4 / dt:,.0f}x)")


def bench_fdct(n_images=500_000, hashes_per_image=100, needles=10):
    from cbird_tpu.ops.hamming import PackedHashStore
    rng = np.random.default_rng(3)
    n = n_images * hashes_per_image
    store = PackedHashStore()
    store.add(rng.integers(1, 2**63, size=n, dtype=np.uint64),
              np.repeat(np.arange(1, n_images + 1, dtype=np.uint32),
                        hashes_per_image))
    q = store.hashes[rng.integers(0, n, needles * hashes_per_image)]
    store.search(q, 7, k=10)  # compile (same shapes as the timed call)
    t0 = time.perf_counter()
    store.search(q, 7, k=10)
    dt = time.perf_counter() - t0
    print(f"fdct: {needles} needles ({len(q)} kp-hashes) vs {n / 1e6:.0f}M "
          f"stored hashes in {dt:.2f} s (reference 1.5 s → {1.5 / dt:,.1f}x)")




def bench_video(n_videos=20_000, frames_per_video=500, needles=10):
    """Image→video frame search over 10M frames with per-video segment-min
    (the reference's RadixMap scan at this scale is the v0.8 '5-10x'
    headline, readme.md:326)."""
    from cbird_tpu.ops.video_search import PackedVideoStore
    rng = np.random.default_rng(4)
    store = PackedVideoStore()
    for v in range(n_videos):
        nf = frames_per_video
        store.add_video(v + 1, np.arange(nf, dtype=np.int32) * 10,
                        rng.integers(1, 2**63, size=nf, dtype=np.uint64))
    q = rng.integers(1, 2**63, size=needles, dtype=np.uint64)
    # plant a couple of near-dup needles so the sparse path extracts hits
    q[0] = store._pending[17][0][3] ^ np.uint64(3) if store._pending else q[0]
    store.search(q)  # compile (same shapes as the timed call)
    t0 = time.perf_counter()
    d, f = store.search(q)
    dt = time.perf_counter() - t0
    print(f"video: {needles} image needles vs {n_videos / 1e3:.0f}k videos / "
          f"{n_videos * frames_per_video / 1e6:.0f}M frames in "
          f"{dt * 1000:.0f} ms (dense [Q,V] segment-min kernel)")
    store.search_hits(q, 6)  # compile
    t0 = time.perf_counter()
    hits = store.search_hits(q, 6)
    dt = time.perf_counter() - t0
    n_hit = sum(len(h[0]) for h in hits if h is not None)
    print(f"video-sparse: same query via count+top-k hit extraction in "
          f"{dt * 1000:.0f} ms ({n_hit} frame hits extracted; the "
          f"production find path)")


def bench_vn2(n_videos=2_000, frames_per_video=500):
    """Video↔video N² dedup (findVideo temporal scoring over every pair;
    the reference searches per-needle RadixMap trees — no published number
    at this scale)."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    from cbird_tpu.params import SearchParams, TYPE_VIDEO
    from cbird_tpu.store.media import Media, VideoIndexData
    rng = np.random.default_rng(6)
    idx = DctVideoIndex()
    idx._loaded = True
    media = []
    clip_hashes = None
    for v in range(n_videos):
        nf = frames_per_video
        hashes = rng.integers(1, 2**63, size=nf, dtype=np.uint64)
        if v == 17:
            clip_hashes = hashes
        if v == 1500 and clip_hashes is not None:  # plant a duplicate clip
            hashes[100:300] = clip_hashes[150:350]
        m = Media(f"/x/{v}.mp4", TYPE_VIDEO, 128, 128, f"v{v}")
        m.id = v + 1
        m.videoIndex = VideoIndexData(
            frames=np.arange(nf, dtype=np.int32) * 10, hashes=hashes)
        idx._store.add_video(m.id, m.videoIndex.frames, m.videoIndex.hashes)
        media.append(m)
    sp = SearchParams()
    sp.skipFrames = 0
    idx.find_batch(media[:16], sp)  # compile, incl. the >8-needle gate path
    t0 = time.perf_counter()
    all_matches = idx.find_batch(media, sp)
    dt = time.perf_counter() - t0
    dup_pairs = sum(1 for mm in all_matches if mm)
    assert any(m.mediaId == 1501 for m in all_matches[17]), "planted clip lost"
    print(f"vn2: {n_videos / 1e3:.0f}k videos / "
          f"{n_videos * frames_per_video / 1e6:.0f}M frames all-pairs in "
          f"{dt:.1f} s, {dup_pairs} videos matched")


def bench_n2(n=500_000, dups=2_000):
    """N² self-search at 500k with a realistic dup density (reference N²
    thresh 5: 8.9 s, readme.md:276-280).  Uses the production two-phase
    scan: fused count-below gate, then top-k sort only for dup needles.
    An explicit size on the CLI (``bench_scale.py n2 30000000``) runs the
    STORE-level search_self at that scale instead (no 30M Media objects
    on a 1-core host) — the ≥30M robustness artifact of VERDICT r03 #8."""
    import sys as _sys
    sizes = [int(a) for a in _sys.argv[2:]]
    if sizes:
        from cbird_tpu.ops.hamming import PackedHashStore
        rng = np.random.default_rng(5)
        for sz in sizes:
            hashes = rng.integers(1, 2**63, size=sz, dtype=np.uint64)
            srcs = rng.choice(sz // 2, size=max(sz // 1000, 10),
                              replace=False) * 2
            for s in srcs:
                hashes[s + 1] = hashes[s] ^ (
                    np.uint64(1) << np.uint64(rng.integers(0, 64)))
            store = PackedHashStore()
            store.add(hashes, np.arange(1, sz + 1, dtype=np.uint32))
            t0 = time.perf_counter()
            res = store.search_self(5, k=64, sparse=True)
            dt = time.perf_counter() - t0
            print(f"n2: {sz / 1e6:.0f}M store-level self-search thresh 5 "
                  f"in {dt:.1f} s, {len(res)} hot rows "
                  f"({len(srcs)} planted pairs)", flush=True)
        return
    from cbird_tpu.index.dct_hash_index import DctHashIndex
    from cbird_tpu.params import SearchParams
    from cbird_tpu.store.media import Media
    rng = np.random.default_rng(5)
    hashes = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    # plant near-duplicate pairs (distance 1-3)
    for j in range(dups):
        src = rng.integers(0, n)
        h = int(hashes[src])
        for _ in range(int(rng.integers(1, 4))):
            h ^= 1 << int(rng.integers(0, 64))
        hashes[(src + 1) % n] = h
    idx = DctHashIndex()
    media = []
    for i in range(n):
        m = Media(f"/x/{i}.png", Media.TypeImage, 100, 100, f"m{i}")
        m.id = i + 1
        m.dctHash = np.uint64(hashes[i])
        media.append(m)
    idx.add(media)
    sp = SearchParams()
    needles = media
    idx.find_batch(needles, sp)  # warm run: compiles the triangle tiles
    t0 = time.perf_counter()
    all_matches = idx.find_batch(needles, sp)
    dt = time.perf_counter() - t0
    groups = sum(1 for mm in all_matches if mm)
    ref = f" (reference 8.9 s → {8.9 / dt:.1f}x)" if n == 500_000 else ""
    print(f"n2: {n / 1e3:.0f}k self-search thresh {sp.dctThresh} in "
          f"{dt:.2f} s, {groups} needles matched{ref}")


def bench_colorn2(n=None, needle_batch=1024):
    """Color N² self-search (VERDICT r03 #5): the reference DNFs color
    -similar at 500k (readme.md:293 — O(N·N) single-threaded CPU scan of
    the 32-color min-dist sum).  Pass sizes on the CLI:
    ``python bench_scale.py colorn2 50000 200000 1000000``."""
    import sys as _sys
    from cbird_tpu.ops.color import NUM_COLORS, PackedColorStore, quantize_luv
    sizes = [int(a) for a in _sys.argv[2:]] or [n or 50_000]
    rng = np.random.default_rng(1)
    n_max = max(sizes)
    descs = np.zeros((n_max, NUM_COLORS + 1, 4), dtype=np.uint16)
    luv = np.stack([rng.uniform(5, 95, (n_max, NUM_COLORS)),
                    rng.uniform(-80, 80, (n_max, NUM_COLORS)),
                    rng.uniform(-80, 80, (n_max, NUM_COLORS))], axis=-1)
    descs[:, :NUM_COLORS, :3] = quantize_luv(luv.astype(np.float32))
    descs[:, :NUM_COLORS, 3] = 100
    descs[:, NUM_COLORS, 0] = rng.integers(29, 32, n_max)  # worst case: no
    # numColors rejection partitioning (real corpora mostly saturate at 31)
    for sz in sizes:
        store = PackedColorStore()
        store.add(descs[:sz], np.arange(1, sz + 1, dtype=np.uint32))
        t0 = time.perf_counter()
        res = store.search_self(k=16, needle_batch=needle_batch, sparse=True)
        dt = time.perf_counter() - t0
        rate = sz * sz / dt
        print(f"colorn2: {sz / 1e3:.0f}k x {sz / 1e3:.0f}k self-search in "
              f"{dt:.1f} s ({rate / 1e9:.2f} G pairs/s, {len(res)} hot rows"
              f"; reference: DNF at 500k)", flush=True)


def bench_ingest(n_videos=8, frames=400, workers=(1, 2, 4)):
    """Concurrent video ingest (engine path): decode workers feed the
    shared device hasher; throughput should scale with workers until the
    chip or the host cores saturate."""
    import os
    import tempfile

    from cbird_tpu.host.video import FseqBackend, process_videos
    from cbird_tpu.params import IndexParams
    rng = np.random.default_rng(3)
    d = tempfile.mkdtemp(prefix="cbird_ingest")
    paths = []
    base = rng.integers(0, 255, size=(frames, 96, 120), dtype=np.uint8)
    for v in range(n_videos):
        p = os.path.join(d, f"v{v}.fseq")
        FseqBackend.save(p, np.roll(base, v * 7, axis=0), 25.0)
        paths.append(p)
    params = IndexParams()
    results = list(process_videos(paths, params, workers=1))  # warm/compile
    assert all(m is not None for _, m in results)
    cores = os.cpu_count()
    for w in workers:
        t0 = time.perf_counter()
        res = list(process_videos(paths, params, workers=w))
        dt = time.perf_counter() - t0
        ok = sum(1 for _, m in res if m is not None)
        print(f"ingest: {ok}/{n_videos} videos x {frames} frames, "
              f"workers={w}: {n_videos * frames / dt:,.0f} frames/s "
              f"({dt:.2f} s; decode is host-CPU-bound — {cores} core(s) "
              f"here, so workers>{cores} only add contention)")


if __name__ == "__main__":
    # numeric args are sizes consumed by the named bench, not bench names
    which = [a for a in sys.argv[1:] if not a.isdigit()] \
        or ["dct", "color", "orb", "fdct", "video"]
    for name in which:
        globals()[f"bench_{name}"]()
