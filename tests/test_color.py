"""Color descriptor pipeline: Luv conversion, determinism, robustness
(mirror invariance, rescale), distance semantics, index contract."""

import numpy as np
import pytest

import jax.numpy as jnp

from cbird_tpu.ops.color import (NUM_COLORS, color_topk, create_descriptors,
                                 dequantize_luv, descriptor_num_colors,
                                 quantize_luv, rgb_to_luv)


def _color_image(rng, h=200, w=240, n_patches=8):
    """Color image with distinct solid patches — realistic k-means input."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = 40
    img[..., 1] = 90
    img[..., 2] = 150
    for _ in range(n_patches):
        y, x = rng.integers(0, h - 40), rng.integers(0, w - 40)
        hh, ww = rng.integers(25, 70), rng.integers(25, 70)
        img[y:y + hh, x:x + ww] = rng.integers(30, 255, size=3)
    return img


def test_luv_white_and_black():
    luv = np.asarray(rgb_to_luv(jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])))
    assert abs(luv[0, 0] - 100.0) < 0.1  # white L=100
    assert abs(luv[0, 1]) < 0.5 and abs(luv[0, 2]) < 0.5  # u,v ~ 0
    assert abs(luv[1, 0]) < 1e-3  # black L=0


def test_quantize_roundtrip():
    vals = np.array([[50.0, 0.0, 0.0], [100.0, 220.0, 122.0], [4.1, -134.0, -140.0]],
                    dtype=np.float32)
    q = quantize_luv(vals)
    back = dequantize_luv(q)
    assert np.allclose(back, vals, atol=0.01)


def test_descriptor_deterministic(rng):
    img = _color_image(rng)
    d1 = create_descriptors([img])[0]
    d2 = create_descriptors([img])[0]
    assert d1 is not None
    assert np.array_equal(d1, d2)


def test_descriptor_grayscale_none(rng):
    d = create_descriptors([None])[0]
    assert d is None


def test_descriptor_small_or_dark_none():
    # all-black image: every pixel filtered by L>4 → no descriptor
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    assert create_descriptors([img])[0] is None


def _dist(a, b):
    """Reference-semantics scalar distance for testing."""
    na, nb = descriptor_num_colors(a), descriptor_num_colors(b)
    if na == 0 or nb == 0 or abs(na - nb) > 2:
        return float("inf")
    ca = dequantize_luv(a[:NUM_COLORS, :3])
    cb = dequantize_luv(b[:NUM_COLORS, :3])
    if na < nb:
        ca, cb, na, nb = cb, ca, nb, na
    s = 1.0
    for i in range(na):
        s += min(np.linalg.norm(ca[i] - cb[j]) for j in range(nb))
    return s


def test_mirror_invariance(rng):
    """Color histogram must match mirrored images (readme.md:215)."""
    img = _color_image(rng)
    d0 = create_descriptors([img])[0]
    dm = create_descriptors([np.ascontiguousarray(img[:, ::-1])])[0]
    other = create_descriptors([_color_image(rng)])[0]
    assert _dist(d0, dm) < _dist(d0, other)


def test_rescale_robustness(rng):
    from PIL import Image
    img = _color_image(rng)
    half = np.asarray(Image.fromarray(img).resize((120, 100), Image.NEAREST))
    d0 = create_descriptors([img])[0]
    dh = create_descriptors([half])[0]
    other = create_descriptors([_color_image(rng, n_patches=6)])[0]
    assert _dist(d0, dh) < _dist(d0, other)


def test_color_topk_matches_scalar(rng):
    imgs = [_color_image(rng) for _ in range(5)]
    descs = create_descriptors(imgs)
    assert all(d is not None for d in descs)
    ncol = np.stack([dequantize_luv(d[:NUM_COLORS, :3]) for d in descs])
    ncnt = np.array([descriptor_num_colors(d) for d in descs], dtype=np.int32)
    scores, idx = color_topk(jnp.asarray(ncol.astype(np.float32)),
                             jnp.asarray(ncnt), jnp.asarray(ncol.astype(np.float32)),
                             jnp.asarray(ncnt), jnp.ones(5, bool), k=5)
    scores, idx = np.asarray(scores), np.asarray(idx)
    for q in range(5):
        for j in range(5):
            want = _dist(descs[q], descs[idx[q, j]])
            assert scores[q, j] == pytest.approx(want, rel=1e-4, abs=1e-2)
        # self distance must be minimal (=1.0)
        assert idx[q, 0] == q or scores[q, 0] <= scores[q, 1]
        assert scores[q, 0] == pytest.approx(1.0, abs=1e-3)


def test_color_index_end_to_end(rng, tmp_path):
    import os
    from PIL import Image
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams

    root = str(tmp_path)
    imgs = [_color_image(rng) for _ in range(4)]
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(os.path.join(root, f"c{i}.png"))
        Image.fromarray(im[:, ::-1]).save(os.path.join(root, f"c{i}_mirror.png"))

    params = IndexParams()
    params.algos = (1 << 0) | (1 << 3)  # dct + color
    params.minFileSize = 16
    eng = Engine(root, params)
    stats = eng.update()
    assert stats["added"] == 8

    sp = SearchParams()
    sp.set_param("alg", "color")
    sp.maxMatches = 2
    result = eng.db.similar(sp)
    assert result, "color search found nothing"
    # each image's best match should be its mirror twin
    twins = 0
    for group in result:
        base = os.path.basename(group[0].path).split("_")[0].split(".")[0]
        if any(os.path.basename(m.path).startswith(base + "_mirror") or
               os.path.basename(m.path) == base + ".png" for m in group[1:]):
            twins += 1
    assert twins >= len(result) // 2


def test_search_self_bucketed_matches_scan(rng, monkeypatch):
    """The count-bucketed one-sided N² (PackedColorStore._search_self_bucketed)
    must return the same hits as the unbucketed full scan for every row,
    across mixed numColors, tombstones, and zero-count rows."""
    from cbird_tpu.ops.color import PackedColorStore, quantize_luv

    n = 300
    descs = np.zeros((n, NUM_COLORS + 1, 4), dtype=np.uint16)
    luv = np.stack([rng.uniform(5, 95, (n, NUM_COLORS)),
                    rng.uniform(-80, 80, (n, NUM_COLORS)),
                    rng.uniform(-80, 80, (n, NUM_COLORS))], axis=-1)
    descs[:, :NUM_COLORS, :3] = quantize_luv(luv.astype(np.float32))
    descs[:, :NUM_COLORS, 3] = 100
    # spread counts over several buckets, incl. a zero-count row
    descs[:, NUM_COLORS, 0] = rng.integers(24, 32, n)
    descs[7, NUM_COLORS, 0] = 0
    # plant near-duplicates so there are sub-threshold pairs
    for s in range(0, 40, 2):
        descs[s + 1] = descs[s]
    store = PackedColorStore()
    store.add(descs, np.arange(1, n + 1, dtype=np.uint32))
    store.remove([5, 6])  # tombstones

    monkeypatch.setenv("CBIRD_COLOR_BUCKETS", "off")
    scan = store.search_self(k=12, sparse=True)
    monkeypatch.setenv("CBIRD_COLOR_BUCKETS", "on")
    fast = store.search_self(k=12, sparse=True)

    assert set(scan) == set(fast)
    for row in scan:
        ids_a, sc_a = scan[row]
        ids_b, sc_b = fast[row]
        assert np.array_equal(ids_a, ids_b), row
        np.testing.assert_allclose(sc_a, sc_b, rtol=1e-5, atol=1e-4)
