"""Template matcher: RANSAC similarity estimation, mutual matching, warp +
masked-hash verification, cache, engine integration
(reference unit/testtemplatematcher.cpp)."""

import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.host.template_matcher import (TemplateMatcher, _apply,
                                             _mutual_radius_match,
                                             estimate_similarity_ransac)
from cbird_tpu.params import IndexParams, SearchParams
from cbird_tpu.store.media import Media

pytestmark = pytest.mark.features  # shares the ORB kernel compile


def textured(rng, h, w, n=40):
    img = np.full((h, w), 60, np.uint8)
    for _ in range(n):
        y, x = rng.integers(0, h - 20), rng.integers(0, w - 20)
        hh, ww = rng.integers(8, 50), rng.integers(8, 50)
        img[y:y + hh, x:x + ww] = rng.integers(0, 255)
    return img


def test_ransac_exact_translation():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 300, size=(20, 2))
    q = p + np.array([13.0, -7.0])
    m = estimate_similarity_ransac(p, q)
    assert m is not None
    assert np.allclose(_apply(m, p), q, atol=0.1)


def test_ransac_with_outliers():
    rng = np.random.default_rng(1)
    p = rng.uniform(0, 300, size=(30, 2))
    th = 0.1
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]) * 1.2
    q = p @ rot.T + np.array([5.0, 9.0])
    q[::4] += rng.uniform(40, 90, size=(len(q[::4]), 2))  # 25% outliers
    m = estimate_similarity_ransac(p, q)
    assert m is not None
    err = np.linalg.norm(_apply(m, p) - q, axis=1)
    assert (err < 1.0).sum() >= len(p) * 0.7


def test_ransac_rejects_garbage():
    rng = np.random.default_rng(2)
    p = rng.uniform(0, 300, size=(20, 2))
    q = rng.uniform(0, 300, size=(20, 2))
    m = estimate_similarity_ransac(p, q)
    if m is not None:  # accidental fit must still have few inliers
        err = np.linalg.norm(_apply(m, p) - q, axis=1)
        assert (err < 3.0).sum() < 8


def test_mutual_radius_match():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, size=(10, 32), dtype=np.uint8)
    b = np.concatenate([a[5:], rng.integers(0, 255, size=(6, 32), dtype=np.uint8)])
    pairs = _mutual_radius_match(a, b, radius=25)
    got = {(ia, ib) for ia, ib in pairs}
    assert {(5, 0), (6, 1), (7, 2), (8, 3), (9, 4)} <= got


@pytest.fixture(scope="module")
def tm_setup(tmp_path_factory):
    rng = np.random.default_rng(42)
    root = str(tmp_path_factory.mktemp("tm"))
    img = textured(rng, 320, 400)
    other = textured(rng, 320, 400)
    Image.fromarray(img).save(os.path.join(root, "orig.png"))
    # shifted crop: the template should verify inside it
    canvas = np.full((400, 480), 30, np.uint8)
    canvas[50:370, 60:460] = img
    Image.fromarray(canvas).save(os.path.join(root, "shifted.png"))
    Image.fromarray(other).save(os.path.join(root, "other.png"))
    return root


def _media(root, name):
    from cbird_tpu.store.ioutil import full_md5_file
    p = os.path.join(root, name)
    with Image.open(p) as im:
        w, h = im.size
    m = Media(p, Media.TypeImage, w, h, full_md5_file(p), 0)
    return m


def test_template_match_accepts_shifted(tm_setup):
    root = tm_setup
    tm = TemplateMatcher()
    params = SearchParams()
    params.needleFeatures = 400
    params.haystackFeatures = 400
    tmpl = _media(root, "orig.png")
    cand = _media(root, "shifted.png")
    other = _media(root, "other.png")
    group = [cand, other]
    tm.match(tmpl, group, params)
    paths = [m.path for m in group]
    assert cand.path in paths, f"true match rejected (score {cand.score})"
    assert other.path not in paths, f"false match accepted (score {other.score})"
    assert cand.score < params.tmThresh
    assert cand.roi is not None and len(cand.roi) == 4
    assert cand.transform is not None


def test_tscale_shrinks_oversized_candidate():
    """-p.tscale caps the candidate's size relative to the template
    (reference src/templatematcher.cpp:171-192): behavior must change
    with the knob."""
    rng = np.random.default_rng(9)
    tmpl = textured(rng, 100, 120)
    cand = textured(rng, 800, 960)
    sp = SearchParams()
    sp.tmScalePct = 200
    out = TemplateMatcher._tscale(tmpl, cand, sp)
    assert max(out.shape) == 240  # 120 * 200%
    sp.tmScalePct = 400
    out = TemplateMatcher._tscale(tmpl, cand, sp)
    assert max(out.shape) == 480  # knob changes the result
    # candidate smaller than template: untouched
    small = textured(rng, 50, 60)
    assert TemplateMatcher._tscale(tmpl, small, sp) is small


def test_template_match_batched_group(tm_setup):
    """A multi-candidate group goes through one batched feature pass and
    still verifies the true match only."""
    root = tm_setup
    tm = TemplateMatcher()
    params = SearchParams()
    params.needleFeatures = 400
    params.haystackFeatures = 400
    tmpl = _media(root, "orig.png")
    calls = []
    orig_batch = tm._features_batch

    def counting(grays, nf):
        calls.append(len(grays))
        return orig_batch(grays, nf)

    tm._features_batch = counting
    group = [_media(root, "shifted.png"), _media(root, "other.png"),
             _media(root, "shifted.png")]
    tm.match(tmpl, group, params)
    # one 1-image pass for the template + ONE pass for all 3 candidates
    assert calls == [1, 3], calls
    assert {os.path.basename(m.path) for m in group} == {"shifted.png"}


def test_template_match_cache(tm_setup):
    root = tm_setup
    tm = TemplateMatcher()
    params = SearchParams()
    params.needleFeatures = 400
    params.haystackFeatures = 400
    tmpl = _media(root, "orig.png")
    g1 = [_media(root, "shifted.png")]
    tm.match(tmpl, g1, params)
    assert len(tm._cache) >= 1
    # second run hits the cache (no decode) and returns the same result
    g2 = [_media(root, "shifted.png")]
    tm.match(tmpl, g2, params)
    assert [m.path for m in g2] == [m.path for m in g1]
    assert g2[0].score == g1[0].score


def test_cross_scale_keypoint_geometry():
    """Keypoints of a native-size 0.75x rescaled pair must mutual-match at
    the TRUE similarity scale.  Regression for the pyramid map-back bug:
    level-l coordinates were multiplied by an extra 1.2^l, which cancelled
    for same-level (equal-size) pairs but skewed every cross-level match —
    this pair's matches then clustered at an apparent 0.75/1.2^2 = 0.52
    scale and the TemplateMatcher verified nothing at non-unit scale."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from corpus import photo_image

    from cbird_tpu.host.template_matcher import estimate_similarity_ransac

    rng = np.random.default_rng(17)
    arr = photo_image(rng, 280, 360)
    orig = Image.fromarray(arr)
    scaled = orig.resize((270, 210), Image.LANCZOS)  # 0.75x, native size
    g_t = np.asarray(orig.convert("L"))
    g_c = np.asarray(scaled.convert("L"))

    tm = TemplateMatcher()
    p = SearchParams()
    txs, tys, tdesc = tm._features(g_t, p.needleFeatures)
    cxs, cys, cdesc = tm._features(g_c, p.haystackFeatures)
    pairs = _mutual_radius_match(tdesc, cdesc, p.cvThresh)
    assert len(pairs) >= 10, f"too few mutual matches: {len(pairs)}"
    tp = np.array([[txs[a], tys[a]] for a, _ in pairs])
    cp = np.array([[cxs[b], cys[b]] for _, b in pairs])

    # most matches must already be consistent with the true transform
    err_true = np.linalg.norm(tp * 0.75 - cp, axis=1)
    frac = (err_true < 3.0).mean()
    assert frac >= 0.5, f"only {frac:.0%} of matches at the true scale"

    # and RANSAC must recover ~0.75 similarity scale from them
    tx = estimate_similarity_ransac(tp, cp)
    assert tx is not None
    s = float(np.hypot(tx[0, 0], tx[1, 0]))
    assert 0.70 < s < 0.80, f"estimated scale {s:.3f}, want ~0.75"
