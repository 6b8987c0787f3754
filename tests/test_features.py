"""ORB-style features + fdct/orb indexes: determinism, crop robustness
(the property these algorithms exist for, readme.md feature table),
voting semantics, end-to-end engine search."""

import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.ops.orb import extract_features_batch, features_per_level

pytestmark = pytest.mark.features  # slow: one-time ~3min ORB kernel compile


def textured(rng, h, w, n=40):
    img = np.full((h, w), 60, np.uint8)
    for _ in range(n):
        y, x = rng.integers(0, h - 20), rng.integers(0, w - 20)
        hh, ww = rng.integers(8, 50), rng.integers(8, 50)
        img[y:y + hh, x:x + ww] = rng.integers(0, 255)
    return img


@pytest.fixture(scope="module")
def trng():
    return np.random.default_rng(77)


def test_features_per_level_budget():
    b = features_per_level(400)
    assert sum(b) == 400
    assert b[0] > b[1] > b[2]  # geometric decay


def test_extract_shapes_and_determinism(trng):
    img = textured(trng, 320, 400)
    r1 = extract_features_batch([img], nfeatures=400)
    r2 = extract_features_batch([img], nfeatures=400)
    d1, h1 = r1[0]
    d2, h2 = r2[0]
    assert d1.shape[1] == 32 and len(d1) > 50
    assert len(h1) > 10
    assert np.array_equal(d1, d2)
    assert np.array_equal(h1, h2)


def test_crop_robustness_descriptors(trng):
    """A 56% crop must share many descriptors — the point of the cv
    features algo.  Keypoint-ROI hashes are weaker under crops: the
    unconditional longest-side-400 normalize (reference scanner.cpp:876)
    rescales crop content 1.33x relative to the original, so only ROIs
    whose pyramid octave absorbs the shift still align."""
    img = textured(trng, 320, 400)
    crop = np.ascontiguousarray(img[40:280, 60:360])
    (da, ha), (db, hb) = extract_features_batch([img, crop], nfeatures=400)

    pa = np.unpackbits(da, axis=1).astype(np.int32)
    pb = np.unpackbits(db, axis=1).astype(np.int32)
    d = (pb[:, None, :] != pa[None, :, :]).sum(-1)
    matched = (d.min(axis=1) < 25).sum()
    assert matched > len(db) * 0.3, f"only {matched}/{len(db)} crop descs matched"

    from cbird_tpu.ops.ref_numpy import hamming64
    close = sum(1 for x in hb if any(hamming64(int(x), int(y)) < 6 for y in ha))
    assert close > len(hb) * 0.15, f"only {close}/{len(hb)} kp hashes matched"


def test_scale_robustness_kp_hashes(trng):
    """Keypoint-ROI hashes MUST survive rescale — the reference's fdct
    guarantee (its harness is exactly the 40x5-sizes set,
    unit/testdctfeaturesindex.cpp:11): the longest-side-400 normalize puts
    every scale of an image on one canvas before detection."""
    from PIL import Image as PImage
    from cbird_tpu.ops.ref_numpy import hamming64
    img = textured(trng, 320, 400)
    s75 = np.asarray(PImage.fromarray(img).resize((300, 240), PImage.LANCZOS))
    (da, ha), (db, hb) = extract_features_batch([img, s75], nfeatures=400)
    assert len(hb) > 10
    close = sum(1 for x in hb if any(hamming64(int(x), int(y)) < 6 for y in ha))
    assert close > len(hb) * 0.4, f"only {close}/{len(hb)} kp hashes matched"


@pytest.fixture(scope="module")
def feat_engine(tmp_path_factory, trng):
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams
    root = str(tmp_path_factory.mktemp("featroot"))
    base_imgs = [textured(trng, 320, 400) for _ in range(4)]
    for i, im in enumerate(base_imgs):
        Image.fromarray(im).save(os.path.join(root, f"t{i}.png"))
        # heavy crop (~60% area) — dct hash usually misses these
        crop = im[30:290, 50:350]
        Image.fromarray(crop).save(os.path.join(root, f"t{i}_crop.png"))
    params = IndexParams()
    params.algos = (1 << 0) | (1 << 1) | (1 << 2)  # dct + fdct + orb
    params.minFileSize = 16
    eng = Engine(root, params)
    stats = eng.update()
    assert stats["added"] == 8, stats
    return eng, root


def _check_crop_found(eng, root, algo_name, thresh_param=None):
    from cbird_tpu.params import SearchParams
    sp = SearchParams()
    sp.set_param("alg", algo_name)
    found = 0
    for i in range(4):
        needle = eng.db.media_with_path(os.path.join(root, f"t{i}.png"))
        matches = eng.db.similar_to(needle, sp)
        if any(f"t{i}_crop" in m.path for m in matches):
            found += 1
    return found


def test_fdct_finds_crops(feat_engine):
    eng, root = feat_engine
    assert _check_crop_found(eng, root, "fdct") >= 3


def test_orb_finds_crops(feat_engine):
    eng, root = feat_engine
    assert _check_crop_found(eng, root, "orb") >= 3


def test_feature_index_remove_readd(feat_engine):
    from cbird_tpu.params import SearchParams
    eng, root = feat_engine
    sp = SearchParams()
    sp.set_param("alg", "orb")
    needle = eng.db.media_with_path(os.path.join(root, "t0.png"))
    before = {m.path for m in eng.db.similar_to(needle, sp)}
    victim = eng.db.media_with_path(os.path.join(root, "t0_crop.png"))
    eng.db.remove([victim.id])
    after = {m.path for m in eng.db.similar_to(needle, sp)}
    assert victim.path not in after
    stats = eng.update()
    assert stats["added"] == 1
    restored = {m.path for m in eng.db.similar_to(needle, sp)}
    assert victim.path in restored
    assert restored == before


def test_feature_sql_roundtrip(feat_engine, trng):
    """Index reloads from SQL (fresh engine) and produces the same matches."""
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams
    eng, root = feat_engine
    params = IndexParams()
    params.algos = 7
    eng2 = Engine(root, params)
    sp = SearchParams()
    sp.set_param("alg", "fdct")
    needle = eng2.db.media_with_path(os.path.join(root, "t1.png"))
    m1 = [(m.path, m.score) for m in eng.db.similar_to(needle, sp)]
    m2 = [(m.path, m.score) for m in eng2.db.similar_to(needle, sp)]
    assert m1 == m2


def test_rotation_robustness(trng):
    """Rotated BRIEF must survive moderate rotation (orb's 'rotation' claim
    in the reference feature table)."""
    from PIL import Image as PILImage
    img = textured(trng, 320, 400)
    rot = np.asarray(PILImage.fromarray(img).rotate(
        15, resample=PILImage.BILINEAR, fillcolor=60))
    (da, _), (db, _) = extract_features_batch([img, rot], nfeatures=400,
                                              want_hashes=False)
    pa = np.unpackbits(da, axis=1).astype(np.int32)
    pb = np.unpackbits(db, axis=1).astype(np.int32)
    d = (pb[:, None, :] != pa[None, :, :]).sum(-1)
    matched = (d.min(axis=1) < 25).sum()
    assert matched > len(db) * 0.3, f"{matched}/{len(db)} rotated descs matched"


def test_flat_cache_roundtrip(feat_engine):
    """Feature indexes persist flat caches under _index/cache and reload
    from them (reference dctfeatures.cache / cvfeatures.mat)."""
    import numpy as np
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams
    eng, root = feat_engine
    sp = SearchParams()
    sp.set_param("alg", "orb")
    needle = eng.db.media_with_path(os.path.join(root, "t2.png"))
    eng.db.similar_to(needle, sp)  # force load
    sp2 = SearchParams()
    sp2.set_param("alg", "fdct")
    eng.db.similar_to(needle, sp2)
    eng.db.save_indices()
    cache_dir = os.path.join(root, "_index", "cache")
    files = set(os.listdir(cache_dir))
    assert "cvfeatures.npz" in files and "dctfeatures.npz" in files

    # fresh engine must produce identical results through the cache path
    params = IndexParams()
    params.algos = 7
    eng2 = Engine(root, params)
    m1 = [(m.path, m.score) for m in eng.db.similar_to(needle, sp)]
    m2 = [(m.path, m.score) for m in eng2.db.similar_to(needle, sp)]
    assert m1 == m2
    # cache contents match the store arrays
    with np.load(os.path.join(cache_dir, "dctfeatures.npz")) as z:
        assert len(z["hashes"]) == len(z["ids"]) > 0


def test_orb_vote_gate():
    """The relative score gate keeps the true-match cluster and drops
    cross-base junk scoring far above the needle's best match (constants
    measured by experiments/orb_vote_gate.py; VERDICT r03 #7)."""
    from cbird_tpu.index.base import Match
    from cbird_tpu.index.cv_features_index import CvFeaturesIndex
    from cbird_tpu.params import SearchParams

    sp = SearchParams()
    assert sp.cvGate == 25  # default on
    needle_id = 1
    votes = [Match(needle_id, 0), Match(2, 36), Match(3, 309),
             Match(4, 772), Match(5, 9000)]  # 9000 = junk (>25x best 36)
    out = CvFeaturesIndex._gate(votes, needle_id, sp)
    assert [m.mediaId for m in out] == [1, 2, 3, 4]

    # floor: a very strong best match must not starve weak true siblings
    votes = [Match(2, 4), Match(3, 480)]
    out = CvFeaturesIndex._gate(votes, needle_id, sp)
    assert len(out) == 2

    # junk-only result sets pass through (reference behavior: return them)
    votes = [Match(2, 2166), Match(3, 24000)]
    out = CvFeaturesIndex._gate(votes, needle_id, sp)
    assert len(out) == 2

    # -p.ovg 0 disables
    sp.set_param("ovg", "0")
    votes = [Match(2, 36), Match(3, 9000)]
    assert len(CvFeaturesIndex._gate(votes, needle_id, sp)) == 2
