"""Quality score + jpeg quality estimator (reference unit/testquality.cpp):
sharper images must outscore their blurred versions; the jpeg estimate must
track the encoder's quality setting."""

import io

import numpy as np
import pytest
from PIL import Image, ImageFilter

from cbird_tpu.ops.quality import quality_score
from cbird_tpu.store.jpeg_quality import estimate_jpeg_quality, parse_dqt_tables


def _detailed(rng, h=240, w=300):
    """Photo-like: smooth structure + fine texture.  (Perfect synthetic step
    edges produce EQUAL adjacent neighbor-diffs, which the strict local-max
    edge test rejects — in the reference too — so boxes alone score ~0.)"""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 120 + 60 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
    img += rng.normal(0, 18, size=(h, w))  # fine detail
    return np.clip(img, 0, 255).astype(np.uint8)


def test_blur_lowers_score(rng):
    img = _detailed(rng)
    sharp = quality_score(img)
    blurred = np.asarray(Image.fromarray(img).filter(ImageFilter.GaussianBlur(3)))
    soft = quality_score(blurred)
    assert sharp > 0
    assert sharp > soft, (sharp, soft)


def test_tiny_image_scores_zero():
    assert quality_score(np.zeros((40, 40), np.uint8)) == 0


def test_rgb_input(rng):
    img = _detailed(rng)
    rgb = np.stack([img, img, img], axis=2)
    assert quality_score(rgb) > 0


def _jpeg_bytes(img, quality):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_parse_dqt(rng):
    data = _jpeg_bytes(_detailed(rng), 75)
    tables = parse_dqt_tables(data)
    assert 0 in tables
    assert len(tables[0]) == 64


def test_jpeg_quality_tracks_encoder(rng):
    img = _detailed(rng)
    estimates = {}
    for q in (30, 60, 90):
        est = estimate_jpeg_quality(_jpeg_bytes(img, q))
        assert est is not None
        estimates[q] = est
        assert abs(est - q) <= 12, f"encoder q={q} estimated {est}"
    assert estimates[30] < estimates[60] < estimates[90]


def test_jpeg_quality_not_jpeg():
    assert estimate_jpeg_quality(b"\x89PNG\r\n\x1a\n....") is None
