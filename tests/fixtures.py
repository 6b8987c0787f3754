"""Synthetic fixture corpus: N base images × M sizes, like the reference's
"40 images x 5 sizes" dataset (/root/reference/unit/testindexbase.cpp:121-123)
— every base image has rescaled duplicates that the index must group."""

import os

import numpy as np
from PIL import Image


def synth_image(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = rng.uniform(8, 40), rng.uniform(8, 40)
    img = 128 + 60 * np.sin(xx / fx) * np.cos(yy / fy)
    for _ in range(8):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(min(h, w) / 12, min(h, w) / 3)
        img += rng.uniform(-90, 90) * np.exp(
            -(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_corpus(root: str, n_base: int = 8, scales=(1.0, 0.75, 0.5, 0.4),
                size=(320, 400), fmt="png", seed: int = 99) -> dict[str, list[str]]:
    """@return base name -> list of file paths (one per scale)."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    out: dict[str, list[str]] = {}
    for i in range(n_base):
        base = synth_image(rng, *size)
        group = []
        for s in scales:
            im = Image.fromarray(base)
            if s != 1.0:
                im = im.resize((int(size[1] * s), int(size[0] * s)), Image.BOX)
            path = os.path.join(root, f"img{i:03d}_s{int(s * 100):03d}.{fmt}")
            im.save(path)
            group.append(path)
        out[f"img{i:03d}"] = group
    return out
