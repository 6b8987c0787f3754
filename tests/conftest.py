"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/collective paths are exercised without TPU hardware (mirrors the
reference's hardware-free unit suite, /root/reference/unit/)."""

import os

# must be set before jax initializes a backend; force cpu even if the
# session environment points at a TPU (tests must be hardware-free)
os.environ["JAX_PLATFORMS"] = os.environ.get("CBIRD_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize hook force-updates jax_platforms to "axon,cpu" at
# interpreter start, overriding the env var — override it back
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the ORB pyramid programs take ~3 min to
# compile on one CPU core; cache them across test runs (CI restores this
# directory via actions/cache)
_cache_dir = os.environ.get(
    "CBIRD_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def synth_image(rng, h, w, kind="blobs"):
    """Deterministic synthetic grayscale test image with real structure."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    for _ in range(6):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(min(h, w) / 10, min(h, w) / 3)
        amp = rng.uniform(-80, 80)
        img += amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def images(rng):
    """A small corpus of structured grayscale images of varied sizes."""
    sizes = [(400, 400), (300, 450), (450, 280), (128, 128), (64, 96),
             (33, 47), (32, 32), (500, 200)]
    return [synth_image(rng, h, w) for h, w in sizes]
