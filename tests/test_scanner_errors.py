"""Scanner resilience: corrupt/truncated files land in the typed error
registry, indexing continues (reference testscanner.cpp testCorruptedFiles,
-select-errors)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.cli.main import main
from cbird_tpu.host.engine import Engine
from cbird_tpu.host.scanner import (ERROR_JPEG_TRUNCATED, ERROR_LOAD, Scanner)
from cbird_tpu.params import IndexParams
from cbird_tpu.store.media import Media, property_func

from fixtures import synth_image

pytestmark = pytest.mark.smoke


@pytest.fixture()
def mixed_dir(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(17)
    for i in range(2):
        Image.fromarray(synth_image(rng, 150, 180)).save(
            os.path.join(root, f"good{i}.png"))
    # truncated jpeg (valid SOI, chopped tail)
    buf = io.BytesIO()
    Image.fromarray(synth_image(rng, 150, 180)).save(buf, "JPEG", quality=90)
    with open(os.path.join(root, "truncated.jpg"), "wb") as f:
        f.write(buf.getvalue()[:-200])
    # garbage with an image extension
    with open(os.path.join(root, "garbage.png"), "wb") as f:
        f.write(b"\x89PNG" + os.urandom(4000))
    return root


def test_corrupt_files_skipped_and_reported(mixed_dir):
    params = IndexParams()
    params.algos = 1
    params.minFileSize = 16
    eng = Engine(mixed_dir, params)
    stats = eng.update()
    assert stats["added"] == 2  # only the good files
    errs = stats["errors"]
    assert any("truncated" in p for p in errs)
    assert errs[os.path.join(mixed_dir, "truncated.jpg")] == ERROR_JPEG_TRUNCATED
    assert errs[os.path.join(mixed_dir, "garbage.png")] == ERROR_LOAD


def test_exif_property(tmp_path):
    rng = np.random.default_rng(4)
    p = str(tmp_path / "tagged.jpg")
    img = Image.fromarray(synth_image(rng, 120, 160))
    exif = Image.Exif()
    exif[0x0110] = "TestCam 3000"  # Model
    img.save(p, "JPEG", exif=exif.tobytes())
    m = Media(p, Media.TypeImage)
    assert property_func("exif:Model")(m) == "TestCam 3000"
    assert property_func("exif:Image.Model")(m) == "TestCam 3000"
    # missing tag is empty, not an error
    assert property_func("exif:FNumber")(m) == ""
