"""Video utility verbs: -video-thumbnail, -compare-videos, -migrate."""

import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.cli.main import main
from cbird_tpu.host.video import FseqBackend

from test_video import make_frames

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vtools"))
    full = make_frames(80, seed=3)
    FseqBackend.save(os.path.join(root, "full.fseq"), full, 25.0)
    # same content shifted by 20 frames
    FseqBackend.save(os.path.join(root, "shifted.fseq"), full[20:], 25.0)
    return root, full


def test_video_thumbnail(video_dir):
    root, full = video_dir
    rc = main(["-video-thumbnail", os.path.join(root, "full.fseq"), "7"])
    assert rc == 0
    out = os.path.join(root, "full-frame7.png")
    assert os.path.exists(out)
    got = np.asarray(Image.open(out))
    assert np.array_equal(got, full[7])


def test_video_thumbnail_out_of_range(video_dir):
    root, _ = video_dir
    rc = main(["-video-thumbnail", os.path.join(root, "full.fseq"), "9999"])
    assert rc == 2


def test_compare_videos(video_dir, capsys):
    root, _ = video_dir
    rc = main(["-compare-videos", os.path.join(root, "full.fseq"),
               os.path.join(root, "shifted.fseq")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "alignment offset:" in out
    # shifted clip starts at frame 20 of the full video -> offset ~ -20
    offset = int(out.split("alignment offset:")[1].split()[0])
    assert -25 <= offset <= -15, out
    assert os.path.exists(os.path.join(root, "compare.png"))
    # aligned NLE project (reference "compare in kdenlive")
    import xml.etree.ElementTree as ET
    proj = os.path.join(root, "compare.kdenlive")
    assert os.path.exists(proj)
    mlt = ET.parse(proj).getroot()
    producers = mlt.findall("producer")
    assert len(producers) == 2
    resources = [p.findtext("property[@name='resource']") for p in producers]
    assert resources[0].endswith("full.fseq")
    assert resources[1].endswith("shifted.fseq")
    playlists = mlt.findall("playlist")
    assert len(playlists) == 2
    ins = [int(pl.find("entry").get("in")) for pl in playlists]
    # clip A is cued ~20 frames (at 25fps -> ~24 template frames) after B
    diff_tmpl = ins[0] - ins[1]
    assert 15 <= diff_tmpl <= 32, ins
    tracks = mlt.find("tractor").findall("track")
    assert [t.get("producer") for t in tracks] == ["playlist0", "playlist1"]


def test_migrate(video_dir):
    root, _ = video_dir
    assert main(["-use", root, "-i.algos", "dct+video", "-i.fsize", "64",
                 "-create", "-update"]) == 0
    vdir = os.path.join(root, "_index", "video")
    before = {f: os.path.getsize(os.path.join(vdir, f))
              for f in os.listdir(vdir)}
    assert before
    assert main(["-use", root, "-migrate"]) == 0
    # still valid and loadable
    from cbird_tpu.store.vdx import is_valid_vdx
    for f in before:
        assert is_valid_vdx(os.path.join(vdir, f))


def test_video_thumbnail_writes_index_thumb(video_dir):
    """With an index present, -video-thumbnail also writes the collection
    thumbnail <root>/thumb.png with frame provenance (reference
    src/main.cpp:1790-1800 → CropWidget::setIndexThumbnail)."""
    root, full = video_dir
    assert main(["-use", root, "-i.algos", "", "-create"]) == 0
    rc = main(["-use", root, "-video-thumbnail",
               os.path.join(root, "full.fseq"), "5"])
    assert rc == 0
    tp = os.path.join(root, "thumb.png")
    assert os.path.exists(tp)
    with Image.open(tp) as th:
        comment = th.info.get("Comment", "")
        got = np.asarray(th.convert("RGB"))
    assert "frame:5" in comment and "full.fseq" in comment
    assert np.array_equal(got, np.stack([full[5]] * 3, axis=-1))
