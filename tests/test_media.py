"""Media model, archive virtual paths, and the property expression engine
(reference src/media.cpp:333-770, unit/testpath.cpp)."""

import numpy as np

from cbird_tpu.store.media import (Media, archive_paths, expand_group_list,
                                   group_by, is_archived, merge_group_list,
                                   property_func, sort_group, sort_group_list)

import pytest

pytestmark = pytest.mark.smoke


def test_archive_paths():
    assert is_archived("/a/b.zip:member.jpg")
    assert not is_archived("/a/b/c.jpg")
    assert archive_paths("/a/b.zip:x/y.jpg") == ("/a/b.zip", "x/y.jpg")
    assert archive_paths("/a/b/c.jpg") == ("", "/a/b/c.jpg")


def test_media_paths():
    m = Media("/data/photos/img001.JPG", Media.TypeImage, 800, 600, "abc", 42)
    assert m.name() == "img001.JPG"
    assert m.suffix() == "jpg"
    assert m.dir_path() == "/data/photos"
    assert m.parent_path() == "/data/photos"
    assert m.resolution() == 480000
    z = Media("/data/arch.zip:sub/im.png", Media.TypeImage)
    assert z.name() == "im.png"
    assert z.parent_path() == "/data/arch.zip"
    assert z.dir_path() == "/data"


def test_property_func():
    m = Media("/data/photos/img010.jpg", Media.TypeImage, 800, 600, "abc", 42)
    assert property_func("name")(m) == "img010.jpg"
    assert property_func("suffix")(m) == "jpg"
    assert property_func("resolution")(m) == 480000
    assert property_func("name#upper")(m) == "IMG010.JPG"
    assert property_func("name#mid,3,3")(m) == "010"


def test_sort_natural():
    paths = ["/a/img10.jpg", "/a/img2.jpg", "/a/img1.jpg"]
    group = [Media(p) for p in paths]
    sort_group(group, ["name"])
    assert [m.name() for m in group] == ["img1.jpg", "img2.jpg", "img10.jpg"]


def test_group_by():
    ms = [Media("/a/x.jpg"), Media("/a/y.png"), Media("/b/z.jpg")]
    groups = group_by(ms, "suffix")
    assert len(groups) == 2


def test_expand_groups():
    a, b, c = Media("/a"), Media("/b"), Media("/c")
    out = expand_group_list([[a, b, c]])
    assert len(out) == 2
    assert out[0] == [a, b] and out[1] == [a, c]


def test_merge_groups():
    a, b, c, d = (Media(p) for p in "/a /b /c /d".split())
    out = merge_group_list([[a, b], [b, c], [d]])
    assert len(out) == 2
    merged = {m.path for m in out[0]} | {m.path for m in out[1]}
    assert merged == {"/a", "/b", "/c", "/d"}
    sizes = sorted(len(g) for g in out)
    assert sizes == [1, 3]


def test_sort_group_list():
    g1 = [Media("/b/1.jpg")]
    g2 = [Media("/a/1.jpg")]
    groups = [g1, g2]
    sort_group_list(groups, ["path"])
    assert groups[0][0].path == "/a/1.jpg"
