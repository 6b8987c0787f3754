"""Commands layer: -with expression grammar, -rename, -nuke, weeds workflow
(reference src/commands.cpp, grammar src/res/usage.txt:183-207)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.cli.commands import (compile_filter, filter_groups,
                                    filter_selection, rename)
from cbird_tpu.cli.main import main
from cbird_tpu.store.media import Media

from fixtures import make_corpus, synth_image


def _m(path, w=100, h=50, score=-1):
    m = Media(path, Media.TypeImage, w, h, "md5x")
    m.score = score
    return m


# ---------------------------------------------------------------------------
# expression grammar
# ---------------------------------------------------------------------------

def test_expr_default_equals():
    pred = compile_filter("suffix", "jpg")
    assert pred(_m("/a/x.jpg"), None)
    assert not pred(_m("/a/x.png"), None)


def test_expr_binops():
    assert compile_filter("width", ">=100")(_m("/a", w=100), None)
    assert not compile_filter("width", ">100")(_m("/a", w=100), None)
    assert compile_filter("width", "!=99")(_m("/a", w=100), None)
    assert compile_filter("name", "~img")(_m("/a/img1.png"), None)
    assert compile_filter("name", "!img")(_m("/a/photo.png"), None)


def test_expr_regex():
    pred = compile_filter("name", r":img\d+\.png")
    assert pred(_m("/a/img12.png"), None)
    assert not pred(_m("/a/imgx.png"), None)


def test_expr_and_or():
    pred = compile_filter("width", ">=50&&<=150")
    assert pred(_m("/a", w=100), None)
    assert not pred(_m("/a", w=200), None)
    pred = compile_filter("suffix", "jpg||png")
    assert pred(_m("/a/x.png"), None)
    assert pred(_m("/a/x.jpg"), None)
    assert not pred(_m("/a/x.gif"), None)


def test_expr_empty():
    pred = compile_filter("md5", "!%empty")
    assert pred(_m("/a/x.jpg"), None)
    m = _m("/a/y.jpg")
    m.md5 = ""
    assert not pred(m, None)


def test_expr_needle():
    pred = compile_filter("width", "%needle")
    n = _m("/n", w=100)
    assert pred(_m("/a", w=100), n)
    assert not pred(_m("/a", w=90), n)
    # absolute difference: width within 15 of needle
    pred = compile_filter("width", "%<15")
    assert pred(_m("/a", w=90), n)
    assert not pred(_m("/a", w=80), n)


def test_filter_groups_keeps_needle():
    n = _m("/n.jpg", w=100)
    g = [n, _m("/a.jpg", w=100), _m("/b.jpg", w=300)]
    out = filter_groups([g], "width", "%<50")
    assert len(out) == 1
    assert [m.path for m in out[0]] == ["/n.jpg", "/a.jpg"]
    # all matches filtered -> group dropped
    out = filter_groups([g], "width", ">1000")
    assert out == []


# ---------------------------------------------------------------------------
# engine-backed commands
# ---------------------------------------------------------------------------

@pytest.fixture()
def small_index(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(21)
    for i in range(3):
        Image.fromarray(synth_image(rng, 160, 200)).save(
            os.path.join(root, f"photo{i:02d}.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    return root


def test_cli_with_filter(small_index, capsys):
    rc = main(["-use", small_index, "-select-all",
               "-with", "name", "~photo00", "-count"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1 items" in out


def test_cli_or_with(small_index, capsys):
    rc = main(["-use", small_index, "-select-all",
               "-with", "name", "~photo00",
               "-or-with", "name", "~photo01", "-count"])
    assert rc == 0
    assert "2 items" in capsys.readouterr().out


def test_rename_captures(small_index):
    rc = main(["-use", small_index, "-select-all",
               "-rename", r"photo(\d+)", "img_#1", "-count"])
    assert rc == 0
    names = sorted(os.listdir(small_index))
    assert "img_00.png" in names and "photo00.png" not in names
    # index follows the rename
    rc = main(["-use", small_index, "-select-path", ".", "-count"])
    assert rc == 0


def test_rename_sequence(small_index):
    rc = main(["-use", small_index, "-select-all", "-sort", "path",
               "-rename", "photo", "pic%n_"])
    assert rc == 0
    names = sorted(n for n in os.listdir(small_index) if n.endswith(".png"))
    assert names[0].startswith("pic1_")


def test_nuke_with_trash(small_index, tmp_path_factory, monkeypatch):
    trash = str(tmp_path_factory.mktemp("trash"))
    monkeypatch.setenv("CBIRD_TRASH_DIR", trash)
    rc = main(["-use", small_index, "-select-one",
               os.path.join(small_index, "photo01.png"), "-nuke"])
    assert rc == 0
    assert not os.path.exists(os.path.join(small_index, "photo01.png"))
    assert os.path.exists(os.path.join(trash, "photo01.png"))
    # gone from the index too
    rc = main(["-use", small_index, "-select-all", "-count"])
    assert rc == 0


def test_nuke_dups_in(tmp_path, monkeypatch):
    root = str(tmp_path)
    rng = np.random.default_rng(8)
    os.makedirs(os.path.join(root, "keep"))
    os.makedirs(os.path.join(root, "dupes"))
    img = synth_image(rng, 150, 180)
    Image.fromarray(img).save(os.path.join(root, "keep", "a.png"))
    Image.fromarray(img).save(os.path.join(root, "dupes", "a_copy.png"))
    Image.fromarray(synth_image(rng, 150, 180)).save(
        os.path.join(root, "dupes", "unique.png"))
    monkeypatch.delenv("CBIRD_TRASH_DIR", raising=False)
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    assert main(["-use", root, "-dups", "-nuke-dups-in", "dupes"]) == 0
    assert os.path.exists(os.path.join(root, "keep", "a.png"))
    assert not os.path.exists(os.path.join(root, "dupes", "a_copy.png"))
    assert os.path.exists(os.path.join(root, "dupes", "unique.png"))
    # md5-identical pairs are NOT weed-recorded (same digest would mark the
    # kept copy as a weed too; add_weed refuses, like the reference)
    assert not os.path.exists(os.path.join(root, "_index", "weeds.json"))


def test_select_type_and_id(small_index, capsys):
    rc = main(["-use", small_index, "-select-type", "i", "-count"])
    assert rc == 0
    assert "3 items" in capsys.readouterr().out
    rc = main(["-use", small_index, "-select-id", "1", "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data[0]["needle"]["id"] == 1


def test_sort_similar_and_first_sibling(small_index, capsys):
    rc = main(["-use", small_index, "-select-all", "-sort-similar", "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert len(data[0]["needle"] and data) >= 1
    rc = main(["-use", small_index, "-select-all", "-first-sibling", "-count"])
    assert rc == 0
    assert "1 items" in capsys.readouterr().out  # all files share one dir


def test_chop_selection(small_index, capsys):
    rc = main(["-use", small_index, "-select-all", "-chop", "-count"])
    assert rc == 0
    assert "2 items" in capsys.readouterr().out


def test_sort_rev(small_index, capsys):
    rc = main(["-use", small_index, "-select-all", "-sort-rev", "name", "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    names = [m["path"] for m in
             [data[0]["needle"]] + data[0]["matches"]]
    assert names == sorted(names, reverse=True)


def test_merge_selections(tmp_path, capsys):
    """-merge places each B item adjacent to its most-similar A item
    (reference -merge, src/main.cpp:1582-1651)."""
    root = str(tmp_path)
    rng = np.random.default_rng(77)
    os.makedirs(os.path.join(root, "a"))
    os.makedirs(os.path.join(root, "b"))
    for i in range(3):
        img = synth_image(rng, 200, 240)
        Image.fromarray(img).save(os.path.join(root, "a", f"base{i}.png"))
        # rescaled duplicate goes to set B
        Image.fromarray(img).resize((180, 150), Image.BOX).save(
            os.path.join(root, "b", f"dup{i}.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    rc = main(["-use", root, "-merge", "a", "b", "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    group = [data[0]["needle"]] + data[0]["matches"]
    names = [os.path.basename(m["path"]) for m in group]
    assert len(names) == 6
    # every dup must sit directly next to its base
    for i in range(3):
        assert abs(names.index(f"dup{i}.png") - names.index(f"base{i}.png")) == 1, names


def test_image_search_harness(small_index, capsys):
    """-test-image-search re-hashes every indexed image and must find each
    at 100% (reference src/commands.cpp:863-963)."""
    rc = main(["-use", small_index, "-select-all", "-test-image-search"])
    assert rc == 0
    out = capsys.readouterr().out
    dct_row = [l for l in out.splitlines() if "dct" in l and "fdct" not in l][0]
    assert "|   3 |   0 |   0.0" in dct_row, out


def test_multisort(tmp_path, capsys):
    """Consecutive -sort args form a multisort: first verb is the primary
    key (reference usage.txt:88-91)."""
    root = str(tmp_path)
    rng = np.random.default_rng(42)
    # two sizes x two prefixes so (suffixless) name and width disagree
    for name, w in (("a", 200), ("b", 100), ("c", 200), ("d", 100)):
        Image.fromarray(synth_image(rng, 100, w)).save(
            os.path.join(root, f"{name}.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    rc = main(["-use", root, "-select-all",
               "-sort", "width", "-sort-rev", "name", "-json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    names = [os.path.basename(m["path"]) for m in
             [data[0]["needle"]] + data[0]["matches"]]
    # primary: width ascending (100 first); secondary: name descending
    assert names == ["d.png", "b.png", "c.png", "a.png"], names


def test_without_and_slice(small_index, capsys):
    rc = main(["-use", small_index, "-select-all",
               "-without", "name", "~photo00", "-count"])
    assert rc == 0
    assert "2 items" in capsys.readouterr().out
    # -slice restricts -similar-to to the sliced subset
    rc = main(["-use", small_index, "-slice", ".", "-select-all", "-count"])
    assert rc == 0
