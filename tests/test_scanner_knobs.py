"""Filesystem/pre-filter knobs: -i.resolve, -i.modtime, -p.crop take
effect (round-1 review: accepted-but-inert parameters).  Reference:
src/scanner.cpp:389-410 (resolve), :453-467 (modtime zip fast path),
src/engine.cpp:274-299 (modtime capability probe), src/index.cpp:128-130
(crop pre-filter)."""

import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.host.engine import Engine
from cbird_tpu.host.scanner import Scanner
from cbird_tpu.params import IndexParams, SearchParams
from cbird_tpu.store.media import Media

from fixtures import synth_image


def test_resolve_links_dedups_to_target(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(3)
    target = os.path.join(root, "orig.png")
    Image.fromarray(synth_image(rng, 140, 160)).save(target)
    os.symlink(target, os.path.join(root, "alias.png"))

    p = IndexParams()
    p.minFileSize = 16
    s = Scanner(p)
    res = s.scan_directory(root)
    # default: inode dedup keeps the first sighting — the LINK's path,
    # so a renamed/deleted link would force a reindex
    assert [os.path.basename(x) for x in res.new_images] == ["alias.png"]

    p.resolveLinks = True
    res = Scanner(p).scan_directory(root)
    assert [os.path.basename(x) for x in res.new_images] == ["orig.png"]


def test_modtime_skips_unchanged_zip(tmp_path, monkeypatch):
    root = str(tmp_path)
    rng = np.random.default_rng(4)
    zpath = os.path.join(root, "arch.zip")
    import io
    buf = io.BytesIO()
    Image.fromarray(synth_image(rng, 140, 160)).save(buf, "PNG")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("a.png", buf.getvalue())

    p = IndexParams()
    p.minFileSize = 16
    p.modTime = True
    s = Scanner(p)
    member = f"{zpath}:a.png"
    expected = {member: (1, 1, 1)}

    calls = []
    orig = Scanner._scan_archive

    def counting(self, path, exp, result):
        calls.append(path)
        return orig(self, path, exp, result)

    monkeypatch.setattr(Scanner, "_scan_archive", counting)
    # last add AFTER the zip's ctime: deep scan skipped, member kept
    res = s.scan_directory(root, expected,
                           mod_time=os.stat(zpath).st_ctime + 100)
    assert calls == [] and res.removed_ids == [] and res.new_images == []
    # last add BEFORE the zip's ctime (changed zip): deep scan runs
    res = s.scan_directory(root, dict(expected),
                           mod_time=os.stat(zpath).st_ctime - 100)
    assert calls == [zpath]


def test_engine_modtime_probe(tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    rng = np.random.default_rng(5)
    Image.fromarray(synth_image(rng, 140, 160)).save(
        os.path.join(root, "a.png"))
    p = IndexParams()
    p.minFileSize = 16
    p.algos = 1  # dct only
    eng = Engine(root, p)
    assert not p.modTime
    eng.update()
    # linux filesystems support metadata change time → auto-enabled
    assert p.modTime
    eng.db.close()


def test_query_crop_prefilter(tmp_path):
    """-p.crop de-letterboxes the needle before hashing: a letterboxed
    variant only matches its original with the pre-filter on."""
    root = str(tmp_path / "idx")
    os.makedirs(root)
    rng = np.random.default_rng(6)
    img = synth_image(rng, 200, 260)
    Image.fromarray(img).save(os.path.join(root, "orig.png"))
    p = IndexParams()
    p.minFileSize = 16
    p.algos = 1
    p.autocrop = False  # indexing pipeline crop off: -p.crop must still
    eng = Engine(root, p)  # de-letterbox the NEEDLE (src/index.cpp:128-130)
    eng.update()

    boxed = np.zeros((280, 260), np.uint8)  # letterbox (≥65% kept, so the
    boxed[40:240] = img                     # autocrop accepts the box)
    needle_path = str(tmp_path / "boxed.png")
    Image.fromarray(boxed).save(needle_path)

    sp = SearchParams()
    sp.dctThresh = 8
    plain = eng.query(Media(needle_path), sp)
    sp2 = SearchParams()
    sp2.dctThresh = 8
    sp2.autoCrop = True
    cropped = eng.query(Media(needle_path), sp2)
    assert any(m.path.endswith("orig.png") for m in cropped)
    assert not any(m.path.endswith("orig.png") for m in plain)
    eng.db.close()
