"""Interactive web browser: paging, thumbnails, and dedup actions that
write back to the Database (headless rebuild of the reference GUI,
src/gui/mediabrowser.{h,cpp} + mediagrouplistwidget.cpp)."""

import json
import os
import urllib.request

import numpy as np
import pytest
from PIL import Image

from cbird_tpu.cli.main import main
from fixtures import synth_image


def _get(url, timeout=10):
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


_tokens: dict = {}


def _token(base_url):
    """Session CSRF token, parsed out of the served page like the real
    client's JS does."""
    if base_url not in _tokens:
        import re
        _, body = _get(base_url)
        _tokens[base_url] = re.search(
            rb'TOKEN="([0-9a-f]+)"', body).group(1).decode()
    return _tokens[base_url]


def _post(url, payload, token=True):
    base = url.split("api/")[0]
    headers = {"X-Cbird-Token": _token(base)} if token else {}
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 method="POST", headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def browser(tmp_path, monkeypatch):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    rng = np.random.default_rng(31)
    for i in range(2):
        img = synth_image(rng, 160, 200)
        Image.fromarray(img).save(os.path.join(root, f"base{i}.png"))
        Image.fromarray(img).resize((150, 120), Image.BOX).save(
            os.path.join(root, f"dup{i}.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    monkeypatch.setenv("CBIRD_TRASH_DIR", str(tmp_path / "trash"))

    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams
    from cbird_tpu.cli.browser import serve_browser
    eng = Engine(root, IndexParams())
    groups = eng.db.similar(SearchParams())
    assert groups
    server, thread, url = serve_browser(eng.db, groups, title="t",
                                        max_per_page=1, block=False)
    yield eng, groups, url
    server.shutdown()
    thread.join(timeout=5)
    eng.db.close()


def test_browser_pages_and_thumbs(browser):
    eng, groups, url = browser
    status, body = _get(url)
    assert status == 200 and b"<html" in body
    status, body = _get(url + "api/groups?page=0")
    data = json.loads(body)
    assert data["pages"] == len(groups)  # max_per_page=1
    assert len(data["groups"]) == 1
    item = data["groups"][0]["items"][0]
    assert item["id"] > 0 and item["dims"]
    status, body = _get(url + f"thumb/{item['id']}")
    assert status == 200 and body[:2] == b"\xff\xd8"  # JPEG magic
    # out-of-range page clamps
    status, body = _get(url + "api/groups?page=99")
    assert json.loads(body)["page"] == data["pages"] - 1


def test_browser_actions(browser, tmp_path):
    eng, groups, url = browser
    _, data = _get(url + "api/groups?page=0")
    items = json.loads(data)["groups"][0]["items"]
    needle, other = items[0], items[1]

    # weed writes a weed pair; shows up in the payload
    status, resp = _post(url + "api/weed",
                         {"id": other["id"], "other": needle["id"]})
    assert status == 200 and resp.get("ok")
    m = eng.db.media_with_id(other["id"])
    assert eng.db.is_weed(m)
    _, data = _get(url + "api/groups?page=0")
    refreshed = json.loads(data)["groups"][0]["items"]
    assert any(it["weed"] for it in refreshed)
    status, resp = _post(url + "api/unweed", {"id": other["id"]})
    assert status == 200
    assert not eng.db.is_weed(m)

    # negative match recorded
    status, resp = _post(url + "api/negative",
                         {"id": other["id"], "other": needle["id"]})
    assert status == 200
    a, b = eng.db.media_with_id(other["id"]), eng.db.media_with_id(needle["id"])
    assert eng.db.is_negative_match(a, b)

    # delete: file moves to trash, row leaves the index
    victim_path = eng.db.media_with_id(other["id"]).path
    status, resp = _post(url + "api/delete", {"id": other["id"]})
    assert status == 200 and resp.get("ok")
    assert not os.path.exists(victim_path)
    assert os.path.exists(os.path.join(str(tmp_path / "trash"),
                                       os.path.basename(victim_path)))
    assert not eng.db.media_with_id(other["id"]).is_valid()
    # double delete errors cleanly
    status, resp = _post(url + "api/delete", {"id": other["id"]})
    assert status == 400 and "already" in resp["error"]

    # unknown id
    status, resp = _post(url + "api/delete", {"id": 999999})
    assert status == 400


def test_browser_replace(browser, tmp_path):
    """Replace (reference MediaPage::replaceFile): trash the selected pair
    member, then rename+move the kept file into its place."""
    eng, groups, url = browser
    pair = next(g for g in groups if len(g) == 2)
    kept, victim = pair[0], pair[1]
    kept_path, victim_path = kept.path, victim.path
    with open(kept_path, "rb") as f:
        kept_bytes = f.read()
    status, resp = _post(url + "api/replace", {"id": victim.id})
    assert status == 200 and resp.get("ok"), resp
    # victim is in the trash; the kept file took its name (same dir+suffix
    # here, so the path is reused with the survivor's content)
    assert os.path.exists(os.path.join(str(tmp_path / "trash"),
                                       os.path.basename(victim_path)))
    base = os.path.splitext(os.path.basename(victim_path))[0]
    suffix = os.path.splitext(kept_path)[1]
    new_path = os.path.join(os.path.dirname(victim_path), base + suffix)
    assert os.path.exists(new_path), new_path
    with open(new_path, "rb") as f:
        assert f.read() == kept_bytes  # survivor's content at victim's name
    assert not os.path.exists(kept_path)
    m = eng.db.media_with_id(kept.id)
    assert m.path == new_path
    assert not eng.db.media_with_id(victim.id).is_valid()
    # replace needs a pair: group now has 1 remaining item
    status, resp = _post(url + "api/replace", {"id": kept.id})
    assert status == 400 and "pair" in resp["error"]


def test_browser_rename_move(browser):
    """Rename and move actions (reference MediaGroupListWidget rename/move
    file actions): path updates on disk and in the Database, id preserved."""
    eng, groups, url = browser
    m = groups[0][0]
    old_path = m.path
    status, resp = _post(url + "api/rename", {"id": m.id, "name": "zz.png"})
    assert status == 200 and resp.get("ok"), resp
    ren = eng.db.media_with_id(m.id)
    assert os.path.basename(ren.path) == "zz.png"
    assert os.path.exists(ren.path) and not os.path.exists(old_path)

    status, resp = _post(url + "api/move", {"id": m.id, "dir": "sub"})
    assert status == 200 and resp.get("ok"), resp
    moved = eng.db.media_with_id(m.id)
    assert os.path.basename(os.path.dirname(moved.path)) == "sub"
    assert os.path.exists(moved.path)

    # escapes of the index root are rejected
    status, resp = _post(url + "api/move", {"id": m.id, "dir": "../esc"})
    assert status == 400 and "root" in resp["error"], resp
    # collision is rejected cleanly
    other = next(x for g in groups for x in g if x.id != m.id)
    status, resp = _post(url + "api/rename",
                         {"id": other.id,
                          "name": os.path.basename(other.path)})
    assert status == 400, resp


@pytest.mark.features  # TemplateMatcher runs the ORB kernel (compile tier)
def test_browser_template_match_overlay(tmp_path, monkeypatch):
    """/tmatch runs the TemplateMatcher on a pair and returns the candidate
    image with the matched ROI drawn (reference template-match action).
    Needs ORB corners, so it builds its own photo-statistics pair (the
    shared fixture's smooth sin/cos textures have no keypoints)."""
    sys_dir = os.path.dirname(__file__)
    import sys
    sys.path.insert(0, sys_dir)
    from corpus import photo_image
    root = str(tmp_path / "idx")
    os.makedirs(root)
    rng = np.random.default_rng(17)
    arr = photo_image(rng, 280, 360)
    Image.fromarray(arr).save(os.path.join(root, "orig.png"))
    Image.fromarray(arr).resize((270, 210), Image.LANCZOS).save(
        os.path.join(root, "scaled.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0

    from cbird_tpu.cli.browser import serve_browser
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams, SearchParams
    eng = Engine(root, IndexParams())
    groups = eng.db.similar(SearchParams())
    assert groups and len(groups[0]) == 2
    server, thread, url = serve_browser(eng.db, groups, title="t",
                                        block=False)
    try:
        a, b = groups[0][0], groups[0][1]
        # first call pays the ORB kernel compile when the cache is cold
        status, body = _get(url + f"tmatch?a={a.id}&b={b.id}", timeout=900)
        assert status == 200 and body[:2] == b"\xff\xd8", body[:40]  # JPEG
        status, body = _get(url + "tmatch?a=999&b=1000")
        assert status == 404
    finally:
        server.shutdown()
        thread.join(timeout=5)
        eng.db.close()


def test_browser_serves_original(browser):
    eng, groups, url = browser
    _, data = _get(url + "api/groups?page=0")
    item = json.loads(data)["groups"][0]["items"][0]
    status, body = _get(url + f"file/{item['id']}")
    assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    with open(eng.db.media_with_id(item["id"]).path, "rb") as f:
        assert body == f.read()


def test_browser_quality_and_diff(browser):
    """Quality scores compute on demand and show in the payload; /diff
    serves the A/B absolute-difference image for the compare overlay."""
    eng, groups, url = browser
    a, b = groups[0][0], groups[0][1]
    status, resp = _post(url + "api/quality", {"id": a.id})
    assert status == 200 and resp["quality"] > 0
    # quality is cached into the page payload
    status, body = _get(url + "api/groups?page=0")
    data = json.loads(body)
    got = {m["id"]: m["quality"] for g in data["groups"] for m in g["items"]}
    assert got[a.id] == resp["quality"]

    status, body = _get(url + f"diff?a={a.id}&b={b.id}")
    assert status == 200 and body[:2] == b"\xff\xd8"  # JPEG magic
    status, _ = _get(url + "diff?a=999&b=1")
    assert status == 404


def test_browser_csrf_token_required(browser):
    """POSTs without the page-embedded session token are rejected — a
    cross-origin page can't read the token, closing the CSRF surface on
    the process-launching and destructive endpoints."""
    eng, groups, url = browser
    mid = groups[0][0].id
    status, resp = _post(url + "api/delete", {"id": mid}, token=False)
    assert status == 403 and "token" in resp["error"]
    status, resp = _post(url + "api/open", {"id": mid}, token=False)
    assert status == 403


def test_build_index_folders():
    """Folders mode: groups keyed by first item's parent dir with item
    counts (reference MediaBrowser::showFolders)."""
    from cbird_tpu.cli.browser import build_index
    from cbird_tpu.store.media import Media
    a, b, c = (Media(f"/pre/d1/{n}.png", Media.TypeImage) for n in "abc")
    d, e = (Media(f"/pre/d2/{n}.png", Media.TypeImage) for n in "de")
    v = Media("/pre/d2/clip.mp4", Media.TypeVideo)
    keys, sets = build_index([[a, b], [a, c], [d, e], [v, d]], "folders")
    assert keys == sorted(keys) and set(keys) == set(sets)
    assert "d1 [x4]" in sets and len(sets["d1 [x4]"]) == 2
    assert "d2 [x2]" in sets  # image group under d2
    # a video group is keyed by file path, not directory
    assert any("clip.mp4" in k for k in keys)


def test_build_index_sets():
    """Sets mode: groups keyed by the pair of directories; non-pairs and
    singleton sets land in *unpaired* (reference MediaBrowser::showSets)."""
    from cbird_tpu.cli.browser import UNPAIRED_KEY, build_index
    from cbird_tpu.store.media import Media

    def m(p):
        return Media(p, Media.TypeImage)
    # two groups matching between the same two dirs -> one set
    g1 = [m("/pre/old/a.png"), m("/pre/new/a.png")]
    # needle in the OTHER dir: the unordered pair must land in the same set
    g2 = [m("/pre/new/b.png"), m("/pre/old/b.png")]
    g3 = [m("/pre/old/c.png")]                      # single dir -> unpaired
    g4 = [m("/pre/x/d.png"), m("/pre/y/d.png")]     # singleton set -> unpaired
    keys, sets = build_index([g1, g2, g3, g4], "sets")
    pair_key = [k for k in keys if k != UNPAIRED_KEY]
    assert pair_key == ["new/ ↔ old/"]  # canonical (sorted) dir order
    assert len(sets[pair_key[0]]) == 2
    assert len(sets[UNPAIRED_KEY]) == 2  # g3 + demoted g4
    # no unpaired entry when everything pairs
    keys2, sets2 = build_index([g1, g2], "sets")
    assert UNPAIRED_KEY not in sets2


def test_browser_index_view_and_select(browser):
    """/api/index serves folder cards; /api/groups?set= scopes paging;
    /api/select records the selection for -exit-on-select."""
    eng, groups, url0 = browser
    from cbird_tpu.cli.browser import serve_browser
    out = serve_browser(eng.db, groups, block=False, mode="folders",
                        exit_on_select=True)
    server, thread, url = out
    try:
        status, body = _get(url + "api/index")
        data = json.loads(body)
        assert status == 200 and data["mode"] == "folders"
        assert data["entries"], data
        en = data["entries"][0]
        assert en["groups"] >= 1 and en["thumb"] > 0
        # sortable folder-table columns (reference MediaGroupTableWidget
        # workflow): every entry carries bytes/mpix/score
        for e in data["entries"]:
            assert e["bytes"] > 0 and e["mpix"] > 0
            assert isinstance(e["score"], int)
        from urllib.parse import quote
        status, body = _get(url + "api/groups?page=0&set=" + quote(en["key"]))
        sub = json.loads(body)
        assert status == 200 and sub["total_groups"] == en["groups"]
        assert en["key"] in sub["title"]
        # page embeds the mode + select flag
        status, page = _get(url)
        assert b'MODE="folders"' in page and b"EXIT_ON_SELECT=true" in page
        # select shuts the server down and records the index
        status, resp = _post(url + "api/select", {"index": 3})
        assert status == 200 and resp["selected"] == 3
        assert server.__class__  # still referenced; shutdown is async
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_exit_on_select_cli_rc(tmp_path, monkeypatch):
    """-exit-on-select makes -browse return the selected index as the CLI
    exit code (reference usage.txt:119)."""
    import threading as _threading
    import time
    root = str(tmp_path / "sel")
    os.makedirs(root)
    rng = np.random.default_rng(5)
    Image.fromarray(synth_image(rng, 120, 160)).save(os.path.join(root, "a.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    monkeypatch.setenv("CBIRD_BROWSER_PORT", "18741")
    rc = {}

    def run():
        rc["v"] = main(["-use", root, "-select-all", "-group-by", "res",
                        "-exit-on-select", "-browse"])

    t = _threading.Thread(target=run, daemon=True)
    t.start()
    url = "http://127.0.0.1:18741/"
    for _ in range(100):
        try:
            _get(url)
            break
        except OSError:
            time.sleep(0.1)
    status, resp = _post(url + "api/select", {"index": 2})
    assert status == 200
    t.join(timeout=10)
    assert rc.get("v") == 2


def test_browser_update(tmp_path, monkeypatch):
    """Update button: kicks engine.update() in a worker, reports stats
    (headless -test-update equivalent)."""
    import time
    root = str(tmp_path / "idx2")
    os.makedirs(root)
    rng = np.random.default_rng(7)
    Image.fromarray(synth_image(rng, 120, 160)).save(os.path.join(root, "a.png"))
    assert main(["-use", root, "-i.algos", "dct", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams
    from cbird_tpu.cli.browser import serve_browser
    params = IndexParams()
    params.algos = 1
    params.minFileSize = 16
    eng = Engine(root, params)
    groups = [[m] for m in eng.db.all_media()]
    server, thread, url = serve_browser(eng.db, groups, block=False, engine=eng)
    try:
        # drop a new file, update through the API
        Image.fromarray(synth_image(rng, 120, 160)).save(os.path.join(root, "b.png"))
        status, resp = _post(url + "api/update", {})
        assert status == 200, resp
        # the page JS polls status with GET — must work without a body
        status, body = _get(url + "api/update_status")
        assert status == 200 and json.loads(body)["state"] in ("running", "done")
        for _ in range(120):
            status, st = _post(url + "api/update_status", {})
            if st["state"] == "done":
                break
            time.sleep(0.5)
        assert st["state"] == "done", st
        assert st["result"]["added"] == 1, st
        assert eng.db.count() == 2
    finally:
        server.shutdown()
        thread.join(timeout=5)
        eng.db.close()


def test_browser_video_compare(tmp_path):
    """Compare endpoint aligns two indexed videos from their .vdx hashes
    and /vframe serves decoded frames (VideoCompareWidget analog)."""
    from cbird_tpu.host.video import FseqBackend
    from test_video import make_frames
    root = str(tmp_path / "v")
    os.makedirs(root)
    full = make_frames(80, seed=3)
    FseqBackend.save(os.path.join(root, "full.fseq"), full, 10.0)
    FseqBackend.save(os.path.join(root, "clip.fseq"), full[30:70].copy(), 10.0)
    assert main(["-use", root, "-i.algos", "dct+video", "-i.fsize", "16",
                 "-create", "-update"]) == 0
    from cbird_tpu.host.engine import Engine
    from cbird_tpu.params import IndexParams
    from cbird_tpu.cli.browser import serve_browser
    eng = Engine(root, IndexParams())
    groups = [eng.db.all_media()]
    server, thread, url = serve_browser(eng.db, groups, block=False)
    try:
        a = eng.db.media_with_path(os.path.join(root, "clip.fseq")).id
        b = eng.db.media_with_path(os.path.join(root, "full.fseq")).id
        status, body = _get(url + f"api/compare?a={a}&b={b}")
        assert status == 200
        d = json.loads(body)
        assert 25 <= d["offset"] <= 35, d  # clip starts 30 frames in
        assert d["pairs"] and all(p["dist"] <= 8 for p in d["pairs"][:3]), d
        p = d["pairs"][0]
        status, img = _get(url + f"vframe/{a}/{p['a_frame']}")
        assert status == 200 and img[:2] == b"\xff\xd8"
        # payload marks videos so the UI shows the compare button
        _, gb = _get(url + "api/groups?page=0")
        assert all(it["video"] for it in json.loads(gb)["groups"][0]["items"])
    finally:
        server.shutdown()
        thread.join(timeout=5)
        eng.db.close()


def test_browser_open_reveal(browser, monkeypatch):
    """GUI Open / Open-location parity: /api/open and /api/reveal launch
    the configured desktop commands (reference DesktopHelper::openImage /
    revealPath, src/qtutil.cpp:379-446)."""
    import cbird_tpu.cli.commands as commands

    launched = []
    monkeypatch.setattr(commands, "_test_popen", None, raising=False)

    class FakeProc:
        pass

    def fake_popen(cmd, **kw):
        launched.append(cmd)
        return FakeProc()

    monkeypatch.setattr("subprocess.Popen", fake_popen)
    monkeypatch.setenv("CBIRD_OPEN_CMD", "my-viewer --flag")
    monkeypatch.setenv("CBIRD_REVEAL_CMD", "my-fm --select")
    monkeypatch.setattr("shutil.which", lambda name: "/usr/bin/" + name)

    eng, groups, url = browser
    _, data = _get(url + "api/groups?page=0")
    mid = json.loads(data)["groups"][0]["items"][0]["id"]
    status, resp = _post(url + "api/open", {"id": mid})
    assert status == 200 and resp.get("ok")
    status, resp = _post(url + "api/reveal", {"id": mid})
    assert status == 200 and resp.get("ok")
    assert launched[0][:2] == ["my-viewer", "--flag"]
    assert launched[1][:2] == ["my-fm", "--select"]
    assert launched[0][2] == launched[1][2]  # both got the media path
    status, resp = _post(url + "api/open", {"id": 999999})
    assert status == 400


def test_open_reveal_fallbacks(monkeypatch, tmp_path):
    """reveal_path falls back to opening the parent dir when no
    select-capable file manager exists."""
    from cbird_tpu.cli.commands import open_path, reveal_path

    launched = []
    monkeypatch.setattr("subprocess.Popen",
                        lambda cmd, **kw: launched.append(cmd))
    monkeypatch.delenv("CBIRD_OPEN_CMD", raising=False)
    monkeypatch.delenv("CBIRD_REVEAL_CMD", raising=False)
    f = tmp_path / "x.png"
    f.write_bytes(b"p")

    monkeypatch.setattr("shutil.which",
                        lambda name: "/usr/bin/xdg-open" if name == "xdg-open" else None)
    assert open_path(str(f))
    assert launched[-1] == ["xdg-open", str(f)]
    assert reveal_path(str(f))  # no nautilus/dolphin → xdg-open parent dir
    assert launched[-1] == ["xdg-open", str(tmp_path)]

    monkeypatch.setattr("shutil.which", lambda name: None)
    assert not open_path(str(f))


def test_browser_set_thumbnail(browser):
    """POST /api/thumb crops a region of pane A into <root>/thumb.png with
    a provenance comment (reference CropWidget::setIndexThumbnail,
    src/gui/cropwidget.cpp:30-140)."""
    eng, groups, url = browser
    m = groups[0][0]
    status, resp = _post(url + "api/thumb",
                         {"id": m.id, "x": 10, "y": 20, "w": 60, "h": 40})
    assert status == 200 and resp.get("ok"), resp
    tp = eng.db.thumb_path()
    assert os.path.exists(tp)
    with Image.open(tp) as th:
        assert th.size == (60, 40)
        comment = th.info.get("Comment", "")
    assert f"crop:10:20:60:40" in comment
    assert os.path.basename(m.path) in comment
    # pixel-exact: the crop equals the source region
    with Image.open(m.path) as src:
        want = np.asarray(src.convert("RGB").crop((10, 20, 70, 60)))
    assert np.array_equal(np.asarray(Image.open(tp).convert("RGB")), want)

    # re-crop preserves the original provenance comment (reference
    # cropwidget.cpp:58-68)
    status, resp = _post(url + "api/thumb",
                         {"id": m.id, "x": 0, "y": 0, "w": 30, "h": 30})
    assert status == 200 and resp.get("ok")
    with Image.open(tp) as th:
        assert th.info.get("Comment", "") == comment
        assert th.size == (30, 30)

    # out-of-bounds crop is an error, thumb untouched
    status, resp = _post(url + "api/thumb",
                         {"id": m.id, "x": 9999, "y": 0, "w": 10, "h": 10})
    assert status == 400 and "empty crop" in resp.get("error", "")

    # oversize crops scale to <=1024 on the longest side
    from cbird_tpu.store.thumbnail import save_index_thumb
    big = Image.fromarray(
        np.zeros((500, 3000, 3), np.uint8))
    os.remove(tp)
    save_index_thumb(eng.db.path(), big, rel_path="big.png")
    with Image.open(tp) as th:
        assert max(th.size) == 1024
