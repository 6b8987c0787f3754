"""Video pipeline: vdx container, window compression, segment-min search,
temporal-adjacency scoring, end-to-end engine/CLI
(reference unit/testvideoindex.cpp, unit/testdctvideoindex.cpp)."""

import os

import numpy as np
import pytest

from cbird_tpu.host.video import FseqBackend, compress_hash_run, make_video_index
from cbird_tpu.params import IndexParams, SearchParams
from cbird_tpu.store.media import Media, VideoIndexData
from cbird_tpu.store.vdx import is_valid_vdx, load_vdx, save_vdx


# ---------------------------------------------------------------------------
# synthetic video: moving blob over drifting background — every frame hash
# differs so retained-frame density is high
# ---------------------------------------------------------------------------

def make_frames(n, h=96, w=120, seed=0, phase=0.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    frames = np.zeros((n, h, w), dtype=np.uint8)
    fx, fy = rng.uniform(6, 18), rng.uniform(6, 18)
    for t in range(n):
        a = phase + t * 0.21
        img = 120 + 60 * np.sin(xx / fx + a) * np.cos(yy / fy - 0.7 * a)
        cy = h / 2 + (h / 3) * np.sin(a * 0.9)
        cx = w / 2 + (w / 3) * np.cos(a * 1.1)
        img += 90 * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 13.0 ** 2)))
        frames[t] = np.clip(img, 0, 255)
    return frames


# ---------------------------------------------------------------------------
# vdx container
# ---------------------------------------------------------------------------

def test_vdx_roundtrip(tmp_path):
    idx = VideoIndexData(frames=np.array([0, 5, 9], np.int32),
                         hashes=np.array([123, 456, 2**63 + 7], np.uint64))
    p = str(tmp_path / "1.vdx")
    save_vdx(p, idx)
    back = load_vdx(p)
    assert np.array_equal(back.frames, idx.frames)
    assert np.array_equal(back.hashes, idx.hashes)
    assert is_valid_vdx(p)


def test_vdx_corrupt(tmp_path):
    p = str(tmp_path / "bad.vdx")
    with open(p, "wb") as f:
        f.write(b"garbage data not a vdx")
    assert not is_valid_vdx(p)
    with pytest.raises(ValueError):
        load_vdx(p)
    # truncated real file
    idx = VideoIndexData(frames=np.arange(10, dtype=np.int32),
                         hashes=np.arange(10).astype(np.uint64) + 1)
    good = str(tmp_path / "good.vdx")
    save_vdx(good, idx, compress=False)
    data = open(good, "rb").read()
    trunc = str(tmp_path / "trunc.vdx")
    with open(trunc, "wb") as f:
        f.write(data[:-8])
    assert not is_valid_vdx(trunc)


def _v1_bytes(frames, hashes):
    """Hand-build a legacy v1 file (u16 count|u16 frames|u64 hashes,
    reference src/videoindex.cpp:448-476)."""
    import struct
    out = struct.pack("<H", len(frames))
    out += np.asarray(frames, "<u2").tobytes()
    out += np.asarray(hashes, "<u8").tobytes()
    return out


def test_vdx_v2_byte_layout(tmp_path):
    """The written file matches the reference byte layout exactly:
    text header, u32 packed len, varint offsets, 8-byte alignment pad,
    raw hashes, 'cbir' trailer (src/videoindex.cpp:271-349)."""
    import struct
    idx = VideoIndexData(frames=np.array([0, 1, 300], np.int32),
                         hashes=np.array([7, 8, 9], np.uint64))
    p = str(tmp_path / "layout.vdx")
    save_vdx(p, idx)
    blob = open(p, "rb").read()
    header, rest = blob.split(b"\n", 1)
    f = header.split(b":")
    assert f[0] == b"cbird video index"
    assert (int(f[2]), int(f[3]), int(f[4]), int(f[5]), int(f[6])) == (2, 1, 1, 8, 3)
    (plen,) = struct.unpack_from("<I", rest, 0)
    # frame 0 → 0x00; offset 1 → 0x01; offset 299=0b100101011 → 0xAB,0x02
    assert rest[4:4 + plen] == bytes([0x00, 0x01, 0xAB, 0x02]) and plen == 4
    here = len(header) + 1 + 4 + plen
    pad = (-here) % 8
    off = 4 + plen + pad
    assert rest[4 + plen:off] == b"\x00" * pad
    assert np.array_equal(np.frombuffer(rest, "<u8", 3, off), [7, 8, 9])
    assert rest[off + 24:] == b"cbir"


def test_vdx_v1_read(tmp_path):
    """Legacy 16-bit v1 files load (the 'keep your old index' path)."""
    p = str(tmp_path / "old.vdx")
    with open(p, "wb") as f:
        f.write(_v1_bytes([0, 10, 500], [11, 22, 33]))
    assert is_valid_vdx(p)
    idx = load_vdx(p)
    assert list(idx.frames) == [0, 10, 500]
    assert list(idx.hashes) == [11, 22, 33]
    # wrong size → invalid (verify_v1 size check)
    with open(p, "ab") as f:
        f.write(b"x")
    assert not is_valid_vdx(p)


def test_vdx_v1_repair_quirks(tmp_path):
    """v1 wrap bug → truncate + 65535 sentinel; non-zero first frame →
    prepend 0/0 (src/videoindex.cpp:498-535)."""
    p = str(tmp_path / "wrap.vdx")
    with open(p, "wb") as f:  # wrapped after 65004: [.., 65004, 4, 5]
        f.write(_v1_bytes([0, 65004, 4, 5], [1, 2, 3, 4]))
    idx = load_vdx(p)
    assert list(idx.frames) == [0, 65004, 65535]
    assert len(idx.hashes) == 3
    p2 = str(tmp_path / "nonzero.vdx")
    with open(p2, "wb") as f:
        f.write(_v1_bytes([3, 9], [5, 6]))
    idx = load_vdx(p2)
    assert list(idx.frames) == [0, 3, 9]
    assert list(idx.hashes) == [0, 5, 6]
    p3 = str(tmp_path / "corrupt.vdx")
    with open(p3, "wb") as f:  # non-sequential but not a wrap → corrupt
        f.write(_v1_bytes([0, 100, 50], [1, 2, 3]))
    with pytest.raises(ValueError):
        load_vdx(p3)


def test_vdx_migrate(tmp_path):
    """-migrate: v1→v2 verified swap, invalid removal, wrap → resume file
    (src/videoindex.cpp:104-221)."""
    from cbird_tpu.store.vdx import migrate, vdx_version
    root = str(tmp_path)
    with open(os.path.join(root, "1.vdx"), "wb") as f:
        f.write(_v1_bytes([0, 10, 20], [5, 6, 7]))
    with open(os.path.join(root, "2.vdx"), "wb") as f:
        f.write(_v1_bytes([0, 65100, 7], [1, 2, 3]))  # wrapped → resume
    with open(os.path.join(root, "3.vdx"), "wb") as f:
        f.write(b"\xff\xff garbage of the wrong size")  # invalid v1
    ids = [(1, "md5one"), (2, "md5two"), (3, "md5three"), (4, "md5gone")]
    # dry run changes nothing
    migrate(ids, root, dry_run=True)
    assert vdx_version(open(os.path.join(root, "1.vdx"), "rb").read()) == 1
    updated, removed = migrate(ids, root)
    assert (updated, removed) == (1, 2)
    blob = open(os.path.join(root, "1.vdx"), "rb").read()
    assert vdx_version(blob) == 2
    idx = load_vdx(os.path.join(root, "1.vdx"))
    assert list(idx.frames) == [0, 10, 20] and list(idx.hashes) == [5, 6, 7]
    assert not os.path.exists(os.path.join(root, "2.vdx"))
    resume = os.path.join(root, "resume-md5two.vdx")
    assert os.path.exists(resume)
    assert list(load_vdx(resume).frames) == [0, 65100, 65535]
    assert not os.path.exists(os.path.join(root, "3.vdx"))
    # second run is a no-op
    assert migrate(ids, root) == (0, 0)


def test_process_video_resume(tmp_path):
    """A resume-<md5>.vdx left by -migrate keeps the stored run and
    resumes hashing at its last frame + 1 (src/scanner.cpp:1105-1116,
    src/media.cpp:930-937)."""
    from cbird_tpu.host.video import process_video
    from cbird_tpu.store.ioutil import full_md5_file
    frames = make_frames(40, seed=5)
    vid = str(tmp_path / "clip.fseq")
    FseqBackend.save(vid, frames, 10.0)
    params = IndexParams()
    full = process_video(vid, params)  # ground truth, no resume
    md5 = full_md5_file(vid)
    vdir = str(tmp_path / "video")
    os.makedirs(vdir)
    # pretend the first 25 frames were already indexed
    prior_n = int(np.searchsorted(full.videoIndex.frames, 25))
    prior = VideoIndexData(frames=full.videoIndex.frames[:prior_n].copy(),
                           hashes=full.videoIndex.hashes[:prior_n].copy())
    resume = os.path.join(vdir, f"resume-{md5}.vdx")
    save_vdx(resume, prior)
    m = process_video(vid, params, video_dir=vdir)
    assert m is not None
    assert not os.path.exists(resume)  # consumed
    got = m.videoIndex
    assert np.all(np.diff(got.frames) > 0)
    assert got.frames[0] == 0 and got.frames[-1] == 39
    # prior run is preserved verbatim; tail covers the remaining frames
    assert np.array_equal(got.frames[:prior_n], prior.frames)
    assert np.array_equal(got.hashes[:prior_n], prior.hashes)
    start = int(prior.frames[-1]) + 1
    assert got.frames[prior_n] == start  # first resumed frame always kept
    # resume point past the end → full re-hash fallback
    past = VideoIndexData(frames=np.array([0, 99], np.int32),
                          hashes=np.array([1, 2], np.uint64))
    save_vdx(resume, past)
    m2 = process_video(vid, params, video_dir=vdir)
    assert np.array_equal(m2.videoIndex.frames, full.videoIndex.frames)
    assert np.array_equal(m2.videoIndex.hashes, full.videoIndex.hashes)


# ---------------------------------------------------------------------------
# window compression
# ---------------------------------------------------------------------------

def test_compress_static_run():
    """A static video collapses to first + last frame."""
    h = np.full(50, 0x5555555555555555, dtype=np.uint64)
    frames, kept = compress_hash_run(h, threshold=8)
    assert list(frames) == [0, 49]
    assert len(kept) == 2


def test_compress_all_distinct():
    rng = np.random.default_rng(1)
    h = rng.integers(1, 2**63, size=20, dtype=np.uint64)
    frames, kept = compress_hash_run(h, threshold=8)
    # random hashes differ by ~32 bits — nothing dropped EXCEPT frame 1,
    # which the reference always drops: frame 0 doesn't seed the window, so
    # frame 1 compares against an empty window (count 0 == size 0 → skip;
    # src/media.cpp:1000-1012)
    assert list(frames) == [0] + list(range(2, 20))


def test_compress_threshold_zero_keeps_all():
    h = np.full(10, 7, dtype=np.uint64)
    frames, kept = compress_hash_run(h, threshold=0)
    assert list(frames) == list(range(10))


def test_compress_scene_change():
    a = np.full(30, 0xAAAAAAAAAAAAAAAA, dtype=np.uint64)
    b = np.full(30, 0x5555555555555555, dtype=np.uint64)
    frames, kept = compress_hash_run(np.concatenate([a, b]), threshold=8)
    assert 30 in list(frames)  # scene cut retained
    assert list(frames)[0] == 0 and list(frames)[-1] == 59


# ---------------------------------------------------------------------------
# fseq backend + make_video_index
# ---------------------------------------------------------------------------

def test_fseq_roundtrip(tmp_path):
    frames = make_frames(12)
    p = str(tmp_path / "clip.fseq")
    FseqBackend.save(p, frames, fps=10.0)
    be = FseqBackend()
    meta = be.probe(p)
    assert meta["width"] == 120 and meta["height"] == 96
    got = list(be.frames(p))
    assert len(got) == 12
    assert np.array_equal(got[0], frames[0])


def test_make_video_index(tmp_path):
    frames = make_frames(60, seed=2)
    idx = make_video_index(iter(frames), threshold=8)
    assert not idx.is_empty()
    assert idx.frames[0] == 0
    assert idx.frames[-1] == 59
    assert np.all(np.diff(idx.frames) > 0)
    assert len(idx.frames) == len(idx.hashes)


def test_parallel_video_ingest(tmp_path):
    """process_videos runs ≥4 decodes concurrently (a Barrier(4) in the
    decode path only releases when all four workers are inside it) and
    yields one result per file with per-file error isolation."""
    import threading

    from cbird_tpu.host import video as hv

    paths = []
    for i in range(4):
        p = str(tmp_path / f"v{i}.fseq")
        FseqBackend.save(p, make_frames(24, seed=i), 10.0)
        paths.append(p)
    bad = str(tmp_path / "broken.fseq")
    with open(bad, "wb") as f:
        f.write(b"not an npz")

    barrier = threading.Barrier(4, timeout=30)
    orig = FseqBackend.frames
    in_flight = []

    def gated(self, path, max_side=hv.DECODE_MAX_SIDE, start=0):
        barrier.wait(timeout=30)  # only passes with 4 decoders in flight
        in_flight.append(path)
        yield from orig(self, path, max_side, start)

    try:
        FseqBackend.frames = gated
        results = dict(hv.process_videos(paths, IndexParams(), workers=4))
    finally:
        FseqBackend.frames = orig
    assert len(in_flight) == 4 and not barrier.broken
    assert all(results[p] is not None and not results[p].videoIndex.is_empty()
               for p in paths)

    # the broken file isolates: others still index (serial path, 1 worker)
    results = dict(hv.process_videos([bad, paths[0]], IndexParams(), workers=1))
    assert results[bad] is None and results[paths[0]] is not None


def test_video_needle_image_algo(tmp_path):
    """-similar-to <video> with an image algo grabs evenly-spaced frames
    and queries them as image needles: the video's poster frames (indexed
    as images) must come back (reference src/main.cpp:1136-1196)."""
    from PIL import Image

    from cbird_tpu.host.engine import Engine

    root = str(tmp_path / "root")
    os.makedirs(root)
    full = make_frames(160, seed=7)
    FseqBackend.save(os.path.join(root, "full.fseq"), full, 25.0)
    # posters at exactly the grab targets total*i//10 (total=160)
    for i in (16, 80, 144):
        Image.fromarray(full[i]).save(os.path.join(root, f"poster{i}.png"))
    params = IndexParams()
    params.algos = (1 << 0) | (1 << 4)
    params.minFileSize = 64
    eng = Engine(root, params)
    stats = eng.update()
    assert stats["added"] == 4, stats
    sp = SearchParams()
    sp.algo = SearchParams.ALGO_DCT
    matches = eng.query(Media(os.path.join(root, "full.fseq")), sp)
    names = {os.path.basename(m.path) for m in matches}
    assert {"poster16.png", "poster80.png", "poster144.png"} <= names, names
    eng.db.close()


# ---------------------------------------------------------------------------
# end-to-end: index + video-to-video + image-to-video search
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def video_engine(tmp_path_factory):
    from cbird_tpu.host.engine import Engine
    root = str(tmp_path_factory.mktemp("vids"))
    full = make_frames(160, seed=7)          # the "original upload"
    clip = full[40:120].copy()               # re-cut excerpt of the original
    other = make_frames(160, seed=8, phase=3.3)  # unrelated video
    FseqBackend.save(os.path.join(root, "full.fseq"), full, 25.0)
    FseqBackend.save(os.path.join(root, "clip.fseq"), clip, 25.0)
    FseqBackend.save(os.path.join(root, "other.fseq"), other, 25.0)
    params = IndexParams()
    params.algos = (1 << 0) | (1 << 4)  # dct + video
    params.minFileSize = 64
    eng = Engine(root, params)
    stats = eng.update()
    assert stats["added"] == 3, stats
    return eng, root, full


def _video_params():
    sp = SearchParams()
    sp.set_param("alg", "video")
    sp.skipFrames = 5
    sp.minFramesMatched = 10
    sp.minFramesNear = 40
    return sp


def test_video_to_video(video_engine):
    eng, root, full = video_engine
    sp = _video_params()
    needle = eng.db.media_with_path(os.path.join(root, "clip.fseq"))
    assert needle.is_valid()
    matches = eng.db.similar_to(needle, sp)
    paths = [os.path.basename(m.path) for m in matches]
    assert "full.fseq" in paths, paths
    assert "other.fseq" not in paths
    m = matches[paths.index("full.fseq")]
    assert 0 <= m.score <= 60  # 100 - percentNear, mostly adjacent
    assert m.matchRange.is_valid()
    # matched range should sit ~40 frames into the full video
    assert 20 <= m.matchRange.dstIn <= 70


def test_image_to_video(video_engine):
    """An image needle (grabbed frame) finds the videos containing it."""
    eng, root, full = video_engine
    from cbird_tpu.ops.dct_hash import DctHasher
    from cbird_tpu.ops import ref_numpy
    frame = full[80]
    h = ref_numpy.dct_hash64(frame)
    sp = _video_params()
    needle = Media("frame.png", Media.TypeImage, 120, 96, "x", h)
    idx = eng.db.load_index(sp)
    matches = idx.find(needle, sp)
    ids = {m.mediaId for m in matches}
    full_id = eng.db.media_with_path(os.path.join(root, "full.fseq")).id
    clip_id = eng.db.media_with_path(os.path.join(root, "clip.fseq")).id
    assert full_id in ids
    assert clip_id in ids  # frame 80 is inside the clip (40..120)
    for m in matches:
        if m.mediaId == full_id:
            assert abs(m.range.dstIn - 80) <= 12  # nearest retained frame


def test_video_similar_all_pairs(video_engine):
    eng, root, full = video_engine
    sp = _video_params()
    groups = eng.db.similar(sp)
    # full<->clip pair must appear exactly once after group dedup
    pair_groups = [g for g in groups
                   if {os.path.basename(m.path) for m in g} >=
                   {"full.fseq", "clip.fseq"}]
    assert pair_groups, [ [m.path for m in g] for g in groups]


def test_video_remove(video_engine):
    eng, root, full = video_engine
    sp = _video_params()
    clip = eng.db.media_with_path(os.path.join(root, "clip.fseq"))
    eng.db.remove([clip.id])
    needle = eng.db.media_with_path(os.path.join(root, "full.fseq"))
    matches = eng.db.similar_to(needle, sp)
    assert not any("clip" in m.path for m in matches)
    # re-index restores it
    stats = eng.update()
    assert stats["added"] == 1
    matches = eng.db.similar_to(needle, sp)
    assert any("clip" in m.path for m in matches)


def test_unindexed_video_needle(video_engine, tmp_path):
    """-similar-to with a video file that isn't in the index: frames are
    hashed on the fly (reference Engine::query on-the-fly processing)."""
    eng, root, full = video_engine
    outside = str(tmp_path / "excerpt.fseq")
    FseqBackend.save(outside, full[30:110].copy(), 25.0)
    sp = _video_params()
    matches = eng.query(Media(outside, Media.TypeVideo), sp)
    assert any("full" in m.path for m in matches), \
        [m.path for m in matches]


def test_video_queue_ljf(tmp_path):
    """-i.ljf orders the video queue by estimated decode cost descending
    (reference src/scanner.cpp:159-206)."""
    from cbird_tpu.host.scanner import Scanner
    root = str(tmp_path)
    for name, n in (("short", 5), ("long", 50), ("mid", 20)):
        FseqBackend.save(os.path.join(root, f"{name}.fseq"),
                         make_frames(n, h=64, w=64, seed=1), 10.0)
    params = IndexParams()
    params.minFileSize = 16
    sc = Scanner(params)
    scan = sc.scan_directory(root)
    names = [os.path.basename(p).split(".")[0] for p in scan.new_videos]
    assert names == ["long", "mid", "short"]
    # non-ljf path: file-size descending
    params.estimateCost = False
    scan = sc.scan_directory(root)
    sizes = [os.path.getsize(p) for p in scan.new_videos]
    assert sizes == sorted(sizes, reverse=True)


def test_grab_frame_and_start(tmp_path):
    """Backend start= support + single-frame grab (reference frameGrab /
    accurate seek)."""
    from cbird_tpu.host.video import grab_frame
    frames = make_frames(30, seed=9)
    p = str(tmp_path / "c.fseq")
    FseqBackend.save(p, frames, 10.0)
    be = FseqBackend()
    got = list(be.frames(p, start=25))
    assert len(got) == 5
    assert np.array_equal(got[0], frames[25])
    f = grab_frame(p, 17)
    assert np.array_equal(f, frames[17])
    assert grab_frame(p, 99) is None


def test_decode_cmd_seek_ladder():
    """ffmpeg command construction: small starts use an exact frame-number
    select from 0; large starts input-seek with -ss + -copyts and a
    timestamp select (reference fast-then-accurate seek,
    src/videocontext.cpp:1642-1773)."""
    from cbird_tpu.host.video import SEEK_MIN_FRAMES, decode_cmd

    cmd = decode_cmd("v.mp4", 128, 72)
    assert "-ss" not in cmd and "select" not in cmd[cmd.index("-vf") + 1]

    cmd = decode_cmd("v.mp4", 128, 72, start=10, fps=25.0)
    assert "-ss" not in cmd
    assert "select=gte(n\\,10)," in cmd[cmd.index("-vf") + 1]

    # large start, known fps: keyframe seek 10s before target.  -ss is
    # file-relative (ffmpeg offsets by the container start_time itself);
    # only the select threshold carries start_time
    cmd = decode_cmd("v.mp4", 128, 72, start=25000, fps=25.0, start_time=0.5)
    seek_t = float(cmd[cmd.index("-ss") + 1])
    assert cmd.index("-ss") < cmd.index("-i")  # input seek, not output
    assert abs(seek_t - (25000 / 25.0 - 10.0)) < 1e-6
    assert "-copyts" in cmd and cmd.index("-copyts") > cmd.index("-i")
    vf = cmd[cmd.index("-vf") + 1]
    assert f"select=gte(t\\,{25000 / 25.0 + 0.5 - 0.02:.6f})," in vf

    # large start but target within the guard window of 0: plain select
    cmd = decode_cmd("v.mp4", 128, 72, start=SEEK_MIN_FRAMES, fps=60.0)
    assert "-ss" not in cmd
    assert f"select=gte(n\\,{SEEK_MIN_FRAMES})," in cmd[cmd.index("-vf") + 1]

    # unknown fps: never seek blind
    cmd = decode_cmd("v.mp4", 128, 72, start=100000, fps=0.0)
    assert "-ss" not in cmd
    assert "select=gte(n\\,100000)," in cmd[cmd.index("-vf") + 1]


def test_ffmpeg_rate_parse_and_vfr_guard(monkeypatch):
    """probe's rate parser survives '0/0' (mjpeg cover art) and unknown
    rates stay 0.0 (never a fabricated 25 driving a blind -ss seek);
    frames() falls back to the exact frame-number select when nominal and
    measured rates disagree (VFR content)."""
    from cbird_tpu.host.video import FfmpegBackend

    assert FfmpegBackend._parse_rate("0/0") == 0.0
    assert FfmpegBackend._parse_rate("") == 0.0
    assert FfmpegBackend._parse_rate(None) == 0.0
    assert FfmpegBackend._parse_rate("30000/1001") == pytest.approx(29.97, abs=0.01)
    assert FfmpegBackend._parse_rate("25") == 25.0

    captured = {}

    class FakeStdout:
        @staticmethod
        def read(n):
            return b""

        @staticmethod
        def close():
            pass

    class FakeProc:
        stdout = FakeStdout()

        @staticmethod
        def wait():
            pass

    monkeypatch.setattr("subprocess.Popen",
                        lambda cmd, **kw: captured.update(cmd=cmd) or FakeProc())
    meta = {"width": 1280, "height": 720, "fps": 30.0, "avg_fps": 27.5,
            "duration": 600.0, "start_time": 0.0}
    monkeypatch.setattr(FfmpegBackend, "probe", lambda self, p: dict(meta))
    be = FfmpegBackend()
    list(be.frames("v.mp4", start=25000))
    vf = captured["cmd"][captured["cmd"].index("-vf") + 1]
    assert "-ss" not in captured["cmd"] and "select=gte(n\\,25000)," in vf

    meta["avg_fps"] = 30.0  # CFR: keyframe seek engages
    list(be.frames("v.mp4", start=25000))
    assert "-ss" in captured["cmd"]

    meta["fps"] = meta["avg_fps"] = 0.0  # unknown rate: exact select
    list(be.frames("v.mp4", start=25000))
    assert "-ss" not in captured["cmd"]


def test_video_n2_batched_gate(monkeypatch):
    """find_batch with many video needles uses the batched device count
    gate; results must equal the per-needle search path."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    from cbird_tpu.ops import hamming
    from cbird_tpu.params import SearchParams, TYPE_VIDEO

    monkeypatch.setattr(hamming, "_MESH", None)
    rng = np.random.default_rng(8)
    idx = DctVideoIndex()
    idx._loaded = True
    media = []
    base = rng.integers(1, 2**63, size=120, dtype=np.uint64)
    for v in range(12):
        hashes = rng.integers(1, 2**63, size=120, dtype=np.uint64)
        if v == 2:
            hashes = base.copy()
        if v == 9:  # duplicate clip of video 2's middle
            hashes[10:90] = base[20:100]
        m = Media(f"/x/{v}.mp4", TYPE_VIDEO, 64, 64, f"v{v}")
        m.id = v + 1
        m.videoIndex = VideoIndexData(
            frames=np.arange(120, dtype=np.int32) * 10, hashes=hashes)
        idx._store.add_video(m.id, m.videoIndex.frames, m.videoIndex.hashes)
        media.append(m)
    sp = SearchParams()
    sp.skipFrames = 0
    batched = idx.find_batch(media, sp)          # gated path (>8 needles)
    single = [idx._find_video(m, sp) for m in media]
    for b, s in zip(batched, single):
        assert [(m.mediaId, m.score) for m in b] == \
               [(m.mediaId, m.score) for m in s]
    assert any(m.mediaId == 10 for m in batched[2])
    assert any(m.mediaId == 3 for m in batched[9])


def test_video_n2_batched_gate_sharded():
    """Same gated-vs-single equivalence over the 8-device conftest mesh:
    the gate runs through parallel.sharded.sharded_flat_counts and the
    detailed search through sharded_frame_search."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    from cbird_tpu.ops import hamming
    from cbird_tpu.params import SearchParams, TYPE_VIDEO

    assert hamming._search_mesh() is not None, "conftest mesh missing"
    rng = np.random.default_rng(8)
    idx = DctVideoIndex()
    idx._loaded = True
    media = []
    base = rng.integers(1, 2**63, size=120, dtype=np.uint64)
    for v in range(12):
        hashes = rng.integers(1, 2**63, size=120, dtype=np.uint64)
        if v == 2:
            hashes = base.copy()
        if v == 9:  # duplicate clip of video 2's middle
            hashes[10:90] = base[20:100]
        m = Media(f"/x/{v}.mp4", TYPE_VIDEO, 64, 64, f"v{v}")
        m.id = v + 1
        m.videoIndex = VideoIndexData(
            frames=np.arange(120, dtype=np.int32) * 10, hashes=hashes)
        idx._store.add_video(m.id, m.videoIndex.frames, m.videoIndex.hashes)
        media.append(m)
    sp = SearchParams()
    sp.skipFrames = 0
    batched = idx.find_batch(media, sp)
    single = [idx._find_video(m, sp) for m in media]
    for b, s in zip(batched, single):
        assert [(m.mediaId, m.score) for m in b] == \
               [(m.mediaId, m.score) for m in s]
    assert any(m.mediaId == 10 for m in batched[2])
    assert any(m.mediaId == 3 for m in batched[9])


def test_video_n2_gate_diverged_needle(monkeypatch):
    """A stored needle whose caller-supplied videoIndex DIVERGES from the
    stored .vdx must not have its cross hits undercounted by an assumed
    per-frame self-hit: self hits are derived from actual membership in
    the stored hash set."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    from cbird_tpu.ops import hamming
    from cbird_tpu.params import SearchParams, TYPE_VIDEO

    monkeypatch.setattr(hamming, "_MESH", None)
    rng = np.random.default_rng(21)
    idx = DctVideoIndex()
    idx._loaded = True
    media = []
    stored = []
    for v in range(12):
        hashes = rng.integers(1, 2**63, size=120, dtype=np.uint64)
        m = Media(f"/x/{v}.mp4", TYPE_VIDEO, 64, 64, f"v{v}")
        m.id = v + 1
        m.videoIndex = VideoIndexData(
            frames=np.arange(120, dtype=np.int32) * 10, hashes=hashes)
        idx._store.add_video(m.id, m.videoIndex.frames, m.videoIndex.hashes)
        stored.append(hashes)
        media.append(m)
    # needle 2's in-memory index was re-built and now matches video 5's
    # content — every frame hits video 5 exactly ONCE (c == 1); the old
    # "stored needle ⇒ self_hits=1" assumption gated these to zero
    media[1].videoIndex = VideoIndexData(
        frames=np.arange(120, dtype=np.int32) * 10,
        hashes=stored[4].copy())
    sp = SearchParams()
    sp.skipFrames = 0
    sp.filterSelf = True
    batched = idx.find_batch(media, sp)
    assert any(m.mediaId == 5 for m in batched[1]), \
        "diverged stored needle lost its only cross-video match"


def test_video_n2_empty_store(monkeypatch):
    """>8 video needles against an empty store: empty results, no crash
    (the gate path must not index a zero-length media_ids array)."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    from cbird_tpu.ops import hamming
    from cbird_tpu.params import SearchParams, TYPE_VIDEO

    monkeypatch.setattr(hamming, "_MESH", None)
    idx = DctVideoIndex()
    idx._loaded = True
    media = []
    for v in range(10):
        m = Media(f"/x/{v}.mp4", TYPE_VIDEO, 64, 64, f"v{v}")
        m.id = v + 1
        m.videoIndex = VideoIndexData(
            frames=np.arange(20, dtype=np.int32),
            hashes=np.arange(1, 21, dtype=np.uint64))
        media.append(m)
    sp = SearchParams()
    sp.skipFrames = 0
    assert idx.find_batch(media, sp) == [[] for _ in media]


def _minima_store(seed=3, videos=20, tombstone=6):
    """DctVideoIndex with random small-space hashes (dense near-collisions)
    plus planted near-duplicate needles; returns (idx, needles)."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    rng = np.random.default_rng(seed)
    idx = DctVideoIndex()
    idx._loaded = True
    stored = []
    for v in range(videos):
        n = int(rng.integers(5, 60))
        hashes = rng.integers(1, 1 << 16, size=n, dtype=np.uint64)
        idx._store.add_video(v + 1, np.arange(n, dtype=np.int32) * 7, hashes)
        stored.append(hashes)
    idx._store.remove([tombstone])
    needles = rng.integers(1, 1 << 16, size=24, dtype=np.uint64)
    # plant exact + near (≤2 bit flips) copies of stored hashes, including
    # hashes of the tombstoned video (must never match)
    plants = [stored[0][0], stored[1][2] ^ np.uint64(3),
              stored[tombstone - 1][1], stored[videos - 1][-1] ^ np.uint64(9)]
    needles = np.concatenate([needles, np.array(plants, np.uint64)])
    return idx, needles


def _assert_minima_match_dense(idx, needles, thresh):
    sparse = idx._per_video_minima(needles, thresh)
    d, f = idx._store.search(needles)
    for r in range(len(needles)):
        slots = np.nonzero(d[r] < thresh)[0]
        s, dd, ff = sparse[r]
        assert s.tolist() == slots.tolist(), r
        assert dd.tolist() == d[r, slots].tolist(), r
        assert ff.tolist() == f[r, slots].tolist(), r


def test_sparse_minima_match_dense(monkeypatch):
    """_per_video_minima (search_hits sparse extraction) must equal the
    dense [Q, V] kernel per-video minima, incl. tombstoned videos and
    (dist, frame) tie-breaks."""
    from cbird_tpu.ops import hamming
    monkeypatch.setattr(hamming, "_MESH", None)
    idx, needles = _minima_store()
    _assert_minima_match_dense(idx, needles, thresh=6)


def test_sparse_minima_fallback_parity(monkeypatch):
    """Needles whose hit count overflows k_cap fall back to the dense
    kernel; mixed sparse/fallback batches stay bit-identical to dense."""
    from cbird_tpu.ops import hamming
    monkeypatch.setattr(hamming, "_MESH", None)
    idx, needles = _minima_store(seed=4)
    orig = idx._store.search_hits
    monkeypatch.setattr(
        idx._store, "search_hits",
        lambda h, t, **kw: orig(h, t, k_cap=1))
    # with k_cap=1 every multi-hit needle returns None (fallback)
    assert any(r is None for r in idx._store.search_hits(needles, 12))
    _assert_minima_match_dense(idx, needles, thresh=12)


def test_search_hits_exact_vs_numpy(monkeypatch):
    """search_hits returns exactly the sub-threshold (row, dist) set of a
    brute-force numpy scan (rows of tombstoned videos excluded)."""
    from cbird_tpu.ops import hamming
    monkeypatch.setattr(hamming, "_MESH", None)
    idx, needles = _minima_store(seed=5)
    store = idx._store
    thresh = 8
    hits = store.search_hits(needles, thresh)
    store._consolidate()
    alive = np.array([bool(m) for m in store.media_ids])[store._vidx]
    for r, h in enumerate(hits):
        x = np.bitwise_xor(store._hashes, needles[r])
        dist = np.array([bin(v).count("1") for v in x.tolist()])
        want = np.nonzero((dist < thresh) & alive)[0]
        assert h is not None
        rows, dd = h
        order = np.argsort(rows)
        assert rows[order].tolist() == want.tolist(), r
        assert dd[order].tolist() == dist[want].tolist(), r


def test_sparse_minima_sharded():
    """Sparse extraction over the 8-device conftest mesh (sharded counts +
    sharded top-k with global rows) equals the dense sharded kernel."""
    from cbird_tpu.ops import hamming
    assert hamming._search_mesh() is not None, "conftest mesh missing"
    idx, needles = _minima_store(seed=6)
    _assert_minima_match_dense(idx, needles, thresh=6)


def test_video_n2_all_pairs_path(monkeypatch):
    """Stored, non-diverged needles resolve through the triangular
    all-pairs self-search — the flat count gate must not run — and the
    results equal the per-needle path, including a nonzero trim window."""
    from cbird_tpu.index.dct_video_index import DctVideoIndex
    from cbird_tpu.ops import hamming
    from cbird_tpu.params import SearchParams, TYPE_VIDEO

    monkeypatch.setattr(hamming, "_MESH", None)
    rng = np.random.default_rng(11)
    idx = DctVideoIndex()
    idx._loaded = True
    media = []
    base = rng.integers(1, 2**63, size=120, dtype=np.uint64)
    for v in range(12):
        hashes = rng.integers(1, 2**63, size=120, dtype=np.uint64)
        if v == 3:
            hashes = base.copy()
        if v == 7:  # duplicate clip of video 3's middle
            hashes[15:95] = base[25:105]
        m = Media(f"/x/{v}.mp4", TYPE_VIDEO, 64, 64, f"v{v}")
        m.id = v + 1
        m.videoIndex = VideoIndexData(
            frames=np.arange(120, dtype=np.int32) * 10, hashes=hashes)
        idx._store.add_video(m.id, m.videoIndex.frames, m.videoIndex.hashes)
        media.append(m)
    sp = SearchParams()
    sp.skipFrames = 40  # nonzero trim window (reference default is 300)
    sp.minFramesMatched = 10

    def boom(*a, **k):
        raise AssertionError("flat count gate ran — all-pairs path skipped")
    monkeypatch.setattr(idx._store, "flat_hit_counts", boom)
    batched = idx.find_batch(media, sp)
    monkeypatch.undo()
    monkeypatch.setattr(hamming, "_MESH", None)
    single = [idx._find_video(m, sp) for m in media]
    for b, s in zip(batched, single):
        assert [(m.mediaId, m.score,
                 (m.range.srcIn, m.range.dstIn, m.range.len)) for m in b] \
            == [(m.mediaId, m.score,
                 (m.range.srcIn, m.range.dstIn, m.range.len)) for m in s]
    assert any(m.mediaId == 8 for m in batched[3])
    assert any(m.mediaId == 4 for m in batched[7])
