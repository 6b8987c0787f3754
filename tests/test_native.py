"""Native C++ host library: build, and bit-parity with the Python paths."""

import numpy as np
import pytest

from cbird_tpu import native

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no compiler available")
    return lib


def test_jpeg_payload_parity(lib):
    import io
    from PIL import Image
    from cbird_tpu.store import ioutil
    img = Image.fromarray((np.arange(64 * 64).reshape(64, 64) % 255
                           ).astype(np.uint8))
    exif = Image.Exif()
    exif[0x010F] = "camera"
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90, exif=exif.tobytes())
    data = buf.getvalue()

    off = native.jpeg_payload_offset(data)
    assert off > 0
    assert data[off] == 0xFF and data[off + 1] == 0xDA
    # python loop (bypassing the native shortcut) agrees
    i = 0
    payload_start = 0
    while i < len(data):
        if data[i] == 0xFF:
            i += 1
            if i < len(data):
                code = data[i]
                if code != 0xFF and code != 0x00 and (
                        0xD0 <= code <= 0xDD or 0xE0 <= code <= 0xEF):
                    start = i - 1
                    if 0xE1 <= code <= 0xEF:
                        if i + 2 < len(data):
                            i += (data[i + 1] << 8) | data[i + 2]
                    elif code == 0xDA and payload_start == 0:
                        payload_start = start
                if code != 0xFF:
                    i += 1
        else:
            i += 1
    assert off == payload_start


def test_window_compress_parity(lib, rng):
    from cbird_tpu.ops.ref_numpy import hamming64
    # mix of static runs and scene changes
    a = np.full(25, 0xAAAAAAAAAAAAAAAA, dtype=np.uint64)
    b = rng.integers(1, 2**63, size=25, dtype=np.uint64)
    c = np.full(25, 0x5555555555555555, dtype=np.uint64)
    hashes = np.concatenate([a, b, c])

    nf, nh = native.window_compress(hashes, 8)

    # reference python implementation
    frames = [0]
    kept = [hashes[0]]
    window = []
    for i in range(1, len(hashes)):
        h = int(hashes[i])
        close = sum(1 for prev in window if hamming64(prev, h) < 8)
        if close != len(window):
            window.clear()
            frames.append(i)
            kept.append(hashes[i])
        window.append(h)
    if frames[-1] != len(hashes) - 1:
        frames.append(len(hashes) - 1)
        kept.append(np.uint64(window[-1]))

    assert list(nf) == frames
    assert list(nh) == [int(x) for x in kept]


def test_hamming_knn_parity(lib, rng):
    hashes = rng.integers(1, 2**63, size=500, dtype=np.uint64)
    ids = np.arange(1, 501, dtype=np.uint32)
    ids[100:110] = 0  # tombstones
    needles = hashes[:5].copy()
    d, i = native.hamming_knn(hashes, ids, needles, k=8)
    for q in range(5):
        dist = np.array([bin(int(hashes[j] ^ needles[q])).count("1")
                         for j in range(500)])
        dist[ids == 0] = 10**6
        expect = np.sort(dist)[:8]
        assert list(d[q]) == list(expect)
        assert d[q][0] == 0 and i[q][0] == q  # self match


def test_compress_hash_run_uses_native(lib, rng):
    """The video path goes through the native code and matches tests in
    test_video.py (which exercise the same public function)."""
    from cbird_tpu.host.video import compress_hash_run
    h = np.full(50, 0x123456789ABCDEF, dtype=np.uint64)
    frames, kept = compress_hash_run(h, threshold=8)
    assert list(frames) == [0, 49]
