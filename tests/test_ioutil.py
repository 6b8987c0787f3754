"""IO utilities: atomic writes, jpeg payload isolation for metadata-invariant
md5 (reference src/scanner.cpp:904-978, src/ioutil.h)."""

import io
import os

import numpy as np
from PIL import Image

from cbird_tpu.store.ioutil import (find_jpeg_marker, full_md5,
                                    image_content_md5, jpeg_payload,
                                    write_file_atomically)

import pytest

pytestmark = pytest.mark.smoke


def _make_jpeg(exif: bytes | None = None) -> bytes:
    img = Image.fromarray(
        (np.arange(64 * 64).reshape(64, 64) % 255).astype(np.uint8))
    buf = io.BytesIO()
    if exif:
        img.save(buf, "JPEG", quality=90, exif=exif)
    else:
        img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


def test_find_jpeg_marker():
    data = _make_jpeg()
    is_jpeg, truncated = find_jpeg_marker(data)
    assert is_jpeg and not truncated
    is_jpeg, truncated = find_jpeg_marker(data[:-10])
    assert is_jpeg and truncated
    assert find_jpeg_marker(b"\x89PNG\r\n")[0] is False


def test_jpeg_payload_ignores_exif():
    """md5 must not change when only metadata (EXIF/APPn) changes."""
    plain = _make_jpeg()
    exif = Image.Exif()
    exif[0x010F] = "cbird-test-camera"  # Make tag
    tagged = _make_jpeg(exif=exif.tobytes())
    assert plain != tagged
    assert full_md5(plain) != full_md5(tagged)
    d1, j1, t1 = image_content_md5(plain)
    d2, j2, t2 = image_content_md5(tagged)
    assert j1 and j2 and not t1 and not t2
    assert d1 == d2  # payload digest invariant under metadata edit


def test_jpeg_payload_sensitive_to_content():
    a = _make_jpeg()
    img2 = Image.fromarray(np.full((64, 64), 99, dtype=np.uint8))
    buf = io.BytesIO()
    img2.save(buf, "JPEG", quality=90)
    b = buf.getvalue()
    assert image_content_md5(a)[0] != image_content_md5(b)[0]


def test_payload_starts_at_sos():
    data = _make_jpeg()
    p = jpeg_payload(data)
    assert p[0] == 0xFF and p[1] == 0xDA  # SOS marker
    assert data.endswith(p[-16:])


def test_write_file_atomically(tmp_path):
    target = tmp_path / "sub" / "file.bin"
    write_file_atomically(str(target), b"hello")
    assert target.read_bytes() == b"hello"
    write_file_atomically(str(target), b"world")
    assert target.read_bytes() == b"world"
    # no temp litter
    assert os.listdir(tmp_path / "sub") == ["file.bin"]


def test_jpeg_payload_native_python_parity():
    """The native memchr scan and the pure-Python find() fallback must
    return identical payloads on arbitrary marker soup (both rebuild the
    reference's offset semantics, src/scanner.cpp:927-964)."""
    from cbird_tpu import native
    from cbird_tpu.store import ioutil

    if native.load() is None:
        import pytest
        pytest.skip("no native lib/compiler in this environment")

    def python_payload(data: bytes) -> bytes:
        import unittest.mock as mock
        with mock.patch.object(ioutil, "jpeg_payload", ioutil.jpeg_payload):
            with mock.patch("cbird_tpu.native.jpeg_payload_offset",
                            lambda d: None):
                return ioutil.jpeg_payload(data)

    rng = np.random.default_rng(42)
    cases = [_make_jpeg(), b"", b"\xff", b"\xff\xda", b"\xff\xffxyz",
             b"\xff\xe1\x00\x04ab\xff\xda123", b"\xff\xe1\xff",
             b"\xff\xe1\x00\x00\xff\xda", b"\x00" * 16]
    for _ in range(200):  # FF-dense soup exercises every branch
        n = int(rng.integers(0, 64))
        raw = rng.integers(0, 256, n).astype(np.uint8)
        raw[rng.random(n) < 0.3] = 0xFF
        cases.append(raw.tobytes())
    for data in cases:
        assert python_payload(data) == ioutil.jpeg_payload(data), data.hex()
