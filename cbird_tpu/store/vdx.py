"""Per-video hash file (.vdx) — versioned container for frame hash sequences.

Rebuild of the reference VideoIndex container
(/root/reference/src/videoindex.{h,cpp}): logical content is two parallel
arrays, retained frame numbers + their 64-bit DCT hashes.  The v2 on-disk
format starts with a text magic + format metadata and optionally compresses
the payload (reference writes a "cbird video index" text header, endianness
byte and zlib option, src/videoindex.cpp:223-255).

This implementation always writes little-endian v2 with zlib, and reads any
v2 file it wrote; ``is_valid_vdx`` performs the same sanity checks the
reference applies when verifying index integrity on -update
(src/engine.cpp:115-139).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .ioutil import write_file_atomically
from .media import VideoIndexData

MAGIC = b"cbird video index\n"
VERSION = 2
_FLAG_ZLIB = 1

# header: magic, u8 version, u8 endianness (0=little), u8 flags, u8 pad,
#         u32 frame count
_HEADER = struct.Struct("<BBBBI")


def save_vdx(path: str, index: VideoIndexData, compress: bool = True) -> None:
    frames = np.asarray(index.frames, dtype=np.int32)
    hashes = np.asarray(index.hashes, dtype=np.uint64)
    assert len(frames) == len(hashes), "corrupt video index"
    payload = frames.tobytes() + hashes.tobytes()
    flags = 0
    if compress:
        payload = zlib.compress(payload, level=6)
        flags |= _FLAG_ZLIB
    blob = MAGIC + _HEADER.pack(VERSION, 0, flags, 0, len(frames)) + payload
    write_file_atomically(path, blob)


def load_vdx(path: str) -> VideoIndexData:
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(MAGIC):
        raise ValueError(f"not a cbird video index: {path}")
    off = len(MAGIC)
    version, endian, flags, _, count = _HEADER.unpack_from(blob, off)
    if version != VERSION or endian != 0:
        raise ValueError(f"unsupported vdx version {version} (endian {endian}): {path}")
    payload = blob[off + _HEADER.size:]
    if flags & _FLAG_ZLIB:
        payload = zlib.decompress(payload)
    want = count * (4 + 8)
    if len(payload) != want:
        raise ValueError(f"truncated vdx payload ({len(payload)} != {want}): {path}")
    frames = np.frombuffer(payload[:count * 4], dtype=np.int32).copy()
    hashes = np.frombuffer(payload[count * 4:], dtype=np.uint64).copy()
    return VideoIndexData(frames=frames, hashes=hashes)


def is_valid_vdx(path: str) -> bool:
    try:
        idx = load_vdx(path)
    except (OSError, ValueError):
        return False
    if len(idx.frames) != len(idx.hashes):
        return False
    if len(idx.frames) and not np.all(np.diff(idx.frames) > 0):
        return False  # frame numbers must be strictly increasing
    return True
