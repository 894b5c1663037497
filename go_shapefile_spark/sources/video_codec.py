"""Pure-python MJPEG-in-AVI video container codec.

The sandbox ships no video libraries, but Motion-JPEG inside a RIFF/AVI
container needs none: the container is length-prefixed chunk framing
and every frame is an ordinary baseline JPEG, which ``jpeg_codec.py``
already encodes/decodes.  This makes the video path REAL end to end —
``frame_sample`` walks the container index and decodes only the frames
it samples (the whole point of frame sampling at 100 TB: never decode
the frames you skip).

Writer: minimal spec-conforming AVI (RIFF('AVI ') → LIST hdrl
(avih + LIST strl(strh,strf)) → LIST movi ('00dc' chunks) → idx1).
Reader: walks the movi LIST chunk by chunk (no byte scanning — a JPEG
payload may legally contain '00dc'), honors the declared sizes, and
yields (frame_index, jpeg_bytes) lazily so sampling N-th frames touches
only headers plus the sampled payloads.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from .jpeg_codec import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""   # RIFF chunks are even
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 95) -> bytes:
    """RGB8 frames (h, w, 3), all the same size → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
    jpegs = [encode_jpeg(f, quality) for f in frames]
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack("<14I", 1_000_000 // fps, max_bytes * fps, 0,
                       0x10,            # AVIF_HASINDEX
                       n, 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    # AVIStreamHeader: flags, wPriority, wLanguage, dwInitialFrames,
    # dwScale, dwRate, dwStart, dwLength, dwSuggestedBufferSize,
    # dwQuality, dwSampleSize, rcFrame
    strh = (b"vids" + b"MJPG" +
            struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                        max_bytes, 0xFFFFFFFF, 0) +
            struct.pack("<4H", 0, 0, w, h))
    # BITMAPINFOHEADER; biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) +
                 _list(b"strl", _chunk(b"strh", strh) +
                       _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the 'movi' fourcc
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_mjpeg_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Walk an MJPEG AVI's movi LIST, yielding (frame_idx, jpeg_bytes)
    lazily — chunk framing only, no payload scanning or decoding.
    Malformed containers raise :class:`ValueError` (never struct/index
    errors from the walker internals)."""
    try:
        yield from _iter_mjpeg_frames(data)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(
            f"malformed AVI container ({type(e).__name__})") from e


def _iter_mjpeg_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    pos, end = 12, 8 + struct.unpack_from("<I", data, 4)[0]
    end = min(end, len(data))
    movi_start = movi_end = None
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if fourcc == b"LIST" and data[pos + 8:pos + 12] == b"movi":
            movi_start = pos + 12
            movi_end = pos + 8 + size
            break
        pos += 8 + size + (size % 2)
    if movi_start is None:
        raise ValueError("no movi list in AVI")
    movi_end = min(movi_end, len(data))
    try:
        expected = count_frames(data)
    except ValueError:
        expected = None                       # no avih → skip the check
    idx = 0
    pos = movi_start
    while pos + 8 <= movi_end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload_end = pos + 8 + size
        if payload_end > movi_end:
            raise ValueError("truncated frame chunk in AVI")
        if fourcc == b"00db":
            raise ValueError(
                "uncompressed DIB frames not supported (MJPEG only)")
        if fourcc == b"00dc":                 # stream 0 video frames only:
            yield idx, data[pos + 8:payload_end]
            idx += 1                          # other streams ('01dc',
        pos = payload_end + (size % 2)        # '01wb' audio) are skipped
    if pos != movi_end and pos + 8 > movi_end and pos < movi_end:
        raise ValueError("truncated chunk header in AVI")
    if expected is not None and idx != expected:
        raise ValueError(
            f"truncated AVI: header declares {expected} frames, "
            f"movi list holds {idx}")


def count_frames(data: bytes) -> int:
    """Frame count from the avih header (one struct read, no walking)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    pos = data.find(b"avih", 12, 4096)
    if pos < 0:
        raise ValueError("no avih header")
    try:
        return struct.unpack_from("<I", data, pos + 8 + 16)[0]
    except struct.error as e:
        raise ValueError("truncated avih header") from e


def sample_frames(data: bytes, every_n: int = 10) -> Iterator[
        tuple[int, np.ndarray]]:
    """Decode every ``every_n``-th frame → (frame_idx, RGB8 array).
    Skipped frames are never decoded (their bytes are stepped over by
    the chunk framing)."""
    for idx, jpeg in iter_mjpeg_frames(data):
        if idx % every_n == 0:
            yield idx, decode_jpeg(jpeg)


def avi_header(data: bytes) -> dict:
    """Header-only AVI metadata (the video member of the
    image/audio/video catalog trio): frame count, fps, dimensions and
    the stream codec from the avih/strf headers — no frame chunk is
    ever visited, so the scan cost is the first KB of the container.
    Same container validation as the frame iterator."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    pos = data.find(b"avih", 12, 4096)
    if pos < 0:
        raise ValueError("no avih header")
    try:
        (usec_pf,) = struct.unpack_from("<I", data, pos + 8)
        n, _r1, _r2, max_b, w, h = struct.unpack_from(
            "<IIIIII", data, pos + 8 + 16)
    except struct.error as e:
        raise ValueError("truncated avih header") from e
    if usec_pf <= 0:
        raise ValueError("avih declares zero frame period")
    spos = data.find(b"strf", pos, 8192)
    codec = "unknown"
    if spos >= 0 and spos + 8 + 20 <= len(data):
        codec = data[spos + 8 + 16:spos + 8 + 20].decode(
            "ascii", "replace").strip("\x00 ") or "raw"
    return {"n_frames": n, "fps": 1_000_000 // usec_pf,
            "w": w, "h": h, "codec": codec}
