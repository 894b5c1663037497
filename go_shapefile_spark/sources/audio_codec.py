"""Pure-numpy RIFF/WAVE audio codec: PCM16 (lossless) + G.711 mu-law.

The sandbox ships no audio libraries, but the audio modality needs none:
WAV is length-prefixed RIFF chunk framing (the same container family as
the AVI walker in ``video_codec.py``) and the two payload codings here
are both fully vectorizable public specs:

* ``WAVE_FORMAT_PCM`` (format tag 1), 16-bit little-endian — lossless,
  so the decoded-sample invariant is exact equality (the PNG analog);
* ``WAVE_FORMAT_MULAW`` (format tag 7), CCITT G.711 mu-law companding —
  genuinely lossy 2:1 logarithmic coding (the JPEG analog), implemented
  from the G.711 segment tables, not from any existing codec's source.
  The decoder expansion is bit-exact against the canonical 256-entry
  table (0x00 -> -32124 ... 0xFF -> 0) and against the JDK's
  independent ``javax.sound.sampled`` ULAW decoder (interop-tested).

Error contract (the fuzz-hardened discipline shared by jpeg_codec.py /
video_codec.py): malformed containers raise :class:`ValueError`, never
struct/index/overflow errors from the internals; genuinely unsupported
but well-formed payloads (float PCM, ADPCM, 24-bit) raise ValueError
with a clear message.

Reference analog: go-shapefile parses every container variant it claims
to support and rejects the rest with typed errors (shapefile.go:65-68's
MultiPatch rejection; zipfile member dispatch shapefile.go:330-418) —
the same posture applied to an audio container.
"""

from __future__ import annotations

import struct

import numpy as np

# Any behavioral change to encode/decode must bump this: every cached
# audio corpus keys its path on it (ADVICE r4 #3 discipline, same as
# jpeg_codec.CODEC_VERSION / images.CORPUS_TAG).
AUDIO_CODEC_VERSION = 1

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_MULAW = 7

_BIAS14 = 33          # G.711 bias in the 14-bit domain (0x84 >> 2)
_CLIP14 = 8159        # max 14-bit magnitude before bias
# segment upper ends (14-bit domain, biased): seg = first index >= x
_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF,
                      0x1FFF], dtype=np.int32)


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear samples -> uint8 G.711 mu-law codes (vectorized).

    Works in the 14-bit domain (>> 2) like every production encoder;
    magnitudes are segment-quantized (8 log segments x 16 mantissa
    steps) and the code byte is complemented per G.711.
    """
    x = np.asarray(pcm, dtype=np.int16).astype(np.int32) >> 2
    sign = x < 0
    mag = np.where(sign, -x, x)
    mag = np.minimum(mag, _CLIP14) + _BIAS14
    seg = np.searchsorted(_SEG_UEND, mag, side="left").astype(np.int32)
    clip = seg >= 8                      # mag > 0x1FFF after bias
    seg = np.minimum(seg, 7)
    uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    uval = np.where(clip, 0x7F, uval)
    return (uval ^ np.where(sign, 0x7F, 0xFF)).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law codes -> int16 linear samples (vectorized,
    canonical table expansion: decode(0x00) = -32124, decode(0xFF) = 0)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    out = np.where(u & 0x80, 0x84 - t, t - 0x84)
    return out.astype(np.int16)


def encode_wav(samples: np.ndarray, sample_rate: int,
               fmt: int = WAVE_FORMAT_PCM) -> bytes:
    """(n,) or (n, channels) int16 samples -> WAV bytes.

    PCM16 writes the samples verbatim (little-endian interleaved);
    MULAW compands each sample to one byte.  The mu-law fmt chunk
    carries the 18-byte extensible form (cbSize=0) that strict readers
    (javax.sound.sampled among them) require for non-PCM tags.
    """
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.shape[1] < 1:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = samples.shape
    if fmt == WAVE_FORMAT_PCM:
        bits, payload = 16, samples.astype("<i2").tobytes()
        extra = b""
    elif fmt == WAVE_FORMAT_MULAW:
        bits, payload = 8, mulaw_encode(samples.ravel()).tobytes()
        extra = struct.pack("<H", 0)          # cbSize = 0
    else:
        raise ValueError(f"unsupported WAV format tag {fmt}")
    block_align = ch * bits // 8
    fmt_payload = struct.pack("<HHIIHH", fmt, ch, sample_rate,
                              sample_rate * block_align, block_align,
                              bits) + extra
    chunks = (_chunk(b"fmt ", fmt_payload) + _chunk(b"data", payload))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""     # RIFF chunks are even
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 samples, sample_rate).

    Walks the RIFF chunk list (no byte scanning — payloads may legally
    contain chunk tags), honors declared sizes, skips unknown chunks
    (LIST/INFO, fact, cue) like every conforming reader, and expands
    mu-law payloads to linear PCM16.
    """
    try:
        return _decode_wav(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError, TypeError) as e:
        raise ValueError(
            f"malformed WAV container ({type(e).__name__})") from e


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    end = min(8 + struct.unpack_from("<I", data, 4)[0], len(data))
    pos, fmt_seen, payload = 12, None, None
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_end = pos + 8 + size
        if fourcc == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            if body_end > end:
                raise ValueError("truncated fmt chunk")
            fmt_seen = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif fourcc == b"data":
            if body_end > end:
                raise ValueError("truncated data chunk")
            payload = data[pos + 8:body_end]
        pos = body_end + (size % 2)
    if fmt_seen is None:
        raise ValueError("no fmt chunk in WAV")
    if payload is None:
        raise ValueError("no data chunk in WAV")
    tag, ch, rate, _byte_rate, block_align, bits = fmt_seen
    if ch < 1:
        raise ValueError("fmt chunk declares zero channels")
    if rate < 1:
        raise ValueError("fmt chunk declares zero sample rate")
    if tag == WAVE_FORMAT_PCM:
        if bits != 16:
            raise ValueError(
                f"unsupported PCM bit depth {bits} (16-bit only)")
        if len(payload) % (2 * ch):
            raise ValueError("PCM data length not a sample multiple")
        flat = np.frombuffer(payload, dtype="<i2").astype(np.int16)
    elif tag == WAVE_FORMAT_MULAW:
        if bits != 8:
            raise ValueError(f"mu-law bit depth must be 8, got {bits}")
        if len(payload) % ch:
            raise ValueError("mu-law data length not a sample multiple")
        flat = mulaw_decode(np.frombuffer(payload, dtype=np.uint8))
    else:
        raise ValueError(f"unsupported WAV format tag {tag} "
                         "(PCM16 and G.711 mu-law only)")
    return flat.reshape(-1, ch), rate


def wav_header(data: bytes) -> dict:
    """Header-only WAV metadata (the audio twin of jpeg_header): walk
    the RIFF chunk list reading only fmt fields and the data chunk's
    SIZE — samples are never decoded, so a catalog pass costs chunk
    headers, not audio.  ``n_samples`` derives from the declared sizes
    (PCM16: size/2/ch; mu-law: size/ch).  Same validation posture as
    the decoder (bad container, missing chunks, zero channels/rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    end = min(8 + struct.unpack_from("<I", data, 4)[0], len(data))
    pos, fmt_seen, data_size = 12, None, None
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if fourcc == b"fmt ":
            if size < 16 or pos + 8 + size > end:
                raise ValueError("bad fmt chunk")
            fmt_seen = struct.unpack_from("<HHIIHH", data, pos + 8)
        elif fourcc == b"data":
            data_size = size
        pos += 8 + size + (size % 2)
    if fmt_seen is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, _br, _ba, bits = fmt_seen
    if ch < 1 or rate < 1:
        raise ValueError("fmt chunk declares zero channels/rate")
    if tag == WAVE_FORMAT_PCM:
        n = data_size // (2 * ch)
    elif tag == WAVE_FORMAT_MULAW:
        n = data_size // ch
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    return {"format_tag": tag, "n_channels": ch, "sample_rate": rate,
            "bits": bits, "n_samples": n}
