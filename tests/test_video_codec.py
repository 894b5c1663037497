"""MJPEG-in-AVI container codec + real frame-sample path."""

import numpy as np
import pytest

from go_shapefile_spark.sources.video_codec import (
    count_frames, encode_avi_mjpeg, iter_mjpeg_frames, sample_frames,
)


def _noise_frames(n, h=16, w=16, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_container_roundtrip_and_psnr():
    frames = _noise_frames(11)
    data = encode_avi_mjpeg(frames, quality=98)
    assert count_frames(data) == 11
    got = list(iter_mjpeg_frames(data))
    assert [i for i, _ in got] == list(range(11))
    for i, px in sample_frames(data, every_n=1):
        mse = np.mean((px.astype(np.float64) - frames[i]) ** 2)
        assert 10 * np.log10(255.0 ** 2 / mse) >= 40


def test_sampling_decodes_only_sampled_frames(monkeypatch):
    """The 100-TB contract: skipped frames are stepped over by chunk
    framing, never decoded."""
    import go_shapefile_spark.sources.video_codec as vc

    data = encode_avi_mjpeg(_noise_frames(12), quality=95)
    calls = []
    orig = vc.decode_jpeg

    def counting(b):
        calls.append(len(b))
        return orig(b)

    monkeypatch.setattr(vc, "decode_jpeg", counting)
    idxs = [i for i, _ in vc.sample_frames(data, every_n=5)]
    assert idxs == [0, 5, 10]
    assert len(calls) == 3            # 12 frames, only 3 decoded


def test_container_rejects_garbage_and_truncation():
    data = encode_avi_mjpeg(_noise_frames(4), quality=95)
    with pytest.raises(ValueError):
        count_frames(b"not an avi")
    with pytest.raises(ValueError):
        list(iter_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE"))
    with pytest.raises(ValueError):
        list(iter_mjpeg_frames(data[:len(data) // 2]))
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8),
                          np.zeros((16, 8, 3), np.uint8)])


def test_frame_sample_real_path_spark(spark):
    """frame_sample over generated MJPEG-AVI rows in STRICT mode: real
    container walk + real JPEG decode, frames verify against the
    regenerate-from-phash invariant."""
    from go_shapefile_spark.operators.multimodal import frame_sample
    from go_shapefile_spark.sources.images import (generate_videos_df,
                                                   pixels_from_phash)

    vids = generate_videos_df(spark, 12, rows_per_task=6)
    meta = {r.video_id: r for r in
            vids.select("video_id", "phash", "n_frames", "w", "h").collect()}
    out = frame_sample(vids, every_n=4, stub_ok=False).collect()
    by_vid: dict[str, list] = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r)
    assert set(by_vid) == set(meta)
    for vid, rows in by_vid.items():
        m = meta[vid]
        assert sorted(r.frame_idx for r in rows) == \
            list(range(0, m.n_frames, 4))
        for r in rows:
            ref = pixels_from_phash(int(m.phash) + int(r.frame_idx),
                                    m.w, m.h)
            px = np.frombuffer(r.frame, np.uint8).reshape(ref.shape)
            mse = np.mean((px.astype(np.float64) - ref) ** 2)
            assert 10 * np.log10(255.0 ** 2 / mse) >= 40


def test_frame_sample_strict_rejects_unknown_payload(spark):
    videos = spark.createDataFrame(
        [("v1", b"\x00\x01", 5, 4, 4, 9)],
        "video_id string, bytes binary, n_frames int, w int, h int, "
        "phash long")
    from go_shapefile_spark.operators.multimodal import frame_sample
    with pytest.raises(Exception, match="no codec"):
        frame_sample(videos, stub_ok=False).collect()


def test_header_count_catches_boundary_truncation():
    """A container cut exactly at a chunk boundary must still be
    rejected: the avih frame count cross-checks the movi walk."""
    import struct

    data = encode_avi_mjpeg(_noise_frames(6), quality=95)
    # find the movi payload and drop the LAST whole frame chunk cleanly
    got = list(iter_mjpeg_frames(data))
    last_jpeg = got[-1][1]
    cut = data.rindex(b"00dc" + struct.pack("<I", len(last_jpeg)))
    with pytest.raises(ValueError, match="declares 6 frames"):
        list(iter_mjpeg_frames(data[:cut]))


def test_uncompressed_dib_rejected_multistream_skipped():
    import struct

    data = bytearray(encode_avi_mjpeg(_noise_frames(3), quality=95))
    # flip the second frame's fourcc to '00db' (uncompressed DIB)
    i = data.index(b"00dc", data.index(b"00dc") + 4)
    data[i:i + 4] = b"00db"
    with pytest.raises(ValueError, match="DIB"):
        list(iter_mjpeg_frames(bytes(data)))
    # a second STREAM's chunks ('01dc') are skipped, not mis-indexed —
    # but then the header count no longer matches: clear rejection
    data[i:i + 4] = b"01dc"
    with pytest.raises(ValueError, match="declares 3 frames"):
        list(iter_mjpeg_frames(bytes(data)))


def test_frame_sample_stub_fallback_for_bad_riff(spark):
    """stub_ok=True must fall back to deterministic fake frames for a
    RIFF payload that is not a valid MJPEG AVI (e.g. WAVE audio), and
    strict mode must reject it."""
    from go_shapefile_spark.operators.multimodal import frame_sample

    wave = b"RIFF\x10\x00\x00\x00WAVEdata\x00\x00\x00\x00"
    videos = spark.createDataFrame(
        [("w1", wave, 8, 4, 4, 77)],
        "video_id string, bytes binary, n_frames int, w int, h int, "
        "phash long")
    out = frame_sample(videos, every_n=4, stub_ok=True).collect()
    assert sorted(r.frame_idx for r in out) == [0, 4]   # fake frames
    with pytest.raises(Exception, match="ValueError|not a RIFF|no movi"):
        frame_sample(videos, every_n=4, stub_ok=False).collect()


def test_fuzzed_container_always_raises_valueerror():
    """Container error contract mirrors the JPEG one: corrupted/truncated
    AVI bytes iterate, or raise ValueError — nothing else escapes."""
    data = bytearray(encode_avi_mjpeg(_noise_frames(5), quality=95))
    rng = np.random.default_rng(7)
    for trial in range(500):
        mut = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
        if trial % 4 == 0:
            mut = mut[:int(rng.integers(0, len(mut)))]
        try:
            for _i, jpeg in iter_mjpeg_frames(bytes(mut)):
                pass
        except ValueError:
            pass


def test_avi_header_matches_decode_without_visiting_frames():
    """avi_header reports the frame iterator's truth, and still works
    when every movi byte is CHOPPED off (header-only evidence); the
    frame iterator must fail on the same bytes."""
    import pytest

    from go_shapefile_spark.sources.images import pixels_from_phash
    from go_shapefile_spark.sources.video_codec import (avi_header,
                                                        encode_avi_mjpeg,
                                                        iter_mjpeg_frames)

    frames = [pixels_from_phash(11 + i, 16, 16) for i in range(9)]
    buf = encode_avi_mjpeg(frames, fps=10, quality=95)
    hd = avi_header(buf)
    assert hd == {"n_frames": 9, "fps": 10, "w": 16, "h": 16,
                  "codec": "MJPG"}
    assert sum(1 for _ in iter_mjpeg_frames(buf)) == 9

    movi = buf.index(b"movi")
    chopped = buf[:movi + 4]
    assert avi_header(chopped)["n_frames"] == 9   # declared, no frames
    with pytest.raises(ValueError):
        list(iter_mjpeg_frames(chopped))
    with pytest.raises(ValueError, match="RIFF"):
        avi_header(b"\x00" * 64)
