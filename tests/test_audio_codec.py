"""WAV/mu-law codec + audio featurization + the audio modality path.

Validation layers (the jpeg_codec discipline):
* canonical-table vectors (G.711's published expansion values),
* exact/lossy roundtrip properties over the full int16 range,
* fuzz-to-ValueError error contract,
* cross-codec interop against the JDK's independent
  ``javax.sound.sampled`` WAV reader / ULAW converter,
* feature math vs a per-row reference implementation,
* the strict/stub seam (NotImplementedError on unknown formats).
"""

import struct

import numpy as np
import pytest

from go_shapefile_spark.sources.audio import (
    check_audio_invariants, generate_audio_batch, generate_audio_df,
    samples_from_ahash,
)
from go_shapefile_spark.sources.audio_codec import (
    WAVE_FORMAT_MULAW, decode_wav, encode_wav, mulaw_decode, mulaw_encode,
)


def _sine(n=4000, sr=8000, freq=440.0, amp=0.8, seed=None):
    t = np.arange(n)
    return (amp * 32767 * np.sin(2 * np.pi * freq * t / sr)) \
        .astype(np.int16)


# ---------------------------------------------------------------- mu-law

def test_mulaw_canonical_table_values():
    """G.711's published expansion: segment boundaries and the
    all-ones/all-zeros codes."""
    codes = np.array([0x00, 0x10, 0x70, 0x7F, 0x80, 0xF0, 0xFF],
                     dtype=np.uint8)
    got = mulaw_decode(codes)
    assert got.tolist() == [-32124, -15996, -120, 0, 32124, 120, 0]


def test_mulaw_decode_is_odd_symmetric():
    """Code c and its sign-flipped twin decode to +/- the same value."""
    pos = mulaw_decode(np.arange(0x80, 0x100, dtype=np.uint8))
    neg = mulaw_decode(np.arange(0x00, 0x80, dtype=np.uint8))
    assert np.array_equal(pos, -neg)


def test_mulaw_roundtrip_full_range():
    """decode(encode(x)) stays within one quantization step everywhere
    (largest step = 1024 in the top segment; clip region adds 644 at
    full scale), and the encode is idempotent through a decode."""
    allv = np.arange(-32768, 32768, dtype=np.int16)
    codes = mulaw_encode(allv)
    rt = mulaw_decode(codes)
    assert np.abs(rt.astype(np.int32) - allv.astype(np.int32)).max() <= 644
    assert np.array_equal(mulaw_encode(rt), codes)


def test_mulaw_snr_on_tone():
    x = _sine()
    dec = mulaw_decode(mulaw_encode(x)).astype(np.float64)
    err = dec - x
    snr = 10 * np.log10((x.astype(np.float64) ** 2).mean()
                        / (err ** 2).mean())
    assert snr >= 35.0          # G.711 design point ~38 dB


# ------------------------------------------------------------ WAV framing

def test_wav_pcm16_roundtrip_exact_mono_and_stereo():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, 4096, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (999, 2), dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(s2, stereo)


def test_wav_skips_unknown_chunks():
    """Conforming readers skip LIST/INFO etc.; splice one in."""
    x = _sine(64)
    data = encode_wav(x, 8000)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = data[:12] + extra + data[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    s, _ = decode_wav(spliced)
    assert np.array_equal(s[:, 0], x)


@pytest.mark.parametrize("mutate, msg", [
    (lambda d: b"RIFX" + d[4:], "not a RIFF/WAVE"),
    (lambda d: d[:8] + b"AVI " + d[12:], "not a RIFF/WAVE"),
    (lambda d: d[:12] + d[36:], "no fmt chunk"),
    (lambda d: d[:36], "no data chunk"),
    (lambda d: d[:20] + struct.pack("<H", 3) + d[22:], "format tag 3"),
    (lambda d: d[:34] + struct.pack("<H", 24) + d[36:], "bit depth 24"),
    (lambda d: d[:22] + struct.pack("<H", 0) + d[24:], "zero channels"),
    (lambda d: d[:-3], "truncated data"),
])
def test_wav_rejections(mutate, msg):
    data = encode_wav(_sine(64), 8000)
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(data))


def test_wav_fuzzed_corruption_always_valueerror():
    """The shared codec error contract: random byte mutations either
    decode or raise ValueError — never struct/index/overflow leaks."""
    rng = np.random.default_rng(404)
    for fmt in (1, WAVE_FORMAT_MULAW):
        base = bytearray(encode_wav(_sine(256), 8000, fmt))
        for _ in range(400):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                decode_wav(bytes(data))
            except ValueError:
                pass


# ---------------------------------------------------------------- interop

def test_javax_interop(spark):
    """The JDK's javax.sound.sampled stack is an independent production
    WAV implementation: (1) it must read our PCM16 container bit-exactly;
    (2) its ULAW->PCM expansion of OUR mu-law bytes must equal our
    decoder bit-exactly (same canonical table); (3) its own independent
    ULAW encoder's codes must sit within one quantization code of ours
    and reconstruct through OUR decoder at tone-grade SNR."""
    jvm = spark._jvm
    sampled = jvm.javax.sound.sampled
    x = _sine(4000, freq=523.0, amp=0.7)

    def read_pcm16(wav_bytes):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(wav_bytes))
        ais = sampled.AudioSystem.getAudioInputStream(bais)
        fmt = sampled.AudioFormat(
            sampled.AudioFormat.Encoding.PCM_SIGNED,
            8000.0, 16, 1, 2, 8000.0, False)
        pcm = sampled.AudioSystem.getAudioInputStream(fmt, ais)
        return np.frombuffer(bytes(pcm.readAllBytes()), dtype="<i2")

    assert np.array_equal(read_pcm16(encode_wav(x, 8000)), x)

    wav_u = encode_wav(x, 8000, WAVE_FORMAT_MULAW)
    assert np.array_equal(read_pcm16(wav_u), decode_wav(wav_u)[0][:, 0])

    bais = jvm.java.io.ByteArrayInputStream(
        bytearray(encode_wav(x, 8000)))
    ais = sampled.AudioSystem.getAudioInputStream(bais)
    ufmt = sampled.AudioFormat(sampled.AudioFormat.Encoding.ULAW,
                               8000.0, 8, 1, 1, 8000.0, False)
    uais = sampled.AudioSystem.getAudioInputStream(ufmt, ais)
    jcodes = np.frombuffer(bytes(uais.readAllBytes()), dtype=np.uint8)
    ours = mulaw_encode(x)
    assert np.abs(jcodes.astype(np.int32)
                  - ours.astype(np.int32)).max() <= 1
    dec = mulaw_decode(jcodes).astype(np.float64)
    snr = 10 * np.log10((x.astype(np.float64) ** 2).mean()
                        / ((dec - x) ** 2).mean())
    assert snr >= 35.0


# ------------------------------------------------- generator + invariants

def test_generator_deterministic_and_mixed():
    a = generate_audio_batch(0, 40)
    b = generate_audio_batch(0, 40)
    assert a.equals(b)
    assert set(a["fmt"]) == {"wav-pcm16", "wav-ulaw"}
    assert (a["fmt"] == "wav-ulaw").sum() == 20
    row = a.iloc[0]
    s, rate = decode_wav(row["bytes"])
    assert rate == row["sample_rate"] and len(s) == row["n_samples"]


def test_check_audio_invariants_all_pass_and_detects_tamper(spark):
    df = generate_audio_df(spark, 60)
    res = check_audio_invariants(df).toPandas()
    assert len(res) == 60
    assert res["samples_ok"].all() and res["transcript_ok"].all()
    assert np.isinf(res.loc[res["fmt"] == "wav-pcm16", "snr_db"]).all()
    ulaw_snr = res.loc[res["fmt"] == "wav-ulaw", "snr_db"]
    assert (ulaw_snr >= 30).all() and np.isfinite(ulaw_snr).all()

    # tamper: flip payload bytes of one row -> that row must fail
    import pandas as pd
    pdf = generate_audio_batch(0, 4)
    raw = bytearray(pdf.loc[0, "bytes"])
    raw[-50:-34] = bytes(16)
    pdf.loc[0, "bytes"] = bytes(raw)
    res2 = check_audio_invariants(
        spark.createDataFrame(pdf)).toPandas().set_index("audio_id")
    assert not res2.loc["aud-0000000000", "samples_ok"]
    assert res2["samples_ok"].sum() == 3


# ------------------------------------------------------------- fingerprint

def test_generator_envelopes_actually_vary():
    """Guard against the integer-vs-float modulo bug: a float64 cast
    before ``% 256`` rounds 2^64-scale seeds to multiples of >= 2048
    and flattens every per-segment gain to its minimum, making clips
    stationary (and spectral fingerprints collide corpus-wide).  The
    segment RMS profile of a clip must genuinely vary."""
    x = samples_from_ahash(12345, 4096).astype(np.float64)
    seg_rms = np.sqrt((x.reshape(8, -1) ** 2).mean(axis=1))
    assert seg_rms.std() / seg_rms.mean() > 0.05


def test_audio_fingerprint_discrimination_and_robustness(spark):
    """Unrelated clips stay far apart in Hamming space; a mu-law
    re-encode of the same waveform stays within the banded-join
    recall guarantee (<= HASH_BANDS - 1 = 3 bits)."""
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import audio_fingerprint
    from go_shapefile_spark.sources.audio import make_mulaw_dups

    pdf = generate_audio_batch(0, 40)
    full = pd.concat([pdf, make_mulaw_dups(pdf, 6, step=1)],
                     ignore_index=True)
    sig = audio_fingerprint(spark.createDataFrame(full)).toPandas() \
        .set_index("audio_id")["afp"]

    def ham(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")

    base = [sig[f"aud-{i:010d}"] for i in range(40)]
    natural = min(ham(base[i], base[j])
                  for i in range(40) for j in range(i + 1, 40))
    assert natural >= 7          # measured >= 11 over 1000 clips
    for i in range(0, 12, 2):    # the first six PCM16 rows (even idx)
        assert ham(sig[f"aud-{i:010d}"], sig[f"dup-aud-{i:010d}"]) <= 3


def test_audio_neardup_pairs_exactly_planted(spark):
    """Planted lossy re-encodes pair with their originals; nothing
    else pairs (spanning-edge-set construction, banded candidates)."""
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import audio_neardup_pairs
    from go_shapefile_spark.sources.audio import make_mulaw_dups

    pdf = generate_audio_batch(100, 160)
    dups = make_mulaw_dups(pdf, 5)
    full = pd.concat([pdf, dups], ignore_index=True)
    pairs = audio_neardup_pairs(spark.createDataFrame(full)).toPandas()
    got = {tuple(sorted((a, b))) for a, b in
           zip(pairs["audio_a"], pairs["audio_b"])}
    want = {(d.replace("dup-", ""), d) for d in dups["audio_id"]}
    assert got == want
    assert (pairs["hamming"] <= 3).all()


# ---------------------------------------------------------------- features

def test_audio_features_match_reference(spark):
    """Stacked-batch features == per-row reference math."""
    from go_shapefile_spark.operators.multimodal import audio_features

    df = generate_audio_df(spark, 30)
    got = audio_features(df).toPandas().set_index("audio_id")
    assert len(got) == 30
    src = generate_audio_batch(0, 30).set_index("audio_id")
    for aid, row in src.iterrows():
        x = decode_wav(row["bytes"])[0][:, 0].astype(np.float64) / 32768.0
        sr, n = row["sample_rate"], len(x)
        g = got.loc[aid]
        assert g["duration_s"] == pytest.approx(n / sr)
        assert g["rms"] == pytest.approx(np.sqrt((x ** 2).mean()))
        assert g["peak"] == pytest.approx(np.abs(x).max())
        signs = x >= 0
        assert g["zcr_hz"] == pytest.approx(
            (signs[1:] ^ signs[:-1]).sum() * sr / (2 * (n - 1)))
        mag = np.abs(np.fft.rfft(x))
        cent = (mag * np.fft.rfftfreq(n, 1 / sr)).sum() / mag.sum()
        assert g["spectral_centroid_hz"] == pytest.approx(cent)
        # the dominant harmonic lives below Nyquist and above DC
        assert 0 < g["spectral_centroid_hz"] < sr / 2


def test_audio_features_trust_decoded_rate_and_odd_lengths(spark):
    """r5 review fixes: (1) features derive from the rate DECODED from
    the container, not a metadata column that may disagree; (2) the
    fingerprint truncates awkward clip lengths instead of rejecting
    legal WAVs; (3) a one-sample clip yields zcr 0.0, not 0/0 NaN."""
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import (audio_features,
                                                         audio_fingerprint)

    x = _sine(1999, sr=16000)       # length % 8 == 7, rate != default
    rows = [("odd", encode_wav(x, 16000), 1999, 8000, 1,
             "wav-pcm16", "t", 7),  # metadata rate LIES (8000)
            ("one", encode_wav(x[:1], 16000), 1, 16000, 1,
             "wav-pcm16", "t", 8)]
    pdf = pd.DataFrame(rows, columns=["audio_id", "bytes", "n_samples",
                                      "sample_rate", "n_channels", "fmt",
                                      "transcript", "ahash"])
    df = spark.createDataFrame(pdf)
    got = audio_features(df).toPandas().set_index("audio_id")
    assert got.loc["odd", "duration_s"] == pytest.approx(1999 / 16000)
    assert got.loc["one", "zcr_hz"] == 0.0
    sig = audio_fingerprint(df.where("audio_id = 'odd'")).toPandas()
    assert len(sig) == 1 and sig["afp"].notna().all()
    with pytest.raises(Exception, match="too short to fingerprint"):
        audio_fingerprint(df.where("audio_id = 'one'")).collect()


def test_audio_resample_matches_np_interp(spark):
    """Stacked linear resample == per-row np.interp reference; the
    output is decodable PCM16 WAV at the target rate, and upsampling a
    tone preserves its spectral peak."""
    from go_shapefile_spark.operators.multimodal import audio_resample

    df = spark.createDataFrame(generate_audio_batch(0, 12))
    got = audio_resample(df, 16000).toPandas().set_index("audio_id")
    src = generate_audio_batch(0, 12).set_index("audio_id")
    for aid, row in src.iterrows():
        x = decode_wav(row["bytes"])[0][:, 0].astype(np.float64) / 32768.0
        sr, ln = row["sample_rate"], len(x)
        out_n = int(round(ln * 16000 / sr))
        pos = np.arange(out_n) * sr / 16000.0
        ref = np.interp(pos, np.arange(ln), x)
        g = got.loc[aid]
        assert g["sample_rate"] == 16000 and g["n_samples"] == out_n
        dec, rate = decode_wav(bytes(g["bytes"]))
        assert rate == 16000
        expect = np.clip(np.round(ref * 32768.0), -32768, 32767)
        assert np.array_equal(dec[:, 0].astype(np.float64), expect)
    # spectral peak of a pure tone survives 8k->16k upsampling
    tone = _sine(4096, sr=8000, freq=440.0)
    import pandas as pd
    one = pd.DataFrame([("t", encode_wav(tone, 8000), 4096, 8000, 1,
                         "wav-pcm16", "t", 1)],
                       columns=["audio_id", "bytes", "n_samples",
                                "sample_rate", "n_channels", "fmt",
                                "transcript", "ahash"])
    up = audio_resample(spark.createDataFrame(one), 16000).toPandas()
    y = decode_wav(bytes(up.loc[0, "bytes"]))[0][:, 0].astype(np.float64)
    freqs = np.fft.rfftfreq(len(y), 1 / 16000.0)
    peak = freqs[np.abs(np.fft.rfft(y)).argmax()]
    assert abs(peak - 440.0) < 3.0
    # output composes with the other audio operators (fmt column, r5
    # review) and invalid rates fail fast at construction
    from go_shapefile_spark.operators.multimodal import audio_features
    feats = audio_features(audio_resample(df, 16000)).toPandas() \
        .set_index("audio_id")
    aid = src.index[0]
    assert feats.loc[aid, "duration_s"] == pytest.approx(
        int(round(src.loc[aid, "n_samples"]
                  * 16000 / src.loc[aid, "sample_rate"])) / 16000)
    with pytest.raises(ValueError, match="target_rate"):
        audio_resample(df, 0)


def test_audio_features_strict_vs_stub(spark):
    """Unknown payload formats: strict raises NotImplementedError;
    stub_ok regenerates the deterministic waveform instead."""
    from go_shapefile_spark.operators.multimodal import audio_features

    pdf = generate_audio_batch(0, 4)
    pdf["fmt"] = "opus"
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="no codec for 'opus'"):
        audio_features(df).collect()
    got = audio_features(df, stub_ok=True).toPandas()
    x = samples_from_ahash(int(pdf.loc[1, "ahash"]),
                           int(pdf.loc[1, "n_samples"])) \
        .astype(np.float64) / 32768.0
    assert got.set_index("audio_id").loc["aud-0000000001", "rms"] \
        == pytest.approx(np.sqrt((x ** 2).mean()))


def test_wav_header_matches_decode_without_reading_samples():
    """wav_header reports exactly decode_wav's shape for both formats,
    and still works when every sample byte is CHOPPED off (evidence it
    reads chunk headers only); the decoder must fail on those bytes."""
    import pytest

    from go_shapefile_spark.sources.audio_codec import (
        WAVE_FORMAT_MULAW, decode_wav, encode_wav, wav_header)

    pcm = (np.sin(np.linspace(0, 80, 4096)) * 9000).astype(np.int16)
    for tag_kw in ({}, {"format_tag": WAVE_FORMAT_MULAW}):
        buf = encode_wav(pcm, 8000, *([] if not tag_kw else
                                      [WAVE_FORMAT_MULAW]))
        hd = wav_header(buf)
        samples, rate = decode_wav(buf)
        assert hd["n_samples"] == len(samples) and hd["sample_rate"] == rate

    buf = encode_wav(pcm, 8000)
    di = buf.index(b"data")
    chopped = buf[:di + 8]               # data chunk header, zero payload
    hd = wav_header(chopped)
    assert hd["n_samples"] == 4096       # from the DECLARED size
    with pytest.raises(ValueError):
        decode_wav(chopped)
    with pytest.raises(ValueError, match="RIFF"):
        wav_header(b"\x00" * 32)
