"""Baseline JFIF codec: analytic decode vectors (hand-built streams whose
pixel output is derivable on paper — the reference-fixture discipline of
shapefile_test.go applied to the image codec), roundtrip PSNR bounds, and
marker-level robustness."""

import os
import struct

import numpy as np
import pytest

from go_shapefile_spark.sources.jpeg_codec import (
    AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS, decode_jpeg,
    encode_jpeg, quality_tables,
)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


class _Bits:
    """Independent minimal bit-writer for hand-built test streams (NOT
    the codec's writer — the test must not trust the code under test)."""

    def __init__(self):
        self.bits = []

    def put(self, code, n):
        self.bits += [(code >> (n - 1 - i)) & 1 for i in range(n)]

    def bytes_(self):
        while len(self.bits) % 8:
            self.bits.append(1)          # 1-padding per T.81
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)         # byte stuffing
        return bytes(out)


def _huff_codes(bits, vals):
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_flat(tid, q):
    return _seg(0xDB, bytes([tid]) + bytes([q] * 64))


def _dht(tclass, tid, bits, vals):
    return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))


def _put_dc_only(w, dc_tab, diff):
    """Emit one DC-only block: category code + value bits + EOB."""
    s = abs(diff).bit_length()
    code, ln = dc_tab[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # EOB is AC symbol 0x00; with the Annex-K luma table that is
    # the 4th code: lengths 2,2,3 then 4 → code 1010
    w.put(0b1010, 4)


def test_handbuilt_grayscale_dc_only():
    """Single 8×8 grayscale block, quant table all-ones, DC diff = 8:
    only F[0,0] = 8 is set, so every pixel is 128 + 8·(1/8) = 129 —
    derived on paper, not from the encoder."""
    dc_tab = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    w = _Bits()
    _put_dc_only(w, dc_tab, 8)
    data = (b"\xff\xd8" + _dqt_flat(0, 1) +
            _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])) +
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) +
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS) +
            _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) +
            w.bytes_() + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, np.full((8, 8, 3), 129, np.uint8))


def test_handbuilt_dc_predictor_chain():
    """Two horizontal blocks: DC diffs 16 then -8 ⇒ absolute DCs 16, 8 ⇒
    flat values 130 then 129 (q=1)."""
    dc_tab = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    w = _Bits()
    _put_dc_only(w, dc_tab, 16)
    _put_dc_only(w, dc_tab, -8)
    data = (b"\xff\xd8" + _dqt_flat(0, 1) +
            _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])) +
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) +
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS) +
            _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) +
            w.bytes_() + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (8, 16, 3)
    assert np.array_equal(out[:, :8, 0], np.full((8, 8), 130, np.uint8))
    assert np.array_equal(out[:, 8:, 0], np.full((8, 8), 129, np.uint8))


def test_handbuilt_420_subsampled_color():
    """4:2:0 16×16: Y sampled 2×2 (4 blocks/MCU), Cb/Cr 1×1 upsampled by
    box replication.  All planes flat: Y=128+8·/8=129, Cb=128+16/8=130,
    Cr=128 ⇒ one analytic RGB triple everywhere."""
    dc_tab = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    w = _Bits()
    for _ in range(4):                   # 4 luma blocks (first diff 8,
        _put_dc_only(w, dc_tab, 8 if _ == 0 else 0)   # rest diff 0)
    _put_dc_only(w, dc_tab, 16)          # Cb
    _put_dc_only(w, dc_tab, 0)           # Cr (predictor independent)
    sof = struct.pack(">BHHB", 8, 16, 16, 3) + \
        bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    data = (b"\xff\xd8" + _dqt_flat(0, 1) +
            _seg(0xC0, sof) +
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) +
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS) +
            _seg(0xDA, sos) + w.bytes_() + b"\xff\xd9")
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    y, cb, cr = 129.0, 130.0, 128.0
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert np.array_equal(out[..., 0], np.full((16, 16), exp_r, np.uint8))
    assert np.array_equal(out[..., 1], np.full((16, 16), exp_g, np.uint8))
    assert np.array_equal(out[..., 2], np.full((16, 16), exp_b, np.uint8))


def test_roundtrip_constants_exact():
    for v in (0, 1, 37, 128, 254, 255):
        img = np.full((16, 16, 3), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, 95)), img)


def test_roundtrip_psnr_bounds():
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:24, 0:17]
    smooth = np.stack([(x * 9) % 256, (y * 5) % 256, ((x + y) * 3) % 256],
                      axis=-1).astype(np.uint8)
    assert psnr(smooth, decode_jpeg(encode_jpeg(smooth, 90))) >= 38
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert psnr(noise, decode_jpeg(encode_jpeg(noise, 98))) >= 40
    # quality ordering: lower quality → worse PSNR (quantization real)
    p85 = psnr(noise, decode_jpeg(encode_jpeg(noise, 85)))
    p98 = psnr(noise, decode_jpeg(encode_jpeg(noise, 98)))
    assert p85 < p98 < float("inf")


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (8, 9), (17, 24), (23, 23)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 97))
        assert out.shape == (h, w, 3)
        assert psnr(img, out) >= 30      # tiny blocks, just sanity


def test_quality_tables_monotone():
    ql50, qc50 = quality_tables(50)
    ql95, qc95 = quality_tables(95)
    ql100, _ = quality_tables(100)
    assert (ql95 <= ql50).all() and (ql95 >= 1).all()
    assert (qc95 <= qc50).all()
    # q=100 ⇒ scale 0 ⇒ every step clamps to the minimum of 1
    assert (ql100 == 1).all()
    # q=50 ⇒ scale 100 ⇒ the Annex-K base table verbatim
    from go_shapefile_spark.sources.jpeg_codec import QUANT_LUMA
    assert np.array_equal(ql50, QUANT_LUMA)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")          # SOI+EOI, no scan
    # truncated entropy stream
    img = np.full((8, 8, 3), 90, np.uint8)
    data = encode_jpeg(img, 95)
    with pytest.raises(ValueError):
        decode_jpeg(data[:len(data) - 12] + b"\xff\xd9")


def _patch_sof_hv(data: bytes, comp: int, hv: int) -> bytes:
    """Overwrite component ``comp``'s sampling-factor byte in SOF0."""
    out = bytearray(data)
    i = out.index(b"\xff\xc0")
    out[i + 10 + 3 * comp + 1] = hv
    return bytes(out)


def test_zero_sampling_factor_is_valueerror_not_zerodivision():
    """ADVICE r4: all-zero h/v used to escape as ZeroDivisionError from
    the MCU geometry math; must be a clean ValueError at SOF parse."""
    data = encode_jpeg(np.full((8, 8, 3), 90, np.uint8), 95)
    for hv in (0x00, 0x10, 0x01):
        with pytest.raises(ValueError, match="sampling factors"):
            decode_jpeg(_patch_sof_hv(data, 0, hv))


def test_sampling_factor_3_rejected():
    """ADVICE r4: factor 3 (legal JPEG, unsupported by box-replication
    upsampling) must reject rather than silently render at wrong scale."""
    data = encode_jpeg(np.full((16, 16, 3), 90, np.uint8), 95)
    for comp, hv in ((0, 0x33), (0, 0x31), (1, 0x13)):
        with pytest.raises(ValueError, match="sampling factors"):
            decode_jpeg(_patch_sof_hv(data, comp, hv))


def test_sof2_with_sequential_scan_params_rejected():
    """A baseline stream whose SOF is flipped to SOF2 is INVALID
    progressive (its single scan spans Ss=0..Se=63, which progressive
    forbids) — must reject cleanly, not decode garbage."""
    img = np.full((8, 8, 3), 90, np.uint8)
    data = bytearray(encode_jpeg(img, 95))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2                            # SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_lossless_sof3_rejected():
    img = np.full((8, 8, 3), 90, np.uint8)
    data = bytearray(encode_jpeg(img, 95))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC3                            # SOF3 (lossless)
    with pytest.raises(ValueError, match="SOF0/1/2"):
        decode_jpeg(bytes(data))


def test_fuzzed_corruption_always_raises_valueerror():
    """Error contract: arbitrary byte corruption / truncation of a valid
    stream either decodes (harmless bit flips in entropy data) or raises
    ValueError — never a KeyError/IndexError/struct.error escape."""
    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = bytearray(encode_jpeg(img, 95))
    for trial in range(800):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        if trial % 5 == 0:
            data = data[:int(rng.integers(0, len(data)))]
        try:
            decode_jpeg(bytes(data))
        except ValueError:
            pass


def _javax_encode(spark, px, quality, progressive, gray=False):
    """Encode via the JVM's independent production codec (javax.imageio
    wraps libjpeg) — the only progressive ENCODER in this sandbox, used
    to exercise our progressive DECODER against real scan scripts."""
    from go_shapefile_spark.sources.images import encode_jpeg_jvm
    return encode_jpeg_jvm(spark, px, quality, progressive, gray)


def _javax_decode_raw(spark, data):
    """JVM decode returning RAW raster samples (no colorspace transform
    — BufferedImage.getRGB applies linear-gray→sRGB gamma, which would
    corrupt a grayscale comparison)."""
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    r = bi.getRaster()
    w, h, nb = bi.getWidth(), bi.getHeight(), r.getNumBands()
    bands = []
    for b in range(nb):
        a = r.getSamples(0, 0, w, h, b, None)
        bands.append(np.array([a[i] for i in range(w * h)]).reshape(h, w))
    return np.stack(bands, axis=-1).astype(np.uint8)


def test_progressive_javax_interop(spark):
    """Our SOF2 decode vs the JVM's libjpeg-backed codec.

    The sharp check: at equal quality, javax's baseline and progressive
    encodings carry IDENTICAL quantized coefficients, so our decode of
    both must agree BIT-EXACTLY (any error in the 10-scan successive-
    approximation reconstruction would break equality).  The grayscale
    check compares against javax's raw raster (single component — no
    chroma-upsample ambiguity): IDCT rounding differences only."""
    rng = np.random.default_rng(99)
    for (h, w) in [(16, 16), (17, 23), (48, 40)]:
        for q in (0.9, 0.5):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            base = decode_jpeg(_javax_encode(spark, px, q, False))
            prog = decode_jpeg(_javax_encode(spark, px, q, True))
            assert np.array_equal(base, prog), (h, w, q)
    g = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    data = _javax_encode(spark, g, 0.9, True, gray=True)
    jraw = _javax_decode_raw(spark, data)[..., 0]
    ours = decode_jpeg(data)[..., 0]
    assert np.abs(jraw.astype(int) - ours.astype(int)).max() <= 2


SPARK_KITTENS = "/opt/spark/data/mllib/images/origin/kittens"


@pytest.mark.skipif(not os.path.isdir(SPARK_KITTENS),
                    reason="Spark sample images not present")
def test_real_world_jpegs_cross_decoder(spark):
    """Interop against an INDEPENDENT production decoder: real camera
    JPEGs (libjpeg-encoded, 4:2:0, Spark's own sample data) decoded by
    our codec must agree with javax.imageio's decode (via the Spark
    `image` datasource) within 45 dB — residual differences are chroma
    upsampling choice (box vs bilinear), a few pixel counts at most."""
    df = spark.read.format("image").load(SPARK_KITTENS)
    rows = [r for r in df.select("image.origin", "image.height",
                                 "image.width", "image.nChannels",
                                 "image.data").collect()
            if r.origin.endswith(".jpg")]
    assert len(rows) >= 3
    for r in rows:
        path = r.origin.replace("file://", "")
        jvm = np.frombuffer(bytes(r.data), np.uint8) \
            .reshape(r.height, r.width, r.nChannels)[..., [2, 1, 0]]
        ours = decode_jpeg(open(path, "rb").read())
        assert ours.shape == jvm.shape
        mse = np.mean((ours.astype(np.float64) - jvm) ** 2)
        assert 10 * np.log10(255.0 ** 2 / mse) >= 45.0, path
        assert np.abs(ours.astype(int) - jvm.astype(int)).max() <= 16, path


def test_progressive_real_world_decodes():
    """Real progressive JPEGs (not our encoder's output) now decode to
    sane pixels instead of rejecting (round-5: SOF2 support)."""
    cand = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    if not os.path.exists(cand):
        pytest.skip("fixture not present")
    out = decode_jpeg(open(cand, "rb").read())
    assert out.ndim == 3 and out.shape[2] == 3 and out.size > 0


# --- progressive (SOF2): hand-built analytic vectors -----------------------
#
# The fixture discipline of the baseline tests applied to every
# progressive scan type: streams are built bit-by-bit with the test's own
# independent writer, and expected pixels derive from the explicit IDCT
# cosine formula — never from the code under test.


def _idct_1coef(k_zz: int, value: float) -> np.ndarray:
    """8×8 pixel field of a single zigzag-index coefficient (q=1),
    computed from the raw T.81 IDCT definition."""
    from go_shapefile_spark.sources.jpeg_codec import ZIGZAG
    nat = int(ZIGZAG[k_zz])
    u, v = nat // 8, nat % 8
    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
    y, x = np.mgrid[0:8, 0:8]
    return (cu * cv * value * np.cos((2 * y + 1) * u * np.pi / 16)
            * np.cos((2 * x + 1) * v * np.pi / 16))


PROG_DC_BITS = [0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_VALS = [0, 1, 2, 3, 4, 5, 6, 7]
# AC table with EOBn codes: 00→EOB(0x00) 01→(0,2) 100→EOB2(0x10) 101→(0,1)
PROG_AC_BITS = [0, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [0x00, 0x02, 0x10, 0x01]


def _prog_headers(w, h, n_scans_dht=True, gray=True):
    assert gray
    return (b"\xff\xd8" + _dqt_flat(0, 1) +
            _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) +
                 bytes([1, 0x11, 0])) +
            _dht(0, 0, PROG_DC_BITS, PROG_DC_VALS) +
            _dht(1, 0, PROG_AC_BITS, PROG_AC_VALS))


def _sos(comps, ss, se, ah, al):
    payload = bytes([len(comps)])
    for cid, td, ta in comps:
        payload += bytes([cid, (td << 4) | ta])
    return _seg(0xDA, payload + bytes([ss, se, (ah << 4) | al]))


def _dc_code(w, diff):
    s = abs(diff).bit_length()
    codes = _huff_codes(PROG_DC_BITS, PROG_DC_VALS)
    code, ln = codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)


def test_progressive_four_scan_successive_approximation():
    """8×8 grayscale through all four scan types.  Final coefficients
    (q=1, derived on paper): DC = (4<<1)|1 = 9; zz[1] = (3<<1)+1 = 7.
    Expected pixels from the explicit IDCT formula."""
    w1 = _Bits(); _dc_code(w1, 4)                   # DC first, Al=1
    w2 = _Bits(); w2.put(1, 1)                      # DC refine: bit 1
    w3 = _Bits()
    w3.put(0b01, 2); w3.put(0b11, 2)                # AC first: (0,2) val 3
    w3.put(0b00, 2)                                 # EOB
    w4 = _Bits()
    w4.put(0b00, 2)                                 # AC refine: EOB run 1
    w4.put(1, 1)                                    # correction bit for zz1
    data = (_prog_headers(8, 8) +
            _sos([(1, 0, 0)], 0, 0, 0, 1) + w1.bytes_() +
            _sos([(1, 0, 0)], 1, 63, 0, 1) + w3.bytes_() +
            _sos([(1, 0, 0)], 1, 63, 1, 0) + w4.bytes_() +
            _sos([(1, 0, 0)], 0, 0, 1, 0) + w2.bytes_() +
            b"\xff\xd9")
    out = decode_jpeg(data)
    exp = 128.0 + _idct_1coef(0, 9.0) + _idct_1coef(1, 7.0)
    exp = np.clip(exp.round(), 0, 255).astype(np.uint8)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[..., 0], exp)
    assert np.array_equal(out[..., 0], out[..., 1])


def test_progressive_eob_run_spans_blocks():
    """16×8 grayscale, AC first scan: block 0 carries one coefficient
    then an EOB2 code whose run consumes block 1 entirely — block 1 must
    stay DC-only."""
    w1 = _Bits(); _dc_code(w1, 2); _dc_code(w1, 2)  # DCs 2, 4 (Al=0)
    w2 = _Bits()
    w2.put(0b101, 3); w2.put(1, 1)                  # blk0: (0,1) val +1
    w2.put(0b100, 3); w2.put(0, 1)                  # EOB2, 1 extra bit = 0
    data = (_prog_headers(16, 8) +
            _sos([(1, 0, 0)], 0, 0, 0, 0) + w1.bytes_() +
            _sos([(1, 0, 0)], 1, 63, 0, 0) + w2.bytes_() +
            b"\xff\xd9")
    out = decode_jpeg(data)
    exp0 = 128.0 + _idct_1coef(0, 2.0) + _idct_1coef(1, 1.0)
    exp1 = 128.0 + _idct_1coef(0, 4.0)
    assert np.array_equal(
        out[:, :8, 0], np.clip(exp0.round(), 0, 255).astype(np.uint8))
    assert np.array_equal(
        out[:, 8:, 0], np.clip(exp1.round(), 0, 255).astype(np.uint8))


def test_progressive_restart_resets_dc_predictor():
    """DRI=1 with an RST0 between the two DC blocks: the predictor must
    reset, so two identical diffs of 8 give DC 8 in BOTH blocks (129
    everywhere) — an unreset predictor would give 130 in block 1."""
    w1 = _Bits(); _dc_code(w1, 8)
    w2 = _Bits(); _dc_code(w2, 8)
    data = (_prog_headers(16, 8) +
            _seg(0xDD, struct.pack(">H", 1)) +
            _sos([(1, 0, 0)], 0, 0, 0, 0) +
            w1.bytes_() + b"\xff\xd0" + w2.bytes_() +
            b"\xff\xd9")
    out = decode_jpeg(data)
    assert np.array_equal(out[..., 0], np.full((8, 16), 129, np.uint8))


def test_sequential_noninterleaved_multi_scan():
    """Baseline 4:2:0 16×16 split into three one-component scans (one
    scan per component — the legal sequential shape the decoder used to
    reject).  Coefficients match test_handbuilt_420_subsampled_color, so
    the expected pixels are the same analytic RGB triple."""
    dc_tab = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)

    def dc_only_scan(diffs):
        w = _Bits()
        for d in diffs:
            _put_dc_only(w, dc_tab, d)
        return w.bytes_()

    sof = struct.pack(">BHHB", 8, 16, 16, 3) + \
        bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    data = (b"\xff\xd8" + _dqt_flat(0, 1) +
            _seg(0xC0, sof) +
            _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) +
            _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS) +
            _sos([(1, 0, 0)], 0, 63, 0, 0) +
            dc_only_scan([8, 0, 0, 0]) +          # 4 Y blocks (2×2 grid)
            _sos([(2, 0, 0)], 0, 63, 0, 0) +
            dc_only_scan([16]) +                  # Cb
            _sos([(3, 0, 0)], 0, 63, 0, 0) +
            dc_only_scan([0]) +                   # Cr
            b"\xff\xd9")
    out = decode_jpeg(data)
    y, cb, cr = 129.0, 130.0, 128.0
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert np.array_equal(out[..., 0], np.full((16, 16), exp_r, np.uint8))
    assert np.array_equal(out[..., 1], np.full((16, 16), exp_g, np.uint8))
    assert np.array_equal(out[..., 2], np.full((16, 16), exp_b, np.uint8))


def test_progressive_fuzzed_corruption_always_raises_valueerror():
    """The fuzz error contract extended to the multi-scan path."""
    w1 = _Bits(); _dc_code(w1, 4)
    w2 = _Bits(); w2.put(0b01, 2); w2.put(0b11, 2); w2.put(0b00, 2)
    base = bytearray(_prog_headers(8, 8) +
                     _sos([(1, 0, 0)], 0, 0, 0, 1) + w1.bytes_() +
                     _sos([(1, 0, 0)], 1, 63, 0, 1) + w2.bytes_() +
                     b"\xff\xd9")
    rng = np.random.default_rng(77)
    for trial in range(400):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        if trial % 5 == 0:
            data = data[:int(rng.integers(0, len(data)))]
        try:
            decode_jpeg(bytes(data))
        except ValueError:
            pass
