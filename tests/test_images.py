"""Synthetic image table: codec round-trip, invariants, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_shapefile_spark.sources.images import (
    caption_of, check_invariants, decode_image, encode_png, generate_batch,
    generate_images_df, geotag_images, pixels_from_phash,
)


def test_png_roundtrip_exact():
    rng = np.random.default_rng(42)
    for shape in [(8, 8, 3), (16, 24, 3), (1, 1, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(px), "png"), px)


def test_png_unfilter_types():
    # decoder handles sub/up/avg/paeth filtered rows, not just filter 0
    import struct
    import zlib

    from go_shapefile_spark.sources.images import _PNG_SIG, _chunk
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    # build a PNG using filter type 2 (up) rows
    raw = b""
    prev = np.zeros(24, dtype=np.uint8)
    for y in range(8):
        cur = px[y].reshape(-1)
        raw += b"\x02" + ((cur.astype(np.int32) - prev) % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    data = _PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    assert np.array_equal(decode_image(data, "png"), px)


def test_jpeg_rows_decode_lossy_within_psnr():
    """Generator jpeg rows are REAL baseline JFIF: decode must land
    within the 40 dB invariant of the regenerated reference pixels but
    NOT be bit-exact (lossy — a lossless 'jpeg' would mean the codec is
    secretly a passthrough)."""
    import numpy as np

    from go_shapefile_spark.sources.images import pixels_from_phash

    batch = generate_batch(0, 30)
    jpeg = batch[batch.fmt == "jpeg"].iloc[0]
    got = decode_image(jpeg["bytes"], "jpeg")
    ref = pixels_from_phash(int(jpeg["phash"]), int(jpeg["w"]),
                            int(jpeg["h"]))
    assert got.shape == ref.shape
    mse = float(np.mean((got.astype(np.float64) - ref) ** 2))
    assert mse > 0.0, "jpeg decode was lossless — stub suspected"
    assert 10 * np.log10(255.0 ** 2 / mse) >= 40.0


def test_generator_deterministic():
    a = generate_batch(100, 130)
    b = generate_batch(100, 130)
    assert a.equals(b)
    # range-independence: row 120 identical whether generated in any split
    c = generate_batch(120, 121)
    row_a = a[a.image_id == "img-0000000120"].iloc[0]
    assert row_a["bytes"] == c.iloc[0]["bytes"]
    assert row_a["caption"] == c.iloc[0]["caption"]


def test_invariants_spark(spark):
    df = generate_images_df(spark, 200, rows_per_task=50)
    res = check_invariants(df).toPandas()
    assert len(res) == 200
    png = res[res.fmt == "png"]
    assert png["pixels_ok"].all()
    assert (png["psnr_db"] == np.inf).all()
    assert res["caption_ok"].all()
    assert (res.fmt == "jpeg").sum() == 20  # deterministic 10% stub share


def test_progressive_planted_rows_strict_invariant(spark, tmp_path):
    """Planted SOF2 rows (JVM-encoded multi-scan streams) must decode
    through OUR progressive decoder in strict mode and clear the same
    PSNR≥40 + caption invariant as every other row."""
    from go_shapefile_spark.sources.images import (plant_progressive_rows,
                                                   write_images_table)
    path = str(tmp_path / "imgs")
    write_images_table(spark, path, 40)
    plant_progressive_rows(spark, path, 40, 6)
    res = check_invariants(spark.read.parquet(path)).toPandas()
    assert len(res) == 46
    assert res["pixels_ok"].all() and res["caption_ok"].all()
    prog = res[res.fmt == "jpegp"]
    assert len(prog) == 6
    assert (prog["psnr_db"] >= 40.0).all()
    assert (prog["psnr_db"] < np.inf).all()    # genuinely lossy rows


def test_points_table_is_projection_of_images(spark, tmp_path):
    """write_points_table must emit exactly the phash column the full
    generator assigns — it is the column-pruned scan of the same table."""
    from go_shapefile_spark.sources.images import write_points_table
    path = str(tmp_path / "pts")
    write_points_table(spark, path, 500, rows_per_task=200)
    slim = spark.read.parquet(path).toPandas().sort_values("idx")
    full = generate_batch(0, 500)
    np.testing.assert_array_equal(slim["phash"].to_numpy(),
                                  full["phash"].to_numpy())


def test_geotag_images(spark):
    df = geotag_images(generate_images_df(spark, 100, rows_per_task=50))
    pdf = df.select("phash", "lon", "lat").toPandas()
    from go_shapefile_spark.operators.geotag import lonlat_np
    lon, lat = lonlat_np(pdf["phash"].to_numpy())
    np.testing.assert_array_equal(pdf["lon"].to_numpy(), lon)
    np.testing.assert_array_equal(pdf["lat"].to_numpy(), lat)
    assert (pdf["lon"].abs() <= 180).all() and (pdf["lat"].abs() <= 90).all()
