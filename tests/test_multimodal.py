"""Multimodal operators: decode/resize/featurize + frame-sample plumbing."""

import numpy as np
import pytest

from go_shapefile_spark.operators.multimodal import (
    FEATURE_DIM, decode_resize_featurize, frame_sample, image_features,
    resize_nearest,
)
from go_shapefile_spark.sources.images import generate_images_df


def test_resize_nearest_shapes_and_content():
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small[0, 0], img[0, 0])
    up = resize_nearest(small, 8, 8)
    assert up.shape == (8, 8, 3)


def test_features_deterministic():
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    f = image_features(img)
    assert f.shape == (FEATURE_DIM,)
    assert f[0] == pytest.approx(128 / 255.0)
    assert f[3] == pytest.approx(0.0)  # zero std


def test_decode_resize_featurize_spark(spark):
    images = generate_images_df(spark, 60, rows_per_task=20)
    out = decode_resize_featurize(images).toPandas()
    assert len(out) == 60
    assert all(len(t) == 8 * 8 * 3 for t in out["thumb"])
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    # determinism: same input → same features
    out2 = decode_resize_featurize(images).toPandas()
    a = out.sort_values("image_id").reset_index(drop=True)
    b = out2.sort_values("image_id").reset_index(drop=True)
    assert (a["thumb"] == b["thumb"]).all()


def test_decode_strict_mode(spark):
    """Strict mode (stub_ok=False) decodes BOTH real codecs — png and
    baseline jpeg — and still raises for a format with no sandbox codec."""
    images = generate_images_df(spark, 30, rows_per_task=30)
    out = decode_resize_featurize(images, stub_ok=False).toPandas()
    assert len(out) == 30 and (out["fmt"] == "jpeg").any()
    bad = spark.createDataFrame(
        [("x", b"\x00", 4, 4, "webp", "c", 1)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long")
    with pytest.raises(Exception, match="no codec"):
        decode_resize_featurize(bad, stub_ok=False).collect()


def test_frame_sample_explodes_rows(spark):
    videos = spark.createDataFrame(
        [("v1", b"", 25, 4, 4, 111), ("v2", b"", 7, 4, 4, 222)],
        "video_id string, bytes binary, n_frames int, w int, h int, phash long")
    frames = frame_sample(videos, every_n=10, stub_ok=True).toPandas()
    got = frames.groupby("video_id")["frame_idx"].apply(list).to_dict()
    assert sorted(got["v1"]) == [0, 10, 20]
    assert sorted(got["v2"]) == [0]
    assert all(len(f) == 4 * 4 * 3 for f in frames["frame"])


def test_image_ahash_neardup(spark):
    """Perceptual ahash: a 1-pixel perturbation stays within 1 bit of its
    original; unrelated noise images are far; the pair join is a banded
    equi-join (no BNLJ/cartesian)."""
    import numpy as np
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import (
        image_ahash, image_neardup_pairs)
    from go_shapefile_spark.sources.images import (
        IMAGES_SCHEMA, decode_image, encode_png, generate_batch)

    pdf = generate_batch(0, 60)
    png = pdf[pdf.fmt == "png"].reset_index(drop=True)
    r = png.iloc[3]
    px = decode_image(r.bytes, "png")
    px[0, 0, 0] = np.uint8((int(px[0, 0, 0]) + 8) % 256)
    dup = pd.DataFrame([(f"dup-{r.image_id}", encode_png(px), r.w, r.h,
                         "png", r.caption, r.phash)], columns=pdf.columns)
    df = spark.createDataFrame(pd.concat([pdf, dup], ignore_index=True),
                               schema=IMAGES_SCHEMA)
    sig = {row.image_id: row.ahash for row in image_ahash(df).collect()}
    ham = bin((int(sig[r.image_id]) ^ int(sig[f"dup-{r.image_id}"]))
              & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 1
    others = [v for k, v in sig.items()
              if k not in (r.image_id, f"dup-{r.image_id}")]
    far = [bin((int(sig[r.image_id]) ^ int(v)) & 0xFFFFFFFFFFFFFFFF).count("1")
           for v in others]
    assert min(far) > 6   # unrelated noise images never pair

    pairs = image_neardup_pairs(df, max_hamming=6)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = [tuple(sorted((p.image_a, p.image_b))) for p in pairs.collect()]
    assert got == [tuple(sorted((r.image_id, f"dup-{r.image_id}")))]


def test_image_ahash_arbitrary_sizes(spark):
    """ahash must handle images whose size is not a multiple of 8 (block
    assignment by y*8//h) and stay deterministic."""
    import numpy as np
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import image_ahash
    from go_shapefile_spark.sources.images import IMAGES_SCHEMA, encode_png

    rng = np.random.default_rng(3)
    rows = []
    for i, (w, h) in enumerate([(10, 10), (7, 13), (8, 8), (24, 10)]):
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rows.append((f"odd-{i}", encode_png(px), w, h, "png", "c", i))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                      "fmt", "caption", "phash"])
    df = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    a = sorted((r.image_id, r.ahash) for r in image_ahash(df).collect())
    b = sorted((r.image_id, r.ahash) for r in image_ahash(df).collect())
    assert a == b and len(a) == 4


def test_image_neardup_flood_spanning_edges(spark):
    """A flood of identical images must not blow up the output (linear
    rep↔member edges, never O(flood²)), every flood member appears in an
    edge, and a 1-bit-off near-dup OF the flooded hash still pairs with
    the flood's representative."""
    import numpy as np
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import image_neardup_pairs
    from go_shapefile_spark.sources.images import IMAGES_SCHEMA, encode_png

    rng = np.random.default_rng(5)
    base_px = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    rows = [(f"flood-{i:04d}", encode_png(base_px), 16, 16, "png", "c", 0)
            for i in range(30)]
    near_px = base_px.copy()
    near_px[0, 0, 0] = np.uint8((int(near_px[0, 0, 0]) + 120) % 256)
    rows.append(("near-dup", encode_png(near_px), 16, 16, "png", "c", 1))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                    "fmt", "caption", "phash"]),
        schema=IMAGES_SCHEMA)
    pairs = image_neardup_pairs(df).toPandas()
    flood_pairs = pairs[pairs.image_a.str.startswith("flood")
                        & pairs.image_b.str.startswith("flood")]
    # linear spanning edges (rep ↔ 29 members), never C(30,2) = 435
    assert len(flood_pairs) == 29 and (flood_pairs.hamming == 0).all()
    touched = set(flood_pairs.image_a) | set(flood_pairs.image_b)
    assert len(touched) == 30   # every flood member appears in an edge
    near = pairs[(pairs.image_a == "near-dup") | (pairs.image_b == "near-dup")]
    # the near-dup pairs with the flood's representative
    assert len(near) == 1 and (near.hamming <= 3).all()
    assert len(pairs) == 30


def test_resize_bilinear_matches_per_pixel_reference():
    """Stacked bilinear == straightforward per-pixel bilinear (same
    half-pixel-center convention); constants are exactly preserved."""
    import numpy as np

    from go_shapefile_spark.operators.multimodal import resize_bilinear_stack

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    out = resize_bilinear_stack(img[None], 9, 4)[0]

    def ref_px(y, x, c):
        py = (y + 0.5) * 7 / 4 - 0.5
        px = (x + 0.5) * 5 / 9 - 0.5
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        fy, fx = py - y0, px - x0
        y0c, y1c = np.clip(y0, 0, 6), np.clip(y0 + 1, 0, 6)
        x0c, x1c = np.clip(x0, 0, 4), np.clip(x0 + 1, 0, 4)
        f = img.astype(np.float64)
        v = (f[y0c, x0c, c] * (1 - fy) * (1 - fx)
             + f[y0c, x1c, c] * (1 - fy) * fx
             + f[y1c, x0c, c] * fy * (1 - fx)
             + f[y1c, x1c, c] * fy * fx)
        return int(np.clip(np.round(v), 0, 255))

    for y in range(4):
        for x in range(9):
            for c in range(3):
                assert out[y, x, c] == ref_px(y, x, c), (y, x, c)

    const = np.full((1, 6, 6, 3), 77, dtype=np.uint8)
    assert (resize_bilinear_stack(const, 11, 3) == 77).all()


def test_augment_images_deterministic_and_seeded(spark):
    """Augmentation is reproducible row-for-row (same phash -> same
    crop/flip), flips match the seed law, and output shape is fixed."""
    import numpy as np

    from go_shapefile_spark.operators.geotag import splitmix64
    from go_shapefile_spark.operators.multimodal import augment_images
    from go_shapefile_spark.sources.images import IMAGES_SCHEMA, generate_batch

    pdf = generate_batch(0, 30)
    df = spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)
    a = augment_images(df, out_w=8, out_h=8).toPandas() \
        .set_index("image_id").sort_index()
    b = augment_images(df, out_w=8, out_h=8).toPandas() \
        .set_index("image_id").sort_index()
    assert len(a) == 30
    assert all(len(x) == 8 * 8 * 3 for x in a["aug"])
    assert (a["aug"] == b["aug"]).all() and (a["flipped"] == b["flipped"]).all()
    seeds = splitmix64(pdf["phash"].to_numpy().astype(np.int64))
    want_flip = ((seeds >> np.uint64(32)) & np.uint64(1)).astype(bool)
    got_flip = a.loc[pdf["image_id"], "flipped"].to_numpy()
    assert (got_flip == want_flip).all()
    # a flipped row un-flips to the unflipped pipeline's output
    no_flip = augment_images(df, out_w=8, out_h=8, hflip=False) \
        .toPandas().set_index("image_id")
    flipped_ids = a.index[a["flipped"]]
    assert len(flipped_ids) > 0
    for i in flipped_ids:
        got = np.frombuffer(a.loc[i, "aug"], np.uint8).reshape(8, 8, 3)
        base = np.frombuffer(no_flip.loc[i, "aug"],
                             np.uint8).reshape(8, 8, 3)
        assert np.array_equal(got[:, ::-1], base)


def test_augment_images_rejects_bad_crop_frac(spark):
    from go_shapefile_spark.operators.multimodal import augment_images
    from go_shapefile_spark.sources.images import IMAGES_SCHEMA, generate_batch

    df = spark.createDataFrame(generate_batch(0, 2), schema=IMAGES_SCHEMA)
    with pytest.raises(ValueError, match="crop_frac"):
        augment_images(df, crop_frac=1.2)
    with pytest.raises(ValueError, match="crop_frac"):
        augment_images(df, crop_frac=0.0)


def _png_df(spark, arrays):
    """Images DataFrame from (image_id, (h, w, 3) uint8 array) pairs."""
    import pandas as pd

    from go_shapefile_spark.sources.images import IMAGES_SCHEMA, encode_png

    rows = [(iid, encode_png(a), a.shape[1], a.shape[0], "png", "", 0)
            for iid, a in arrays]
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                      "fmt", "caption", "phash"])
    return spark.createDataFrame(pdf, schema=IMAGES_SCHEMA)


def test_extract_patches_positional_ramp(spark):
    """Every patch's bytes must equal the corresponding sub-array of a
    ramp image whose pixels encode their own coordinates — a wrong
    reshape/transpose axis order cannot pass (conservation sums would)."""
    import numpy as np

    from go_shapefile_spark.operators.multimodal import extract_patches

    h, w, p = 16, 24, 8
    ramp = ((np.arange(h)[:, None, None] * 31
             + np.arange(w)[None, :, None] * 7
             + np.arange(3)[None, None, :]) % 256).astype(np.uint8)
    out = extract_patches(_png_df(spark, [("r", ramp)]), patch=p).collect()
    assert len(out) == (h // p) * (w // p)
    for r in out:
        want = ramp[r.py * p:(r.py + 1) * p, r.px * p:(r.px + 1) * p]
        assert bytes(r.patch) == want.tobytes()
        assert r.psum == int(want.sum(dtype=np.int64))


def test_extract_patches_unaligned_and_small(spark):
    """Non-multiple dims center-crop (12x20, p=8 -> 1x2 grid at offset
    (2, 2)); images smaller than one patch emit nothing."""
    import numpy as np

    from go_shapefile_spark.operators.multimodal import extract_patches

    rng = np.random.default_rng(7)
    odd = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    tiny = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    out = extract_patches(_png_df(spark, [("odd", odd), ("tiny", tiny)]),
                          patch=8).collect()
    assert {r.image_id for r in out} == {"odd"}
    assert len(out) == 2
    for r in sorted(out, key=lambda r: r.px):
        want = odd[2:10, 2 + r.px * 8:2 + (r.px + 1) * 8]
        assert bytes(r.patch) == want.tobytes()


def test_image_pixel_sums_exact(spark):
    import numpy as np

    from go_shapefile_spark.operators.multimodal import image_pixel_sums

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (8, 24, 3), dtype=np.uint8)
    got = {r.image_id: (r.pix_sum, r.n_px) for r in image_pixel_sums(
        _png_df(spark, [("a", a), ("b", b)])).collect()}
    assert got == {"a": (int(a.sum(dtype=np.int64)), a.size),
                   "b": (int(b.sum(dtype=np.int64)), b.size)}


def test_zonal_image_stats_matches_bruteforce(spark):
    """The zonal-stats composition (geotag -> decode checksum -> engine
    spatial join -> per-zone rollup) on a tiny generated corpus equals
    a decode-free numpy brute force: regenerate lon/lat and PNG pixel
    sums from the generator algebra and do containment by hand."""
    import numpy as np
    from pyspark.sql import functions as F

    from go_shapefile_spark.operators.geotag import lonlat_np, splitmix64
    from go_shapefile_spark.operators.multimodal import image_pixel_sums
    from go_shapefile_spark.operators.spatial_join import spatial_join
    from go_shapefile_spark.sources.images import (
        generate_batch, geotag_images, pixels_from_phash)

    n = 40
    imgs = spark.createDataFrame(generate_batch(0, n))
    pts = geotag_images(imgs.select("image_id", "phash", "fmt")) \
        .join(image_pixel_sums(imgs), "image_id")
    # two hemispheric rects: together they cover every point except the
    # measure-zero lon==0 seam, so membership is non-trivial per zone
    rects = [(1, -180.0, -90.0, 0.0, 90.0), (2, 0.0, -90.0, 180.0, 90.0)]
    polygons = []
    for fid, x0, y0, x1, y1 in rects:
        ring = [x0, y0, x0, y1, x1, y1, x1, y0, x0, y0]
        polygons.append({"fid": fid, "coords": np.array(ring), "ends": [10]})
    is_png = F.col("fmt") == "png"
    got = {r.polygon_fid: (r.n_images, r.png_pix_sum)
           for r in spatial_join(
               spark, pts, polygons, res=3,
               keep_cols=["image_id", "polygon_fid", "fmt", "pix_sum"])
           .groupBy("polygon_fid")
           .agg(F.count(F.lit(1)).alias("n_images"),
                F.sum(F.when(is_png, F.col("pix_sum")).otherwise(F.lit(0)))
                 .alias("png_pix_sum")).collect()}

    idx = np.arange(n, dtype=np.int64)
    phash = splitmix64(idx).view(np.int64)
    sizes = 8 + (phash % 3).astype(np.int64) * 8
    lon, _lat = lonlat_np(phash)
    want = {}
    for fid, sel in ((1, lon < 0.0), (2, lon > 0.0)):
        psum = sum(int(pixels_from_phash(int(p), int(s), int(s))
                       .sum(dtype=np.int64))
                   for i, p, s in zip(idx[sel], phash[sel], sizes[sel])
                   if i % 10 != 9)
        want[fid] = (int(sel.sum()), psum)
    assert got == want


def test_render_heatmap_tiles_matches_reference_bytes(spark):
    import hashlib
    import numpy as np
    from go_shapefile_spark.operators.render import (
        RENDER_SCALE, render_heatmap_tiles, render_tiles_reference)
    from go_shapefile_spark.sources.images import decode_image

    exp = {(tx, ty): (npx, si, md5)
           for tx, ty, npx, si, md5 in render_tiles_reference(n_ids=2000)}
    rows = render_heatmap_tiles(spark, n_ids=2000).collect()
    got = {(r.tx, r.ty): (r.n_px, r.sum_intensity, r.png_md5) for r in rows}
    assert got == exp
    # served bytes hash to the declared md5 and decode to a real image
    for r in rows:
        assert hashlib.md5(bytes(r.png)).hexdigest() == r.png_md5
        img = decode_image(bytes(r.png), "png")
        assert img.shape == (64, 64, 3)
        assert img.max() > 0 and img.max() <= 255
        # grayscale (r == g == b) and quantized by the scale factor
        assert np.array_equal(img[:, :, 0], img[:, :, 1])
        vals = np.unique(img[:, :, 0])
        assert all(v == 255 or v % RENDER_SCALE == 0 for v in vals)


def test_render_tile_orientation_north_up():
    import numpy as np
    from go_shapefile_spark.operators.render import _render_tile_png
    from go_shapefile_spark.sources.images import decode_image
    # single pixel at (x=3, y=60) in tile (0,0) of 64px: row = 63-60
    png = _render_tile_png(0, 0, np.array([3]), np.array([60]),
                           np.array([10]), 64)
    img = decode_image(png, "png")
    assert img[63 - 60, 3, 0] == 40 and img.sum() == 3 * 40


def test_image_quality_stats_analytic_and_reference(spark):
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import image_quality_stats
    from go_shapefile_spark.sources.images import encode_png

    # constant image: luma = 299c+587c+114c = 1000c, laplacian = 0
    const = np.full((5, 4, 3), 7, dtype=np.uint8)
    # checkerboard in all channels: luma alternates 0 / 255000;
    # interior laplacian = 4L - 4*opposite = ±4*255000 ∓ ... compute
    # via the independent reference below instead of by hand
    cb = (np.indices((6, 6)).sum(axis=0) % 2 * 255).astype(np.uint8)
    checker = np.stack([cb] * 3, axis=-1)
    rng = np.random.default_rng(3)
    rand = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)

    def reference(px):
        s = px.astype(object)  # python ints: no overflow by construction
        h, w, _ = px.shape
        L = [[299 * int(s[y][x][0]) + 587 * int(s[y][x][1])
              + 114 * int(s[y][x][2]) for x in range(w)] for y in range(h)]
        sl = sum(v for row in L for v in row)
        sl2 = sum(v * v for row in L for v in row)
        lap = [4 * L[y][x] - L[y - 1][x] - L[y + 1][x]
               - L[y][x - 1] - L[y][x + 1]
               for y in range(1, h - 1) for x in range(1, w - 1)]
        return (h * w, sl, sl2, len(lap),
                sum(lap), sum(v * v for v in lap))

    pdf = pd.DataFrame({
        "image_id": ["const", "checker", "rand"],
        "bytes": [encode_png(const), encode_png(checker), encode_png(rand)],
        "w": [4, 6, 8], "h": [5, 6, 8],
        "fmt": ["png"] * 3, "caption": [""] * 3, "phash": [0, 1, 2]})
    sdf = spark.createDataFrame(
        pdf, schema=("image_id string, bytes binary, w int, h int, "
                     "fmt string, caption string, phash long"))
    got = {r["image_id"]: r for r in image_quality_stats(sdf).collect()}
    for name, px in (("const", const), ("checker", checker), ("rand", rand)):
        n_pix, sl, sl2, n_int, slap, slap2 = reference(px)
        row = got[name]
        assert (row["n_pix"], row["sum_luma"], row["sum_luma2"],
                row["n_int"], row["sum_lap"], row["sum_lap2"]) == \
            (n_pix, sl, sl2, n_int, slap, slap2), name
    assert got["const"]["sum_lap2"] == 0
    assert got["const"]["sum_luma"] == 5 * 4 * 7000


def test_video_fingerprint_neardup_and_strict(spark):
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import (
        video_fingerprint, video_neardup_pairs)
    from go_shapefile_spark.sources.images import (
        JPEG_QUALITY, pixels_from_phash, splitmix64)
    from go_shapefile_spark.sources.video_codec import encode_avi_mjpeg

    rows = []
    for i in range(6):
        ph = int(splitmix64(np.array([i], np.int64)).view(np.int64)[0])
        frames = [pixels_from_phash(ph + fi, 16, 16) for fi in range(8)]
        rows.append((f"vid-{i}", encode_avi_mjpeg(frames, JPEG_QUALITY),
                     8, 16, 16, "avi-mjpeg", ph))
        if i < 2:  # perturbed re-encode of the source frames
            pf = []
            for f in frames:
                f2 = f.copy()
                f2[0, 0, 0] = np.uint8((int(f2[0, 0, 0]) + 8) % 256)
                pf.append(f2)
            rows.append((f"dup-vid-{i}",
                         encode_avi_mjpeg(pf, JPEG_QUALITY),
                         8, 16, 16, "avi-mjpeg", ph))
    pdf = pd.DataFrame(rows, columns=["video_id", "bytes", "n_frames",
                                      "w", "h", "fmt", "phash"])
    schema = ("video_id string, bytes binary, n_frames int, w int, "
              "h int, fmt string, phash long")
    sdf = spark.createDataFrame(pdf, schema=schema)
    pairs = {(r["video_a"], r["video_b"]): r["hamming"]
             for r in video_neardup_pairs(sdf).collect()}
    found = {tuple(sorted(k)) for k in pairs}
    assert found == {("dup-vid-0", "vid-0"), ("dup-vid-1", "vid-1")}
    assert all(h <= 3 for h in pairs.values())

    # strict mode rejects a non-AVI payload; stub path accepts it
    bad = spark.createDataFrame(
        pd.DataFrame([("x", b"notavi", 4, 16, 16, "mp4", 7)],
                     columns=pdf.columns), schema=schema)
    with pytest.raises(Exception, match="no codec"):
        video_fingerprint(bad).collect()
    assert len(video_fingerprint(bad, stub_ok=True).collect()) == 1


def test_phash_dct_invariances_and_resize_robustness():
    from go_shapefile_spark.operators.multimodal import (
        PHASH_DIM, _dct_matrix, _phash_gray_stack, resize_bilinear_stack)
    from go_shapefile_spark.sources.images import (
        decode_image, encode_png, generate_batch)

    # orthonormality of the DCT basis
    d = _dct_matrix(PHASH_DIM)
    assert np.allclose(d @ d.T, np.eye(PHASH_DIM), atol=1e-12)

    rng = np.random.default_rng(3)
    gray = rng.uniform(60.0, 180.0, (5, PHASH_DIM, PHASH_DIM))
    base = _phash_gray_stack(gray)
    # brightness shift moves only the DC coefficient -> hash unchanged
    assert np.array_equal(_phash_gray_stack(gray + 30.0), base)
    # positive contrast scaling scales coeffs AND their median together
    assert np.array_equal(_phash_gray_stack(gray * 1.5), base)
    # DC bit is forced off
    assert not np.any(base & np.uint64(1))

    # resize robustness on the real corpus: rescaled re-encoded copies
    # land within 8 bits; unrelated images stay >= 12 apart
    def phash_imgs(imgs):
        out = np.zeros(len(imgs), dtype=np.uint64)
        for shape in set(i.shape for i in imgs):
            idxs = [j for j, im in enumerate(imgs) if im.shape == shape]
            small = resize_bilinear_stack(
                np.stack([imgs[j] for j in idxs]), PHASH_DIM, PHASH_DIM)
            out[idxs] = _phash_gray_stack(
                small.astype(np.float64).mean(axis=3))
        return out

    pdf = generate_batch(0, 120)
    imgs = [decode_image(r.bytes, r.fmt) for r in pdf.itertuples(index=False)]
    h = phash_imgs(imgs)
    copies = []
    for j in range(30):
        im = imgs[j]
        big = resize_bilinear_stack(im[None], im.shape[1] + 8,
                                    im.shape[0] + 8)[0]
        copies.append(decode_image(encode_png(big), "png"))
    hc = phash_imgs(copies)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert max(ham(h[j], hc[j]) for j in range(30)) <= 8
    unrel = min(ham(h[a], h[b]) for a in range(60) for b in range(a + 1, 60))
    assert unrel >= 12


def test_multiprobe_banding_exact_recall(spark):
    """probe_radius=2 must find EVERY pair at Hamming <= 10 even when
    the differing bits are spread adversarially across all 4 bands
    (plain banding's worst case); brute force is the reference."""
    from go_shapefile_spark.operators.multimodal import banded_hash_pairs

    rng = np.random.default_rng(17)
    base = rng.integers(0, 2**63, 12, dtype=np.int64)
    rows = [(f"b{i:02d}", int(v)) for i, v in enumerate(base)]
    # partners: k diffs spread round-robin over the 4 bands (so a band
    # never holds more than ceil(k/4) <= 2 of them for k <= 8, and for
    # k = 10 one band holds 3 -> still some band with <= 2: covered)
    for i, v in enumerate(base):
        k = (i % 6) + 5  # 5..10 differing bits
        mask = 0
        for d in range(k):
            band = d % 4
            bit = 16 * band + (d // 4) * 5 + (i % 3)
            mask |= 1 << bit
        rows.append((f"p{i:02d}", int(np.int64(np.uint64(v) ^ np.uint64(mask)))))
    sig = spark.createDataFrame(rows, "image_id string, h long")

    got = {tuple(sorted((r.image_a, r.image_b)))
           for r in banded_hash_pairs(sig, "image_id", "h",
                                      "image_a", "image_b",
                                      max_hamming=10,
                                      probe_radius=2).collect()}
    want = set()
    for ia, va in rows:
        for ib, vb in rows:
            if ia < ib and bin((va ^ vb) & (2**64 - 1)).count("1") <= 10:
                want.add((ia, ib))
    assert got == want and len(want) >= 12


def test_luma_histogram_analytic(spark):
    from go_shapefile_spark.operators.multimodal import (
        LUMA_HIST_BINS, image_luma_histogram, luma_hist_stack)

    # constant mid-gray image: every pixel in one bin
    const = np.full((1, 6, 6, 3), 100, dtype=np.uint8)   # luma 100 -> bin 6
    h = luma_hist_stack(const)[0]
    assert h[100 // LUMA_HIST_BINS] == 36 and h.sum() == 36

    # gray ramp 0..255 over 256 pixels: exactly 16 per bin
    ramp = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    ramp = np.stack([ramp, ramp, ramp], axis=-1)
    h = luma_hist_stack(ramp)[0]
    # integer luma of gray g is (299g+587g+114g)//1000 == g exactly
    assert np.array_equal(h, np.full(16, 16))

    # Spark long-format emission over PNG bytes
    import pandas as pd

    from go_shapefile_spark.sources.images import encode_png

    pdf = pd.DataFrame({
        "image_id": ["c", "r"],
        "bytes": [encode_png(const[0]), encode_png(ramp[0])],
        "w": [6, 16], "h": [6, 16], "fmt": ["png", "png"],
        "caption": ["", ""], "phash": [0, 1]})
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    out = image_luma_histogram(spark.createDataFrame(pdf, schema=schema))
    rows = {(r.image_id, r.bin): r.n for r in out.collect()}
    assert len(rows) == 32
    assert rows[("c", 6)] == 36 and rows[("r", 3)] == 16


def test_render_hillshade_tiles_matches_reference_bytes(spark):
    import hashlib

    from go_shapefile_spark.operators.render import (
        hillshade_reference, render_hillshade_tiles)
    from go_shapefile_spark.sources.images import decode_image

    exp = {(tx, ty): (npx, md5)
           for tx, ty, npx, md5 in hillshade_reference(n_ids=2000)}
    rows = render_hillshade_tiles(spark, n_ids=2000).collect()
    got = {(r.tx, r.ty): (r.n_px, r.png_md5) for r in rows}
    assert got == exp
    shades = set()
    for r in rows:
        assert hashlib.md5(bytes(r.png)).hexdigest() == r.png_md5
        img = decode_image(bytes(r.png), "png")
        assert img.shape == (64, 64, 3)
        assert np.array_equal(img[:, :, 0], img[:, :, 1])
        shades.update(np.unique(img[:, :, 0]).tolist())
    # real relief: many distinct shade levels, not a binary mask
    assert len(shades) > 32


def test_image_headers_match_decode_shapes():
    """jpeg_header/png_header report exactly the decoded array's shape
    for random images of every corpus size, both encoders."""
    from go_shapefile_spark.sources.images import (decode_image,
                                                   encode_png,
                                                   pixels_from_phash,
                                                   png_header)
    from go_shapefile_spark.sources.jpeg_codec import (decode_jpeg,
                                                       encode_jpeg,
                                                       jpeg_header)

    for ph in (1, 99, 54321):
        for s in (8, 16, 24):
            px = pixels_from_phash(ph, s, s)
            jb = encode_jpeg(px, 98)
            hd = jpeg_header(jb)
            assert (hd["h"], hd["w"]) == decode_jpeg(jb).shape[:2]
            assert hd["n_comps"] == 3 and not hd["progressive"]
            assert (hd["max_h"], hd["max_v"]) == (1, 1)
            pb = encode_png(px)
            hp = png_header(pb)
            assert (hp["h"], hp["w"]) == decode_image(pb, "png").shape[:2]
            assert hp["n_comps"] == 3 and not hp["progressive"]


def test_jpeg_header_never_reads_entropy_data():
    """Truncating the stream right after the SOS header leaves the
    metadata intact — evidence the scan stops before entropy decode
    (the decoder itself must fail on the same bytes)."""
    import pytest

    from go_shapefile_spark.sources.images import pixels_from_phash
    from go_shapefile_spark.sources.jpeg_codec import (decode_jpeg,
                                                       encode_jpeg,
                                                       jpeg_header)

    buf = encode_jpeg(pixels_from_phash(7, 16, 16), 98)
    sos = buf.index(b"\xff\xda")
    seglen = int.from_bytes(buf[sos + 2:sos + 4], "big")
    chopped = buf[:sos + 2 + seglen]         # header only, zero entropy
    hd = jpeg_header(chopped)
    assert (hd["w"], hd["h"], hd["n_comps"]) == (16, 16, 3)
    with pytest.raises(ValueError):
        decode_jpeg(chopped)


def test_image_header_error_contracts():
    import pytest

    from go_shapefile_spark.sources.images import png_header
    from go_shapefile_spark.sources.jpeg_codec import jpeg_header

    with pytest.raises(ValueError, match="SOI"):
        jpeg_header(b"\x00" * 8)
    with pytest.raises(ValueError, match="signature"):
        png_header(b"\x00" * 40)
    # sampling-factor validation mirrors the decoder (ADVICE r4)
    sof = (b"\xff\xd8\xff\xc0" + (8 + 9).to_bytes(2, "big")
           + b"\x08" + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
           + b"\x03" + b"\x01\x00\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    with pytest.raises(ValueError, match="sampling factors"):
        jpeg_header(sof)


def test_image_metadata_operator_rollup(spark):
    """The Spark operator catalogs a mixed mini-corpus (png + baseline
    jpeg + a planted progressive stream) with exact per-format rows."""
    import pandas as pd

    from go_shapefile_spark.operators.multimodal import image_metadata
    from go_shapefile_spark.sources.images import (encode_png,
                                                   pixels_from_phash)
    from go_shapefile_spark.sources.jpeg_codec import encode_jpeg

    rows = []
    for i, s in enumerate((8, 16, 24)):
        px = pixels_from_phash(i + 1, s, s)
        rows.append((f"p{i}", "png", bytearray(encode_png(px))))
        rows.append((f"j{i}", "jpeg", bytearray(encode_jpeg(px, 95))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "fmt", "bytes"]))
    got = {r.image_id: (r.fmt, r.width, r.height, r.n_comps,
                        r.progressive, r.sampling)
           for r in image_metadata(df).collect()}
    for i, s in enumerate((8, 16, 24)):
        assert got[f"p{i}"] == ("png", s, s, 3, 0, "1x1")
        assert got[f"j{i}"] == ("jpeg", s, s, 3, 0, "1x1")
