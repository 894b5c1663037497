"""Write→read roundtrip: independently constructed shapefiles must parse
back bit-exact through both the core parser and the Spark source."""

import numpy as np
import pytest

from go_shapefile_spark.sources.shapefile_core import read_shapefile
from go_shapefile_spark.sources.shapefile_writer import (
    write_points, write_polygons,
)


def test_points_roundtrip_core(tmp_path):
    rng = np.random.default_rng(8)
    xs = rng.uniform(-180, 180, 500)
    ys = rng.uniform(-90, 90, 500)
    base = str(tmp_path / "pts")
    write_points(base, xs, ys,
                 fields=[("ID", "N", 8), ("NAME", "C", 12)],
                 rows=[[i, f"pt{i}"] for i in range(500)])
    sf = read_shapefile(base)
    assert sf.num_records() == 500
    got_x = np.array([r.coords[0] for r in sf.shp.records])
    got_y = np.array([r.coords[1] for r in sf.shp.records])
    np.testing.assert_array_equal(got_x, xs)   # bit-exact
    np.testing.assert_array_equal(got_y, ys)
    assert sf.dbf.record(7) == {"ID": 7, "NAME": "pt7"}
    assert len(sf.shx.offsets) == 500


def test_points_fast_path_matches_core(spark, tmp_path):
    """The vectorized point decode must return exactly what the
    per-record parser returns (and what was written)."""
    rng = np.random.default_rng(9)
    xs = rng.uniform(-180, 180, 2000)
    ys = rng.uniform(-90, 90, 2000)
    base = str(tmp_path / "fastpts")
    write_points(base, xs, ys, fields=[("ID", "N", 8)],
                 rows=[[i] for i in range(2000)])

    from go_shapefile_spark.sources.shapefile import read_shapefile_df
    df = read_shapefile_df(spark, base, target_records_per_split=700)
    pdf = df.select("fid", "geometry.coords").toPandas().sort_values("fid")
    got = np.array([c[0] for c in pdf["coords"]])
    np.testing.assert_array_equal(got, xs)
    got_y = np.array([c[1] for c in pdf["coords"]])
    np.testing.assert_array_equal(got_y, ys)


def test_polygons_roundtrip_spark(spark, tmp_path):
    # two CW squares, the second with a CCW hole
    sq = lambda x, y, s: [x, y, x, y + s, x + s, y + s, x + s, y, x, y]
    hole = [12.0, 12.0, 16.0, 12.0, 16.0, 16.0, 12.0, 16.0, 12.0, 12.0]  # CCW
    polys = [
        {"coords": np.array(sq(0, 0, 5)), "ends": [10]},
        {"coords": np.array(sq(10, 10, 8) + hole), "ends": [10, 20]},
    ]
    base = str(tmp_path / "poly")
    write_polygons(base, polys, fields=[("TAG", "C", 4)],
                   rows=[["a"], ["b"]])

    from go_shapefile_spark.sources.shapefile import read_shapefile_df
    df = read_shapefile_df(spark, base)
    rows = {r.fid: r for r in df.collect()}
    assert len(rows) == 2
    assert list(rows[1].geometry.coords) == sq(0, 0, 5)
    # winding decomposition: polygon 2 = one outer ring + one hole
    assert list(rows[2].geometry.rings) == [2]
    assert rows[2].TAG == "b"
    # the hole is excluded by PIP
    from go_shapefile_spark.functions.geom_np import point_in_polygon
    inside = point_in_polygon(np.array([14.0, 11.0]), np.array([14.0, 11.0]),
                              np.array(sq(10, 10, 8) + hole), [10, 20])
    assert not inside[0]      # center of hole
    assert inside[1]          # inside outer, outside hole


def test_writer_files_parse_like_reference_fixture(tmp_path, ref_testdata):
    """A written file and a reference fixture parse through the exact
    same code path — guard: no writer-specific leniency in the parser."""
    import os

    from go_shapefile_spark.operators.spatial_join import polygons_from_features
    base = str(tmp_path / "one")
    ring = [0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0, 0.0, 0.0, 0.0]
    write_polygons(base, [{"coords": np.array(ring), "ends": [10]}])
    sf = read_shapefile(base)
    ref = read_shapefile(os.path.join(ref_testdata, "polygon_hole"))
    assert type(sf.shp.records[0]) is type(ref.shp.records[0])
    assert sf.shp.records[0].endss == [[10]]


def test_float_n_roundtrip(spark, tmp_path):
    """N columns with a decimal count write byte 17 and read back as
    DoubleType with exact fixed-point values (writer decimals fix)."""
    from go_shapefile_spark.sources.shapefile import read_shapefile_df

    rng = np.random.default_rng(11)
    xs = rng.uniform(-10, 10, 40)
    ys = rng.uniform(-10, 10, 40)
    vals = np.round(rng.uniform(-1000, 1000, 40), 3)
    base = str(tmp_path / "floats")
    write_points(base, xs, ys,
                 fields=[("ID", "N", 8), ("VAL", "N", 12, 3)],
                 rows=[[i, float(v)] for i, v in enumerate(vals)])
    sf = read_shapefile(base)
    assert sf.dbf.record(3)["VAL"] == float(f"{vals[3]:.3f}")
    df = read_shapefile_df(spark, base).orderBy("fid")
    dt = dict(df.dtypes)
    assert dt["VAL"] == "double" and dt["ID"] == "bigint"
    got = [r.VAL for r in df.collect()]
    assert got == [float(f"{v:.3f}") for v in vals]
