"""Geometry measures: analytic shapes, independent reference, Spark parity."""

import math

import numpy as np
import pytest


def _ref_measures(coords, ends, stride=2):
    """Independent sequential pure-Python shoelace/length/centroid
    (different accumulation order and code path from the numpy kernel)."""
    a2 = per = cx6 = cy6 = 0.0
    prev = 0
    for end in ends:
        pts = [(coords[i], coords[i + 1]) for i in range(prev, end, stride)]
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            cross = x0 * y1 - x1 * y0
            a2 += cross
            per += math.hypot(x1 - x0, y1 - y0)
            cx6 += (x0 + x1) * cross
            cy6 += (y0 + y1) * cross
        prev = end
    area = -a2 / 2.0
    if a2 == 0.0:
        xs = coords[0::stride]
        return area, per, float(np.mean(xs)), float(np.mean(coords[1::stride]))
    return area, per, cx6 / (3.0 * a2), cy6 / (3.0 * a2)


def test_square_with_hole_exact():
    from go_shapefile_spark.operators.geometry import feature_measures

    sq = [0, 0, 0, 1, 1, 1, 1, 0, 0, 0]                      # outer CW
    hole = [0.25, 0.25, 0.5, 0.25, 0.5, 0.5, 0.25, 0.5, 0.25, 0.25]  # CCW
    a, ln, cx, cy = feature_measures(5, "XY", np.array(sq + hole, float),
                                     [10, 20])
    assert a == 1.0 - 0.0625 and ln == 5.0
    # hole centered at (0.375, 0.375) pushes the centroid toward (1, 1)
    assert cx == cy and 0.5 < cx < 0.52


def test_polyline_and_rejection():
    from go_shapefile_spark.operators.geometry import feature_measures

    line = [0, 0, 3, 4, 3, 0]
    a, ln, cx, cy = feature_measures(3, "XY", np.array(line, float), [6])
    assert a == 0.0 and ln == 9.0 and cx == 2.0 and cy == pytest.approx(4 / 3)
    with pytest.raises(ValueError, match="unsupported shape type"):
        feature_measures(1, "XY", np.array([1.0, 2.0]), [2])


def test_measures_match_independent_reference_on_fixtures():
    """The vectorized kernel equals the sequential reference on every
    real ne_110m country (holes, multi-part, high vertex counts)."""
    from go_shapefile_spark.operators.geometry import feature_measures
    from go_shapefile_spark.sources.shapefile_core import read_zip

    sf = read_zip("/root/reference/testdata/110m-admin-0-countries.zip")
    for rec in sf.shp.records:
        got = feature_measures(rec.shape_type, rec.layout, rec.coords,
                               rec.ends)
        want = _ref_measures(rec.coords, rec.ends)
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-12, abs=1e-12)
        assert got[0] > 0          # shapefile winding ⇒ positive area


def test_geom_measures_spark_matches_driver_kernel(spark):
    from go_shapefile_spark.operators.geometry import (feature_measures,
                                                       geom_measures)
    from go_shapefile_spark.sources.shapefile import read_shapefile_df
    from go_shapefile_spark.sources.shapefile_core import read_zip

    z = "/root/reference/testdata/110m-admin-0-countries.zip"
    got = {r.fid: (r.area, r.perimeter, r.cx, r.cy)
           for r in geom_measures(read_shapefile_df(spark, z)).collect()}
    sf = read_zip(z)
    assert len(got) == 177
    for i, rec in enumerate(sf.shp.records):
        assert got[i + 1] == feature_measures(
            rec.shape_type, rec.layout, rec.coords, rec.ends)
