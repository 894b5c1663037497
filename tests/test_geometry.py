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


def _ref_dp(x, y, eps):
    """Independent recursive Douglas–Peucker (same segment-distance
    metric, different traversal/accumulation) returning kept indices."""
    def seg_d(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            return math.hypot(px - ax, py - ay)
        t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
        return math.hypot(px - (ax + t * dx), py - (ay + t * dy))

    def rec(i, j, out):
        if j <= i + 1:
            return
        ds = [seg_d(x[k], y[k], x[i], y[i], x[j], y[j])
              for k in range(i + 1, j)]
        k = max(range(len(ds)), key=lambda m: ds[m]) + i + 1
        if ds[k - i - 1] > eps:
            rec(i, k, out)
            out.append(k)
            rec(k, j, out)

    out = [0]
    rec(0, len(x) - 1, out)
    out.append(len(x) - 1)
    return out


def test_dp_mask_matches_recursive_reference_on_fixtures():
    from go_shapefile_spark.operators.geometry import dp_keep_mask
    from go_shapefile_spark.sources.shapefile_core import read_zip

    sf = read_zip("/root/reference/testdata/110m-admin-0-countries.zip")
    checked = 0
    for rec in sf.shp.records:
        prev = 0
        for end in rec.ends:
            x, y = rec.coords[prev:end:2], rec.coords[prev + 1:end:2]
            prev = end
            for eps in (0.05, 0.3):
                m = dp_keep_mask(x, y, eps)
                assert list(np.flatnonzero(m)) == _ref_dp(x, y, eps)
                checked += 1
    assert checked > 500


def test_dp_within_eps_guarantee():
    """Every dropped vertex of a kept ring is within eps of the
    simplified chain (brute-force min distance over all kept segments)."""
    from go_shapefile_spark.operators.geometry import dp_keep_mask
    from go_shapefile_spark.sources.shapefile_core import read_zip

    eps = 0.2
    sf = read_zip("/root/reference/testdata/110m-admin-0-countries.zip")
    for rec in sf.shp.records[:40]:
        prev = 0
        for end in rec.ends:
            x, y = rec.coords[prev:end:2], rec.coords[prev + 1:end:2]
            prev = end
            m = dp_keep_mask(x, y, eps)
            kx, ky = x[m], y[m]
            for i in np.flatnonzero(~m):
                ax, ay, bx, by = kx[:-1], ky[:-1], kx[1:], ky[1:]
                dx, dy = bx - ax, by - ay
                l2 = np.where(dx * dx + dy * dy == 0, 1.0,
                              dx * dx + dy * dy)
                t = np.clip(((x[i] - ax) * dx + (y[i] - ay) * dy) / l2,
                            0.0, 1.0)
                d = np.hypot(x[i] - (ax + t * dx), y[i] - (ay + t * dy))
                assert d.min() <= eps + 1e-12


def test_simplify_ring_drop_policies():
    from go_shapefile_spark.operators.geometry import simplify_feature

    sq = [0, 0, 0, 10, 10, 10, 10, 0, 0, 0]                    # outer CW
    tiny = [1, 1, 1.02, 1, 1.02, 1.02, 1, 1.02, 1, 1]          # small hole
    # hole below tolerance is dropped, outer survives
    c, e, rg = simplify_feature(5, "XY", np.array(sq + tiny, float),
                                [10, 20], [2], eps=0.1)
    assert e == [10] and rg == [1] and len(c) == 10
    # whole feature below tolerance -> None
    assert simplify_feature(5, "XY", np.array(tiny, float), [10], [1],
                            eps=0.1) is None
    # dropping the OUTER drops its hole; the second polygon survives
    tiny_h = [1.005, 1.005, 1.005, 1.015, 1.015, 1.015, 1.015, 1.005,
              1.005, 1.005]
    c2, e2, rg2 = simplify_feature(
        5, "XY", np.array(tiny + tiny_h + sq, float), [10, 20, 30],
        [2, 1], eps=0.1)
    assert e2 == [10] and rg2 == [1] and list(c2) == sq
    # polyline: endpoints kept, interior collinear points dropped
    c3, e3, rg3 = simplify_feature(
        3, "XY", np.array([0, 0, 1, 0.001, 2, 0, 5, 5, 6, 6], float),
        [6, 10], [], eps=0.01)
    assert e3 == [4, 8] and rg3 == [] and \
        list(c3) == [0, 0, 2, 0, 5, 5, 6, 6]
    with pytest.raises(ValueError, match="unsupported shape type"):
        simplify_feature(1, "XY", np.array([1.0, 2.0]), [2], [], eps=0.1)


def test_simplify_spark_composes_with_measures(spark):
    """simplify_features output feeds geom_measures; rows match the
    driver kernels on every surviving ne_110m feature."""
    from go_shapefile_spark.operators.geometry import (feature_measures,
                                                       geom_measures,
                                                       simplify_feature,
                                                       simplify_features)
    from go_shapefile_spark.sources.shapefile import read_shapefile_df
    from go_shapefile_spark.sources.shapefile_core import read_zip

    z = "/root/reference/testdata/110m-admin-0-countries.zip"
    simp = simplify_features(read_shapefile_df(spark, z), eps=0.1)
    got = {r.fid: (r.area, r.perimeter)
           for r in geom_measures(simp).collect()}
    sf = read_zip(z)
    want = {}
    for i, rec in enumerate(sf.shp.records):
        rings = [len(e) for e in rec.endss] if rec.endss \
            else [1] * len(rec.ends)
        s = simplify_feature(rec.shape_type, rec.layout, rec.coords,
                             rec.ends, rings, eps=0.1)
        if s is not None:
            a, ln, _, _ = feature_measures(rec.shape_type, rec.layout,
                                           s[0], s[1])
            want[i + 1] = (a, ln)
    assert got == want and len(got) > 150
    # simplification actually simplified: strictly fewer vertices overall
    n_in = sum(len(r.coords) for r in sf.shp.records)
    n_out = sum(len(s[0]) for s in
                (simplify_feature(rec.shape_type, rec.layout, rec.coords,
                                  rec.ends,
                                  [len(e) for e in rec.endss] if rec.endss
                                  else [1] * len(rec.ends), 0.1)
                 for rec in sf.shp.records) if s is not None)
    # ne_110m is already generalized; eps=0.1 deg still trims ~20%
    assert n_out < 0.9 * n_in


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
