"""GeoJSON interchange: bit-exact roundtrip, nesting semantics, rejection."""

import json
import os

import numpy as np
import pytest

from go_shapefile_spark.functions.geojson import (
    features_to_geojson, geojson_to_features, geojson_to_geometry,
    geometry_to_geojson,
)
from go_shapefile_spark.sources import shapefile_core as core
from go_shapefile_spark.sources.shapefile import read_shapefile_df


def test_polygon_nesting_with_hole():
    """A polygon with a hole maps to MultiPolygon [[outer, hole]] — the
    hole stays attached to ITS polygon, not promoted to a sibling."""
    outer = [0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0, 0.0, 0.0]
    hole = [2.0, 2.0, 4.0, 2.0, 4.0, 4.0, 2.0, 4.0, 2.0, 2.0]
    g = geometry_to_geojson(core.SHAPE_TYPE_POLYGON, "XY", outer + hole,
                            ends=[10, 20], rings=[2])
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 1          # one polygon
    assert len(g["coordinates"][0]) == 2       # outer + hole
    assert g["coordinates"][0][0][0] == [0.0, 0.0]
    assert g["coordinates"][0][1][0] == [2.0, 2.0]
    st, layout, coords, ends, rings = geojson_to_geometry(g)
    assert (st, layout) == (core.SHAPE_TYPE_POLYGON, "XY")
    assert coords == outer + hole and ends == [10, 20] and rings == [2]


def test_point_line_multipoint_roundtrip():
    cases = [
        (core.SHAPE_TYPE_POINT, [3.5, -7.25], [], []),
        (core.SHAPE_TYPE_MULTIPOINT, [1.0, 2.0, 3.0, 4.0], [], []),
        (core.SHAPE_TYPE_POLYLINE, [0.0, 0.0, 1.0, 1.0, 5.0, 5.0, 6.0, 7.0],
         [4, 8], []),
    ]
    for st, coords, ends, rings in cases:
        g = geometry_to_geojson(st, "XY", coords, ends, rings)
        st2, _, c2, e2, r2 = geojson_to_geometry(g)
        assert (st2, c2, e2, r2) == (st, coords, ends, rings)


def test_geojson_rejects_unsupported():
    with pytest.raises(ValueError):
        geojson_to_geometry({"type": "GeometryCollection", "geometries": []})
    with pytest.raises(ValueError):
        geojson_to_geometry({"type": "Point",
                             "coordinates": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError):
        geometry_to_geojson(core.SHAPE_TYPE_MULTIPATCH, "XY", [], [], [])


def test_countries_roundtrip_bit_exact(spark, ref_testdata):
    """Full ne_110m corpus: export → parse → every coordinate, ring end,
    and polygon grouping identical; Feature properties carried."""
    feats = read_shapefile_df(
        spark, os.path.join(ref_testdata, "110m-admin-0-countries.zip"))
    gj = features_to_geojson(feats, props=["NAME"])
    sample = json.loads(gj.first().geojson)
    assert sample["type"] == "Feature" and "NAME" in sample["properties"]
    back = {r.fid: r for r in geojson_to_features(gj).collect()}
    orig = {r.fid: r for r in feats.select("fid", "geometry").collect()}
    assert set(back) == set(orig) and len(back) == 177
    for fid, o in orig.items():
        b = back[fid]
        assert list(o.geometry.coords) == list(b.geometry.coords)
        assert list(o.geometry.ends) == list(b.geometry.ends)
        assert list(o.geometry.rings) == list(b.geometry.rings)
