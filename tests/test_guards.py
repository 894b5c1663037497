"""Resource-guard options and malformed-input protection.

The reference treats guard limits as a tested feature (shp.go:26-30,
dbf.go:86-92); same here: every Max* option must trip with the
reference's error text.
"""

import os

import pytest

from go_shapefile_spark.sources.shapefile_core import (
    ShapefileError, parse_dbf, parse_shp, read_shapefile,
)


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_shp_max_record_size(ref_testdata):
    data = _read(os.path.join(ref_testdata, "poly.shp"))
    with pytest.raises(ShapefileError, match="content length too large"):
        parse_shp(data, {"max_record_size": 8})


def test_shp_max_parts_and_points(ref_testdata):
    data = _read(os.path.join(ref_testdata, "polygon_hole.shp"))
    with pytest.raises(ShapefileError, match="too many parts"):
        parse_shp(data, {"max_parts": 1})
    with pytest.raises(ShapefileError, match="too many points"):
        parse_shp(data, {"max_points": 2})


def test_dbf_guards(ref_testdata):
    data = _read(os.path.join(ref_testdata, "poly.dbf"))
    with pytest.raises(ShapefileError, match="too many records"):
        parse_dbf(data, {"max_records": 2})
    with pytest.raises(ShapefileError, match="records too large"):
        parse_dbf(data, {"max_record_size": 4})
    with pytest.raises(ShapefileError, match="header too large"):
        parse_dbf(data, {"max_header_size": 8})


def test_options_thread_through_read(ref_testdata):
    with pytest.raises(ShapefileError, match="too many parts"):
        read_shapefile(os.path.join(ref_testdata, "polygon_hole"),
                       {"shp": {"max_parts": 1}})


def test_unknown_charset_rejected():
    from go_shapefile_spark.sources.shapefile_core import parse_cpg
    with pytest.raises(ShapefileError, match="unknown charset"):
        parse_cpg(b"no-such-charset-xyz")


def test_count_mismatch_detected(ref_testdata):
    """SHX of one fixture + SHP of another → 'inconsistent number of
    records' (shapefile.go:192-196)."""
    from go_shapefile_spark.sources.shapefile_core import read_components
    shp = _read(os.path.join(ref_testdata, "poly.shp"))
    shx = _read(os.path.join(ref_testdata, "point.shx"))
    with pytest.raises(ShapefileError, match="inconsistent number of records"):
        read_components({"shp": shp, "shx": shx})
