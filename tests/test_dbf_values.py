"""Unit tests for DBF per-value parse semantics (reference dbf.go:283-382)."""

from datetime import date

import pytest

from go_shapefile_spark.sources.shapefile_core import (
    ShapefileError, parse_dbf_value, trim_trailing_zeros,
)


def test_character_trim_and_decode():
    assert parse_dbf_value(b"  abc \x00\x00", "C", "latin-1") == "abc"
    assert parse_dbf_value(b"M\xfcrz", "C", "cp1252") == "Mürz"
    assert parse_dbf_value(b"\x00\x00", "C", "latin-1") == ""


def test_date_strict_yyyymmdd():
    assert parse_dbf_value(b"20210222", "D", "latin-1") == date(2021, 2, 22)
    with pytest.raises(ShapefileError, match="invalid year"):
        parse_dbf_value(b"2x210222", "D", "latin-1")
    with pytest.raises(ShapefileError, match="invalid date field length"):
        parse_dbf_value(b"2021022", "D", "latin-1")


def test_float_blank_null():
    assert parse_dbf_value(b"        ", "F", "latin-1") is None
    assert parse_dbf_value(b"  3.5   ", "F", "latin-1") == 3.5


def test_logical_table():
    # reference dbf.go:40-51: ?TFYNtfyn
    for b, want in [(b"?", None), (b"T", True), (b"t", True), (b"Y", True),
                    (b"y", True), (b"F", False), (b"f", False), (b"N", False),
                    (b"n", False)]:
        assert parse_dbf_value(b, "L", "latin-1") is want
    with pytest.raises(ShapefileError, match="invalid logical"):
        parse_dbf_value(b"x", "L", "latin-1")
    with pytest.raises(ShapefileError, match="invalid logical"):
        parse_dbf_value(b"TT", "L", "latin-1")


def test_numeric_dynamic_typing():
    # '.' selects float64, otherwise int — per value (dbf.go:365-382)
    v = parse_dbf_value(b"  42 ", "N", "latin-1")
    assert v == 42 and isinstance(v, int)
    v = parse_dbf_value(b" 42.0", "N", "latin-1")
    assert v == 42.0 and isinstance(v, float)
    assert parse_dbf_value(b"      ", "N", "latin-1") is None
    # exponent without '.' goes down the int path and errors, like Go
    with pytest.raises(ShapefileError, match="invalid numeric"):
        parse_dbf_value(b"1e5", "N", "latin-1")
    with pytest.raises(ShapefileError, match="invalid numeric"):
        parse_dbf_value(b"**", "N", "latin-1")


def test_memo_passthrough():
    assert parse_dbf_value(b" note \x00", "M", "latin-1") == "note"


def test_trim_trailing_zeros_only_trailing():
    assert trim_trailing_zeros(b"a\x00b\x00\x00") == b"a\x00b"
    assert trim_trailing_zeros(b"\x00\x00") == b""
