"""Full DBF type matrix through the Spark source via a synthesized file.

No reference fixture carries D/L/F/M fields or deleted rows, so build a
bit-correct dBase III file in-test and run it through both the core
parser and the Spark source (schema mapping, deleted-slot preservation).
"""

import struct

import numpy as np
import pytest

from go_shapefile_spark.sources.shapefile_core import parse_dbf


def build_dbf(rows, fields):
    """fields: [(name, type, length)]; rows: list of list[bytes] or None
    (None = deleted slot)."""
    record_size = 1 + sum(length for _, _, length in fields)
    header = bytearray(32)
    header[0] = 3
    header[1:4] = bytes([99, 2, 22])
    struct.pack_into("<I", header, 4, len(rows))
    header_size = 32 + 32 * len(fields) + 1
    struct.pack_into("<H", header, 8, header_size)
    struct.pack_into("<H", header, 10, record_size)
    out = bytes(header)
    for name, ftype, length in fields:
        desc = bytearray(32)
        desc[:len(name)] = name.encode()
        desc[11] = ord(ftype)
        desc[16] = length
        desc[17] = 2 if ftype in "FN" and name.endswith("_f") else 0
        out += bytes(desc)
    out += b"\x0d"
    for row in rows:
        if row is None:
            out += b"*" + b" " * (record_size - 1)
        else:
            rec = b" "
            for (name, ftype, length), val in zip(fields, row):
                rec += val.ljust(length)[:length]
            out += rec
    return out + b"\x1a"


FIELDS = [
    ("NAME", "C", 10),
    ("BORN", "D", 8),
    ("RATE_f", "F", 8),
    ("ACTIVE", "L", 1),
    ("NOTE", "M", 12),
    ("COUNT", "N", 6),
    ("SCORE_f", "N", 8),
]
ROWS = [
    [b"alpha", b"19991231", b"3.5", b"T", b"hello", b"42", b"1.25"],
    None,
    [b"beta", b"20200229", b"", b"?", b"", b"", b"99.5"],
    [b"gamma", b"20010101", b"-0.25", b"n", b"x", b"-7", b"0.0"],
]


def test_core_parse_full_type_matrix():
    from datetime import date
    data = build_dbf(ROWS, FIELDS)
    dbf = parse_dbf(data)
    assert len(dbf.records) == 4
    assert dbf.records[1] is None                     # deleted slot kept
    r0 = dbf.record(0)
    assert r0 == {"NAME": "alpha", "BORN": date(1999, 12, 31), "RATE_f": 3.5,
                  "ACTIVE": True, "NOTE": "hello", "COUNT": 42, "SCORE_f": 1.25}
    r2 = dbf.record(2)
    assert r2["RATE_f"] is None and r2["ACTIVE"] is None and r2["COUNT"] is None
    assert dbf.record(3)["ACTIVE"] is False
    assert dbf.header.last_update.year == 1999


def test_spark_source_full_type_matrix(spark, tmp_path):
    # pair the DBF with a matching 4-record point SHP
    import os

    from go_shapefile_spark.sources.shapefile import read_shapefile_df
    base = str(tmp_path / "synth")
    with open(base + ".dbf", "wb") as f:
        f.write(build_dbf(ROWS, FIELDS))
    # minimal SHP: header + 4 point records
    recs = b""
    for i in range(4):
        body = struct.pack("<I2d", 1, 10.0 + i, 20.0 + i)
        recs += struct.pack(">II", i + 1, len(body) // 2) + body
    header = bytearray(100)
    struct.pack_into(">I", header, 0, 9994)
    struct.pack_into(">I", header, 24, (100 + len(recs)) // 2)
    struct.pack_into("<I", header, 28, 1000)
    struct.pack_into("<I", header, 32, 1)
    struct.pack_into("<4d", header, 36, 10.0, 20.0, 13.0, 23.0)
    with open(base + ".shp", "wb") as f:
        f.write(bytes(header) + recs)

    df = read_shapefile_df(spark, base)
    dt = dict(df.dtypes)
    assert dt["BORN"] == "date"
    assert dt["ACTIVE"] == "boolean"
    assert dt["RATE_f"] == "double"
    assert dt["COUNT"] == "bigint"        # decimals=0 → long
    assert dt["SCORE_f"] == "double"      # decimals>0 → double
    rows = {r.fid: r for r in df.collect()}
    assert rows[1].NAME == "alpha" and rows[1].COUNT == 42
    assert rows[2].deleted and rows[2].NAME is None
    assert rows[3].ACTIVE is None and rows[3].SCORE_f == 99.5
    assert rows[4].ACTIVE is False
    assert str(rows[1].BORN) == "1999-12-31"
    assert rows[1].geometry.coords == [10.0, 20.0]


def test_d_field_rollover_out_of_date_range_raises_cleanly():
    """A D value whose Go-style rollover lands outside datetime.date's
    year range must raise ShapefileError through BOTH decode paths —
    never leak raw epoch-day ints into the column (r2 review finding)."""
    import struct

    import pytest

    from go_shapefile_spark.sources import shapefile_core as core

    hdr = bytearray(32)
    hdr[0] = 3
    hdr[1:4] = bytes([120, 1, 15])
    struct.pack_into("<I", hdr, 4, 1)
    struct.pack_into("<H", hdr, 8, 32 + 32 + 1)
    struct.pack_into("<H", hdr, 10, 9)
    desc = bytearray(32)
    desc[:2] = b"DT"
    desc[11] = ord("D")
    desc[16] = 8
    data = bytes(hdr) + bytes(desc) + b"\x0d" + b" 99989901" + b"\x1a"
    with pytest.raises(core.ShapefileError, match="unrepresentable date"):
        core.parse_dbf(data)
    hdr2, flds, pos = core.parse_dbf_fields(data)
    with pytest.raises(core.ShapefileError, match="unrepresentable date"):
        core.parse_dbf_native_columns(data, hdr2, flds, pos, [0])
    # skip mode nulls the cell instead
    cols, _ = core.parse_dbf_native_columns(data, hdr2, flds, pos, [0],
                                            skip_broken_fields=True)
    assert cols[0][1][0] is None


def test_fractional_zero_decimal_skip_mode():
    """decimals=0 N column holding '1.5': hard error without skip,
    null cell with skip_broken_fields (r2 review finding)."""
    import struct

    import pytest

    from go_shapefile_spark.sources import shapefile_core as core

    hdr = bytearray(32)
    hdr[0] = 3
    hdr[1:4] = bytes([120, 1, 15])
    struct.pack_into("<I", hdr, 4, 1)
    struct.pack_into("<H", hdr, 8, 32 + 32 + 1)
    struct.pack_into("<H", hdr, 10, 7)
    desc = bytearray(32)
    desc[:1] = b"V"
    desc[11] = ord("N")
    desc[16] = 6
    data = bytes(hdr) + bytes(desc) + b"\x0d" + b"    1.5" + b"\x1a"
    hdr2, flds, pos = core.parse_dbf_fields(data)
    with pytest.raises(core.ShapefileError, match="fractional value"):
        core.parse_dbf_native_columns(data, hdr2, flds, pos, [0])
    cols, _ = core.parse_dbf_native_columns(data, hdr2, flds, pos, [0],
                                            skip_broken_fields=True)
    assert cols[0][1][0] is None
    # the reference-typed API still returns the float (per-value typing)
    assert core.parse_dbf(data).records[0] == [1.5]
