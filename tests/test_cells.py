"""Cell encoder: numpy/Spark-SQL/DuckDB twins must agree bitwise."""

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from go_shapefile_spark.functions import cells as C


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_roundtrip_decode():
    lon, lat = _rand_lonlat(5000)
    for res in (0, 1, 5, 12, 26):
        cell = C.cell_np(lon, lat, res)
        r, ix, iy = C.cell_decode_np(cell)
        assert (r == res).all()
        ex, ey = C.xy_np(lon, lat, res)
        np.testing.assert_array_equal(ix, ex)
        np.testing.assert_array_equal(iy, ey)
        lon0, lat0, lon1, lat1 = C.cell_bounds_np(cell)
        assert ((lon >= lon0) & (lon <= lon1)).all()
        assert ((lat >= lat0) & (lat <= lat1)).all()


def test_sql_decode_matches_numpy(spark):
    """cell_ix_sql/cell_iy_sql (Spark) must be bit-identical to
    cell_decode_np — the distributed rasterizer depends on it."""
    lon, lat = _rand_lonlat(2000, seed=11)
    for res in (0, 4, 9, 26):
        cell = C.cell_np(lon, lat, res)
        _, ex, ey = C.cell_decode_np(cell)
        got = (spark.createDataFrame(pd.DataFrame({"cell": cell}))
               .selectExpr(f"{C.cell_ix_sql('cell')} AS ix",
                           f"{C.cell_iy_sql('cell')} AS iy")
               .toPandas())
        np.testing.assert_array_equal(got["ix"].to_numpy(), ex)
        np.testing.assert_array_equal(got["iy"].to_numpy(), ey)


def test_z_order_locality():
    # adjacent cells at the same resolution share id prefixes: the morton
    # code of a 2x2 block differs only in the low 2 bits
    base = C.cell_from_xy(np.array([10]), np.array([20]), 8)[0]
    sib = C.cell_from_xy(np.array([11]), np.array([21]), 8)[0]
    assert base >> 2 == sib >> 2


def test_neighbors_wrap_clamp():
    res = 4
    n = 1 << res
    cell = C.cell_from_xy(np.array([0]), np.array([0]), res)
    nb = C.neighbors_np(cell, 1)[0]
    _, ix, iy = C.cell_decode_np(nb)
    assert set(ix) == {0, 1, n - 1}     # lon wraps
    assert set(iy) == {0, 1}            # lat clamps (clamped dupes collapse)


def test_sql_np_duckdb_parity(spark):
    lon, lat = _rand_lonlat(2000, seed=11)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    for res in (3, 9, 17):
        expected = C.cell_np(lon, lat, res)
        # Spark SQL twin
        sdf = spark.createDataFrame(pdf)
        got_spark = np.array(
            sdf.select(F.expr(C.cell_sql("lon", "lat", res)).alias("c"))
            .toPandas()["c"], dtype=np.int64)
        np.testing.assert_array_equal(got_spark, expected)
        # DuckDB twin (same SQL string)
        con = duckdb.connect()
        con.register("t", pdf)
        got_duck = np.array(
            con.execute(f"SELECT {C.cell_sql('lon', 'lat', res)} AS c FROM t")
            .fetchnumpy()["c"], dtype=np.int64)
        np.testing.assert_array_equal(got_duck, expected)


def test_cell_xy_sql_parity(spark):
    lon, lat = _rand_lonlat(500, seed=3)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    res = 7
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(f"SELECT {C.cell_xy_sql('lon', 'lat', res)} c FROM t").fetchnumpy()["c"]
    sdf = spark.createDataFrame(pdf)
    got = np.array(sdf.select(F.expr(C.cell_xy_sql("lon", "lat", res)).alias("c"))
                   .toPandas()["c"])
    np.testing.assert_array_equal(got, np.array(duck))


def test_z_ranges_cover_window_exactly_and_budget_is_superset():
    import pytest
    import numpy as np

    from go_shapefile_spark.functions.cells import cell_np, z_ranges

    res = 6
    lon0, lat0, lon1, lat1 = -33.0, 7.5, 41.2, 55.0
    n = 1 << res
    # brute-force reference: enumerate the window's grid cells from the
    # same clamped corner coords z_ranges uses
    from go_shapefile_spark.functions.cells import xy_np
    qx, qy = xy_np(np.array([lon0, lon1]), np.array([lat0, lat1]), res)
    cells_in = set()
    for x in range(int(qx[0]), int(qx[1]) + 1):
        for y in range(int(qy[0]), int(qy[1]) + 1):
            clon = -180.0 + (x + 0.5) * 360.0 / n
            clat = -90.0 + (y + 0.5) * 180.0 / n
            cells_in.add(int(cell_np(np.array([clon]),
                                     np.array([clat]), res)[0]))

    exact = z_ranges(lon0, lat0, lon1, lat1, res, max_ranges=10**9)
    covered = set()
    for lo, hi in exact:
        covered.update(range(lo, hi + 1))
    assert covered == cells_in                 # exact cover, both ways

    tight = z_ranges(lon0, lat0, lon1, lat1, res, max_ranges=5)
    assert len(tight) <= 5
    cov2 = set()
    for lo, hi in tight:
        cov2.update(range(lo, hi + 1))
    assert cells_in <= cov2                    # superset: still sound
    # sorted + disjoint
    for (l1, h1), (l2, h2) in zip(tight, tight[1:]):
        assert h1 < l2 and l1 <= h1
    with pytest.raises(ValueError):
        z_ranges(0, 0, 1, 1, 99)


def test_hexbin_assigns_nearest_center(spark):
    """Cube rounding must send every point to the NEAREST hex center
    (Euclidean, pointy-top lattice) — checked against a brute-force
    nearest-center search over the local lattice neighborhood."""
    import numpy as np

    from go_shapefile_spark.functions.cells import hexbin_body

    rng = np.random.default_rng(13)
    size = 2.0
    pdf_lon = rng.uniform(-30, 30, 2000)
    pdf_lat = rng.uniform(-30, 30, 2000)
    import pandas as pd
    spark.createDataFrame(pd.DataFrame({"lon": pdf_lon, "lat": pdf_lat})) \
        .createOrReplaceTempView("hex_pts")
    # per-point assignment: run the same chain without the final rollup
    body = hexbin_body("spark", size, pts="hex_pts")
    body = body[:body.index("SELECT hq, hr, CAST(COUNT(*)")]
    rows = spark.sql("WITH " + body.rstrip().rstrip(",")
                     + "\nSELECT hq, hr FROM hexcells").collect()
    assert len(rows) == 2000

    c1, c2, c3 = np.sqrt(3) / 3, 1 / 3, 2 / 3
    for (lon, lat), r in zip(zip(pdf_lon, pdf_lat), rows):
        # center of assigned hex back in lon/lat:
        # lat = hr*size/c3 ; lon = (hq + c2/ c1... invert the map
        def center(hq, hr):
            clat = hr * size / c3
            clon = (hq * size + c2 * clat) / c1
            return clon, clat
        ax, ay = center(r.hq, r.hr)
        d0 = (lon - ax) ** 2 + (lat - ay) ** 2
        for dq in (-1, 0, 1):
            for dr in (-1, 0, 1):
                bx, by = center(r.hq + dq, r.hr + dr)
                d = (lon - bx) ** 2 + (lat - by) ** 2
                assert d0 <= d + 1e-9, (lon, lat, r.hq, r.hr, dq, dr)


def test_geohash_known_vectors():
    # classic public test vectors (Wikipedia / original geohash.org)
    assert C.geohash_np(np.array([10.40744]), np.array([57.64911]), 6)[0] \
        == "u4pruy"
    assert C.geohash_np(np.array([-5.6]), np.array([42.6]), 5)[0] == "ezs42"
    assert C.geohash_np(np.array([10.40744]), np.array([57.64911]), 5)[0] \
        == "u4pru"


def test_geohash_sql_np_duckdb_spark_parity(spark):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 179.999, 300)
    lat = rng.uniform(-90, 89.999, 300)
    for p in (1, 4, 5, 6):
        expected = C.geohash_np(lon, lat, p)
        sql = C.geohash_sql("lon", "lat", p)
        pdf = pd.DataFrame({"lon": lon, "lat": lat})
        got_duck = np.array([r[0] for r in
                             duckdb.query_df(pdf, "pdf",
                                             f"SELECT {sql} FROM pdf")
                             .fetchall()])
        np.testing.assert_array_equal(got_duck, expected)
        sdf = spark.createDataFrame(pdf)
        got_spark = np.array(
            [r[0] for r in sdf.selectExpr(f"{sql} AS gh").collect()])
        np.testing.assert_array_equal(got_spark, expected)


def test_geohash_prefix_nesting():
    # a geohash at precision p is a prefix of the same point at p+1
    # only when the higher precision refines the SAME cell; the
    # guaranteed invariant is prefix-compatibility of the bit paths:
    # cells at precision p group points whose p-char hashes are equal.
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 179.999, 200)
    lat = rng.uniform(-90, 89.999, 200)
    g4 = C.geohash_np(lon, lat, 4)
    g6 = C.geohash_np(lon, lat, 6)
    # even-split precisions nest exactly (4 -> 6 adds 5 lon + 5 lat bits)
    assert all(b.startswith(a) for a, b in zip(g4, g6))
