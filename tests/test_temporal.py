"""As-of join + binned interval range join (operators/temporal.py):
brute-force parity, degenerate inputs, error contracts, plan guards."""

import random

import pytest
from pyspark.sql import functions as F

from go_shapefile_spark.operators.temporal import (
    asof_join, covered_bins, range_join_binned)


def _brute_asof(probe, dim):
    """Reference: latest dim (ts, tb) at-or-before each probe ts."""
    out = {}
    for pid, key, ts in probe:
        best = None
        for dkey, dts, dval, dtb in dim:
            if dkey == key and dts <= ts:
                if best is None or (dts, dtb) > (best[0], best[1]):
                    best = (dts, dtb, dval)
        out[pid] = None if best is None else best[2]
    return out


def _random_case(seed):
    rng = random.Random(seed)
    keys = [1, 2, 3]
    dim = [(rng.choice(keys), rng.randrange(0, 50), float(i * 10), 1000 + i)
           for i in range(rng.randrange(0, 25))]
    probe = [(i, rng.choice(keys), rng.randrange(0, 50))
             for i in range(rng.randrange(1, 40))]
    return probe, dim


@pytest.mark.parametrize("seed", range(6))
def test_asof_matches_bruteforce(spark, seed):
    probe, dim = _random_case(seed)
    p = spark.createDataFrame(probe, "pid bigint, k bigint, ts bigint")
    d = spark.createDataFrame(dim, "k bigint, ts bigint, v double, tb bigint")
    # tiebreak must exist on both sides; probe pid reused as its tiebreak
    got = {r.pid: r.asof_v for r in asof_join(
        p.withColumn("tb", F.col("pid")), d, on=["k"], ts_col="ts",
        value_col="v", out_col="asof_v", tiebreak_col="tb").collect()}
    want = _brute_asof(probe, dim)
    assert got == want


def test_asof_equal_ts_dim_counts_and_tiebreak(spark):
    # two dim rows at the same (key, ts): the greater tiebreak wins;
    # a probe AT that ts already sees the rate
    d = spark.createDataFrame([(1, 10, 5.0, 7), (1, 10, 9.0, 8)],
                              "k bigint, ts bigint, v double, tb bigint")
    p = spark.createDataFrame([(100, 1, 10), (101, 1, 9)],
                              "pid bigint, k bigint, ts bigint")
    rows = {r.pid: r.asof_v for r in asof_join(
        p.withColumn("tb", F.col("pid")), d, on=["k"], ts_col="ts",
        value_col="v", tiebreak_col="tb", out_col="asof_v").collect()}
    assert rows == {100: 9.0, 101: None}


def test_asof_no_dim_for_key_and_empty_dim(spark):
    p = spark.createDataFrame([(1, 5, 3)], "pid bigint, k bigint, ts bigint")
    d_empty = spark.createDataFrame([], "k bigint, ts bigint, v double")
    out = asof_join(p, d_empty, on=["k"], ts_col="ts", value_col="v")
    assert [r.asof_v for r in out.collect()] == [None]


def test_asof_out_col_collision_raises(spark):
    p = spark.createDataFrame([(1, 1, 1)], "pid bigint, k bigint, ts bigint")
    with pytest.raises(ValueError, match="already in probe"):
        asof_join(p, p, on=["k"], ts_col="ts", value_col="pid",
                  out_col="pid")


def test_asof_plan_has_no_join(spark):
    p = spark.createDataFrame([(1, 1, 1)], "pid bigint, k bigint, ts bigint")
    d = spark.createDataFrame([(1, 0, 2.0)], "k bigint, ts bigint, v double")
    plan = asof_join(p, d, on=["k"], ts_col="ts", value_col="v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Cartesian" not in plan


def test_covered_bins_empty_and_width(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 10), (9, 10), (10, 10), (10, 30)],
        "s bigint, e bigint")
    rows = df.select("s", "e", covered_bins(
        F.col("s"), F.col("e"), 10).alias("b")).collect()
    got = {(r.s, r.e): r.b for r in rows}
    assert got[(0, 0)] == []          # empty half-open interval
    assert got[(0, 1)] == [0]
    assert got[(0, 10)] == [0]        # end exclusive: bin 1 not covered
    assert got[(9, 10)] == [0]
    assert got[(10, 10)] == []
    assert got[(10, 30)] == [1, 2]
    closed = df.select("s", "e", covered_bins(
        F.col("s"), F.col("e"), 10, half_open=False).alias("b")).collect()
    gotc = {(r.s, r.e): r.b for r in closed}
    assert gotc[(0, 10)] == [0, 1] and gotc[(10, 10)] == [1]
    assert gotc[(0, 0)] == [0]


def _brute_range(points, ivs, half_open):
    out = set()
    for pid, ts in points:
        for iid, s, e in ivs:
            if ts >= s and (ts < e if half_open else ts <= e):
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("seed,half_open", [(0, True), (1, True), (2, False)])
def test_range_join_matches_bruteforce(spark, seed, half_open):
    rng = random.Random(seed)
    points = [(i, rng.randrange(0, 200)) for i in range(60)]
    ivs = []
    for i in range(30):
        s = rng.randrange(0, 200)
        ivs.append((i, s, s + rng.choice([0, 1, 5, 40, 130])))
    p = spark.createDataFrame(points, "pid bigint, ts bigint")
    iv = spark.createDataFrame(ivs, "iid bigint, s bigint, e bigint")
    out = range_join_binned(p, iv, "ts", "s", "e", bin_width=16,
                            half_open=half_open)
    got = {(r.pid, r.iid) for r in out.select("pid", "iid").collect()}
    assert got == _brute_range(points, ivs, half_open)
    # exactly-once: no dedup pass hides double matches
    assert out.count() == len(got)


def test_range_join_validation(spark):
    p = spark.createDataFrame([(1, 1)], "pid bigint, ts bigint")
    iv = spark.createDataFrame([(1, 0, 2)], "iid bigint, s bigint, e bigint")
    with pytest.raises(ValueError, match="bin_width"):
        range_join_binned(p, iv, "ts", "s", "e", bin_width=0)
    clash = iv.withColumnRenamed("iid", "pid")
    with pytest.raises(ValueError, match="collision"):
        range_join_binned(p, clash, "ts", "s", "e", bin_width=10)


def test_range_join_plan_is_equijoin(spark):
    p = spark.createDataFrame([(1, 1)], "pid bigint, ts bigint")
    iv = spark.createDataFrame([(1, 0, 2)], "iid bigint, s bigint, e bigint")
    plan = range_join_binned(p, iv, "ts", "s", "e", bin_width=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gap_fill_locf_semantics(spark):
    """Dense grid + LOCF on a hand-built series: gap buckets carry the
    prior value with n_obs=0; within-bucket the latest (ts, id) wins."""
    import datetime as dt

    from go_shapefile_spark.operators.temporal import gap_fill_sql

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: obs in hour 0 (two - later one wins), gap hour 1,
        # obs hour 2
        (1, ts(5), 10.0, 100), (1, ts(50), 11.0, 101),
        (1, ts(125), 12.0, 102),
        # user 2: single obs
        (2, ts(30), 7.0, 200),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                "value double, event_id long") \
        .createOrReplaceTempView("gf_test_events")
    out = {(r.user_id, r.bucket_start): (r.n_obs, r.locf_value)
           for r in spark.sql("WITH " + gap_fill_sql(
               "spark", rel="gf_test_events").lstrip()).collect()}
    # session TZ is UTC: naive timestamps read as UTC instants
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[(1, base)] == (2, 11.0)            # later obs wins
    assert out[(1, base + 3600)] == (0, 11.0)     # gap carries forward
    assert out[(1, base + 7200)] == (1, 12.0)
    assert out[(2, base)] == (1, 7.0)
    assert len(out) == 4


def test_geofence_transitions_matches_python_replay(spark):
    """The (user, fence) enter/exit counts equal a pure-Python replay
    of the time-ordered inside/outside flag stream (lon/lat resolved
    through the same md5 geotag seam via DuckDB), and both engines
    return identical row sets on a planted events relation."""
    import duckdb
    import pandas as pd

    from go_shapefile_spark.operators import geotag as GT
    from go_shapefile_spark.queries import q_geofence_transitions

    # 4 users x 40 events; hash-spread lon/lat gives real transitions
    rows = [(u * 1000 + i, u, i) for u in range(4) for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "seq"])

    con = duckdb.connect()
    con.register("gf_events", pdf)
    got_duck = sorted(map(tuple, con.sql(
        q_geofence_transitions("duck", rel="gf_events")).fetchall()))
    spark.createDataFrame(pdf).createOrReplaceTempView("gf_events")
    got_spark = sorted(map(tuple, spark.sql(
        q_geofence_transitions("spark", rel="gf_events")).collect()))
    assert got_spark == got_duck

    # pure-Python replay over the same geotagged coordinates
    coords = con.sql(
        f"SELECT event_id, user_id, "
        f"{GT.lon_sql('event_id', 'duck')} AS lon, "
        f"{GT.lat_sql('event_id', 'duck')} AS lat "
        f"FROM gf_events ORDER BY user_id, event_id").fetchall()
    fences = [(0, -30, 30, -20, 20), (1, 60, 120, 10, 50),
              (2, -120, -60, -50, 10)]
    want = {}
    for fid, x0, x1, y0, y1 in fences:
        by_user = {}
        for eid, uid, lon, lat in coords:
            by_user.setdefault(uid, []).append(
                (eid, int(x0 <= lon <= x1 and y0 <= lat <= y1)))
        for uid, evs in by_user.items():
            n_enter = n_exit = n_inside = 0
            first = -1
            prev = None
            for eid, inside in evs:
                if prev == 0 and inside == 1:
                    n_enter += 1
                if prev == 1 and inside == 0:
                    n_exit += 1
                if inside:
                    n_inside += 1
                    if first == -1:
                        first = eid
                prev = inside
            if n_inside > 0:
                want[(uid, fid)] = (n_enter, n_exit, n_inside, first)

    got = {(r[0], r[1]): (r[2], r[3], r[4], r[5]) for r in got_spark}
    assert got == want
    assert len(got) > 0 and any(v[0] > 0 for v in got.values())


def test_resample_linear_interpolation_semantics(spark):
    """Handcrafted trajectory: exact lerp values at grid points, exact
    hits interpolate to themselves, ends clamp to the nearest obs,
    same-epoch duplicates dedupe to the greatest id, and a
    shorter-than-one-grid-step user yields no rows (the Spark
    sequence / DuckDB range seam)."""
    import duckdb
    import pandas as pd

    from go_shapefile_spark.operators.temporal import resample_sql

    W = 100
    rows = [
        # user 1: obs at 50 (0,0) and 250 (2,4) -> grid 100, 200
        (1, 50, 10, 0.0, 0.0), (1, 250, 11, 2.0, 4.0),
        # exact hit at 300 plus tail obs at 410 -> grid 300, 400
        (1, 300, 12, 3.0, 3.0), (1, 410, 13, 4.0, 5.0),
        # duplicate epoch 50: id 9 must LOSE to id 10
        (1, 50, 9, 9.0, 9.0),
        # user 2: span 10..90 shorter than one grid step -> no rows
        (2, 10, 20, 1.0, 1.0), (2, 90, 21, 2.0, 2.0),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "es", "id", "lon", "lat"])

    sql = "WITH rs_src AS (SELECT * FROM rs_view),\n" + \
        resample_sql("spark", width=W).lstrip()
    spark.createDataFrame(pdf).createOrReplaceTempView("rs_view")
    got = {(r.user_id, r.t_s): (r.lon_e6, r.lat_e6, r.interp)
           for r in spark.sql(sql).collect()}

    con = duckdb.connect()
    con.register("rs_pdf", pdf)
    con.execute("CREATE VIEW rs_view AS SELECT * FROM rs_pdf")
    duck = {(r[0], r[1]): (r[2], r[3], r[4]) for r in con.sql(
        "WITH rs_src AS (SELECT * FROM rs_view),\n"
        + resample_sql("duck", width=W).lstrip()).fetchall()}
    assert got == duck

    # t=100: 1/4 of the way 50->250 => (0.5, 1.0)
    assert got[(1, 100)] == (500000, 1000000, 1)
    # t=200: 3/4 => (1.5, 3.0)
    assert got[(1, 200)] == (1500000, 3000000, 1)
    # t=300: exact observation -> itself, interp flag 0
    assert got[(1, 300)] == (3000000, 3000000, 0)
    # t=400: between 300 and 410 -> 100/110 of (1, 2)
    lon = round(1e6 * (3.0 + 1.0 * (100 / 110)))
    lat = round(1e6 * (3.0 + 2.0 * (100 / 110)))
    assert got[(1, 400)] == (lon, lat, 1)
    assert not any(u == 2 for u, _ in got)
    assert len(got) == 4
