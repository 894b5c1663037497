"""Streaming tile rollup must equal the batch rollup on the same data."""

import os
import shutil

from pyspark.sql import functions as F

from go_shapefile_spark.functions import cells as C
from go_shapefile_spark.operators.geotag import lat_sql, lon_sql
from go_shapefile_spark.streaming.events import (
    run_available_now, streaming_tile_counts,
)

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))

    stream_df = streaming_tile_counts(spark, src, SCHEMA, res=5)
    run_available_now(stream_df, str(tmp_path / "ckpt"), "tiles_test")
    got = (spark.table("tiles_test").toPandas()
           .sort_values(["window_start", "cell"]).reset_index(drop=True))

    batch = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
             .withColumn("lon", F.expr(lon_sql("event_id", "spark")))
             .withColumn("lat", F.expr(lat_sql("event_id", "spark")))
             .withColumn("cell", F.expr(C.cell_sql("lon", "lat", 5)))
             .groupBy(F.window("ts", "5 minutes").alias("w"), "cell")
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.col("w.start").alias("window_start"), "cell", "n")
             .toPandas().sort_values(["window_start", "cell"])
             .reset_index(drop=True))

    assert len(got) == len(batch) > 0
    assert got.equals(batch)


def test_stateful_sessionizer_matches_batch_oracle(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer drained over a bounded source
    must equal the batch event_sessions query."""
    import duckdb

    from go_shapefile_spark.queries import q_event_sessions
    from go_shapefile_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))

    stream = sessionize_stream(spark, src, SCHEMA)
    q = (stream.writeStream.format("memory").queryName("sessions_test")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.table("sessions_test").toPandas()
           .sort_values("user_id").reset_index(drop=True))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf_dir, 'events.parquet')}'")
    exp = (con.execute(q_event_sessions("duck")).df()
           .sort_values("user_id").reset_index(drop=True))
    assert len(got) == len(exp)
    assert (got["n_sessions"].to_numpy() == exp["n_sessions"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics: after the watermark passes a window's end,
    an event arriving for that window is DROPPED — the window's emitted
    (append-mode) aggregate never changes across restarts."""
    import datetime as dt
    import glob

    import pandas as pd

    src = str(tmp_path / "late_src")
    sink = str(tmp_path / "late_sink")
    os.makedirs(src)
    ckpt = str(tmp_path / "late_ckpt")

    def write_batch(name, times):
        pdf = pd.DataFrame({
            "event_id": list(range(len(times))),
            "ts": [dt.datetime(2024, 1, 1, 10, m, s) for m, s in times]})
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite") \
            .parquet(stage)
        part = glob.glob(os.path.join(stage, "*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))

    def run():
        stream = (spark.readStream.schema("event_id long, ts timestamp")
                  .parquet(src)
                  .withWatermark("ts", "10 minutes")
                  .groupBy(F.window("ts", "5 minutes").alias("w"))
                  .agg(F.count(F.lit(1)).alias("n"))
                  .select(F.col("w.start").alias("ws"), "n"))
        q = (stream.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return {r.ws.minute: r.n for r in spark.read.parquet(sink).collect()}

    # batch 1: three events in the 10:00 window + one at 10:30 that
    # pushes the watermark to 10:20, finalizing the 10:00 window
    write_batch("b1", [(0, 10), (1, 20), (4, 30), (30, 0)])
    assert run() == {0: 3}
    # batch 2: a LATE event for the closed 10:00 window (dropped) plus an
    # on-time 10:59 event that finalizes the 10:30 window
    write_batch("b2", [(2, 0), (59, 0)])
    # late row dropped: 10:00 stays 3, never re-emitted or updated
    assert run() == {0: 3, 30: 1}


def test_streaming_dedup_collapses_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates of a key within the
    watermark collapse to one row, across files and micro-batches; the
    rollup equals the batch DISTINCT."""
    import pandas as pd

    from go_shapefile_spark.streaming.events import (
        run_available_now, streaming_dedup_counts)

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [(i, base + pd.Timedelta(seconds=30 * i), i % 3,
             "t" + str(i % 2), float(i), "p") for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    df = spark.createDataFrame(pdf, schema=SCHEMA)
    # the stream source wants FLAT files (a directory named *.parquet is
    # skipped): write once, then place the part file twice — the SAME
    # events in a second file simulates at-least-once delivery
    staging = str(tmp_path / "staging")
    df.coalesce(1).write.parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    shutil.copy(os.path.join(staging, part), os.path.join(src, "a.parquet"))
    shutil.copy(os.path.join(staging, part), os.path.join(src, "b.parquet"))

    out = streaming_dedup_counts(spark, src, SCHEMA, watermark="1 hour")
    run_available_now(out, str(tmp_path / "dckpt"), "dedup_test")
    got = {r.event_type: (r.n, r.sum_value)
           for r in spark.table("dedup_test").collect()}
    exp = {r.event_type: (r.n, r.sum_value) for r in
           df.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("sum_value")).collect()}
    assert got == exp


def test_streaming_audio_dedup_collapses_replays(spark, tmp_path):
    """Multimodal streaming dedup: the dedup key is COMPUTED in the
    stream (strict WAV decode -> spectral fingerprint, same kernel as
    the batch operator), and a source replayed three times still
    collapses to one row per distinct clip."""
    from go_shapefile_spark.sources.audio import generate_audio_batch
    from go_shapefile_spark.streaming.events import (
        run_available_now, streaming_audio_dedup_counts)

    pdf = generate_audio_batch(0, 30)
    df = spark.createDataFrame(pdf)
    staging = str(tmp_path / "staging")
    df.coalesce(1).write.parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    src = str(tmp_path / "asrc")
    os.makedirs(src)
    for name in ("a.parquet", "b.parquet", "c.parquet"):
        shutil.copy(os.path.join(staging, part), os.path.join(src, name))

    out = streaming_audio_dedup_counts(spark, src, df.schema,
                                       watermark="1 hour")
    run_available_now(out, str(tmp_path / "ackpt"), "audio_dedup_test")
    got = {r.fmt: r.n for r in spark.table("audio_dedup_test").collect()}
    assert got == {"wav-pcm16": 15, "wav-ulaw": 15}


def test_streaming_heatmap_equals_batch_raster(spark, sf_dir, tmp_path):
    """The streaming splat (explode-then-aggregate) and the batch form
    (pre-aggregate-then-splat) are different plans over the same
    integer algebra — complete-mode drain must equal the batch raster
    row-for-row."""
    from go_shapefile_spark.operators.tiles import heatmap
    from go_shapefile_spark.streaming.events import streaming_heatmap_counts

    src = str(tmp_path / "hm_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))
    stream_df = streaming_heatmap_counts(spark, src, SCHEMA, ppd=1)
    run_available_now(stream_df, str(tmp_path / "hm_ckpt"), "heatmap_test")
    got = (spark.table("heatmap_test").toPandas()
           .astype({"intensity": "int64", "n_centered": "int64"})
           .sort_values(["x", "y"]).reset_index(drop=True))

    batch = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
             .withColumn("lon", F.expr(lon_sql("event_id", "spark")))
             .withColumn("lat", F.expr(lat_sql("event_id", "spark"))))
    exp = (heatmap(batch, ppd=1).toPandas()
           .sort_values(["x", "y"]).reset_index(drop=True))
    assert len(got) == len(exp) > 0
    assert got[["x", "y", "intensity", "n_centered"]].equals(
        exp[["x", "y", "intensity", "n_centered"]])


def test_stateful_glitch_filter_multibatch_equals_batch(spark, sf_dir,
                                                        tmp_path):
    """The streaming glitch filter survives a SPLIT source: drain the
    first half of the time range, then add the second half and drain
    again — the chained state (last point per user crosses the batch
    boundary) must reproduce the batch SQL exactly."""
    import duckdb

    from go_shapefile_spark.queries import q_gps_glitches
    from go_shapefile_spark.streaming.trajectory import glitch_filter_stream

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cut = ev.selectExpr("percentile(CAST(unix_timestamp(ts) AS DOUBLE), "
                        "0.5) AS c").collect()[0].c
    src = str(tmp_path / "gl_src")
    os.makedirs(src)

    def add_part(df, name):
        """File-stream sources don't recurse: stage the write, move the
        flat part file into the watched dir."""
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(stage, part),
                    os.path.join(src, f"{name}.parquet"))

    add_part(ev.where(f"unix_timestamp(ts) <= {int(cut)}"), "part1")

    # ONE live query fed two micro-batches: state must cross the
    # batch boundary (memory sinks cannot restart from a checkpoint,
    # so continuity is exercised in-flight)
    stream = glitch_filter_stream(spark, src, SCHEMA)
    q = (stream.writeStream.format("memory").queryName("gl_mb")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "gl_ckpt"))
         .start())
    try:
        q.processAllAvailable()
        add_part(ev.where(f"unix_timestamp(ts) > {int(cut)}"), "part2")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT user_id, MAX(n_moves) n_moves, MAX(n_glitches) n_glitches,"
        " MAX(clean_dist_mm) clean_dist_mm FROM gl_mb "
        "GROUP BY user_id HAVING MAX(n_moves) > 0").collect()
    got = {r.user_id: (r.n_moves, r.n_glitches, r.clean_dist_mm)
           for r in rows}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf_dir, 'events.parquet')}'")
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(q_gps_glitches("duck")).fetchall()}
    assert got == want
    assert sum(v[1] for v in got.values()) > 0


def test_stateful_funnel_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """The streaming funnel fed two time-split micro-batches through
    ONE live query equals the batch q_funnel semantics computed in
    DuckDB (depth state crosses the batch boundary: a view in batch 1
    must qualify a click in batch 2)."""
    import duckdb

    from go_shapefile_spark.queries import q_funnel
    from go_shapefile_spark.streaming.funnel import funnel_stream

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cut = ev.selectExpr("percentile(CAST(unix_timestamp(ts) AS DOUBLE), "
                        "0.5) AS c").collect()[0].c
    src = str(tmp_path / "fu_src")
    os.makedirs(src)

    def add_part(df, name):
        stage = str(tmp_path / f"fstage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(stage, part),
                    os.path.join(src, f"{name}.parquet"))

    add_part(ev.where(f"unix_timestamp(ts) <= {int(cut)}"), "part1")
    stream = funnel_stream(spark, src, SCHEMA)
    q = (stream.writeStream.format("memory").queryName("fu_mb")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "fu_ckpt"))
         .start())
    try:
        q.processAllAvailable()
        add_part(ev.where(f"unix_timestamp(ts) > {int(cut)}"), "part2")
        q.processAllAvailable()
    finally:
        q.stop()

    depths = {r.user_id: r.depth for r in spark.sql(
        "SELECT user_id, MAX(depth) AS depth FROM fu_mb "
        "GROUP BY user_id").collect()}
    got = {s: sum(1 for d in depths.values() if d >= s) for s in (1, 2, 3)}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf_dir, 'events.parquet')}'")
    want = {r[0]: r[1]
            for r in con.execute(q_funnel("duck")).fetchall()}
    assert got == want and got[1] >= got[2] >= got[3] > 0
