"""Bucketed co-located joins and range partitioning on the cell key."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from go_shapefile_spark.operators.partitioning import (
    repartition_by_cell_range, with_cell, write_bucketed,
)
from go_shapefile_spark.plans.audit import executed_plan


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10000).withColumn("phash", F.xxhash64("id"))
        b = spark.range(10000).withColumn("phash", F.xxhash64("id")) \
            .withColumn("v", F.col("id") * 2)
        write_bucketed(a, "bkt_a", "phash", 8)
        write_bucketed(b.select("phash", "v"), "bkt_b", "phash", 8)
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "phash")
        plan = executed_plan(joined)
        # bucketed-on-join-key tables sort-merge join with ZERO exchanges
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_write_bucketed_survives_stale_warehouse_dir(spark):
    """VERDICT r2 #1: a managed-table location left by a PREVIOUS session
    (dir exists, fresh catalog has never heard of the table) must not make
    write_bucketed throw LOCATION_ALREADY_EXISTS on re-run."""
    import os

    from go_shapefile_spark.sources import fsio

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    local = warehouse[5:] if warehouse.startswith("file:") else warehouse
    local = "/" + local.lstrip("/")
    stale = os.path.join(local, "bkt_stale")
    try:
        # simulate the orphan: catalog does not know the table, dir exists
        spark.sql("DROP TABLE IF EXISTS bkt_stale")
        fsio.rmtree(stale)
        os.makedirs(stale)
        with open(os.path.join(stale, "junk"), "w") as f:
            f.write("leftover from a previous session")
        df = spark.range(100).withColumn("k", F.col("id") % 7)
        write_bucketed(df, "bkt_stale", "k", 4)
        assert spark.table("bkt_stale").count() == 100
        # and a second run in the SAME session is also fine
        write_bucketed(df, "bkt_stale", "k", 4)
        assert spark.table("bkt_stale").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_stale")
        fsio.rmtree(stale)


def test_range_partitioning_is_spatially_coherent(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 20000),
                        "lat": rng.uniform(-90, 90, 20000)})
    df = with_cell(spark.createDataFrame(pdf), res=8)
    parts = repartition_by_cell_range(df, 8)
    stats = (parts.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").agg(F.min("cell").alias("lo"),
                                 F.max("cell").alias("hi"),
                                 F.count(F.lit(1)).alias("n"))
             .orderBy("lo").collect())
    assert len(stats) == 8
    # ranges are disjoint and ordered → spatial coherence of partitions
    for prev, cur in zip(stats, stats[1:]):
        assert prev.hi <= cur.lo
    # and reasonably balanced (range partitioner samples)
    counts = [r.n for r in stats]
    assert max(counts) < 3 * min(counts)
