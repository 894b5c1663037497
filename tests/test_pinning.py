"""Pinned-relation strategies (operators/pinning.py): the durability
seam for the LSH-signature materializations (VERDICT r4 #2).

``local`` = executor-local checkpoint (gate default, plan-guarded in
test_plans.py); ``storage`` = parquet materialization + scan-back,
which must survive the loss of every cached/checkpointed block — the
cluster-failure mode localCheckpoint cannot survive."""

import os

import pytest
from pyspark.sql import functions as F

from go_shapefile_spark.operators.pinning import (fresh_pins, pin_dir,
                                                  pin_strategy)


def _destroy_all_persisted_blocks(spark):
    """Simulate executor-storage loss: unpersist every persistent RDD
    (this is what an executor crash does to a localCheckpoint — the
    blocks are gone and the LogicalRDD leaf cannot recompute)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(True)
    spark.catalog.clearCache()


def _sig_df(spark):
    """A stand-in signature relation with a md5 chain (the expensive
    subtree the dedup runners pin)."""
    return (spark.range(0, 500)
            .select(F.col("id"),
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8)
                    .alias("sig")))


def test_storage_pin_survives_block_loss(spark):
    pin = fresh_pins(spark, "t_storage_loss", strategy="storage")
    pinned = pin(_sig_df(spark))
    before = sorted(r.sig for r in pinned.collect())
    _destroy_all_persisted_blocks(spark)
    after = sorted(r.sig for r in pinned.collect())   # re-reads parquet
    assert after == before and len(after) == 500
    # the pinned relation is a columnar file scan, not an RDD leaf:
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()
    assert "ExistingRDD" not in plan and "LogicalRDD" not in plan


def test_local_pin_is_rdd_leaf(spark):
    pin = fresh_pins(spark, "t_local_leaf", strategy="local")
    pinned = pin(_sig_df(spark))
    plan = pinned._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan     # physically cannot re-inline/recompute


def test_storage_pins_recycle_previous_call(spark):
    pin = fresh_pins(spark, "t_recycle", strategy="storage")
    first = pin(spark.range(0, 10))
    path0 = os.path.join(pin_dir(spark), "t_recycle_0")
    assert first.count() == 10 and os.path.isdir(path0)
    # a NEW factory for the same slot deletes the previous call's files
    # at creation time (the slot's path numbering then restarts at _0)
    pin2 = fresh_pins(spark, "t_recycle", strategy="storage")
    assert not os.path.exists(path0)
    second = pin2(spark.range(0, 5))
    assert second.count() == 5


def test_intra_call_pins_chain(spark):
    """Iterative operators chain pins (round N reads round N-1) and the
    final consumer reads ALL rounds — pins of one call must all stay
    alive until the slot's next invocation."""
    pin = fresh_pins(spark, "t_chain", strategy="storage")
    lv0 = pin(spark.range(0, 16).select(F.col("id"),
                                        (F.col("id") % 4).alias("b")))
    lv1 = pin(lv0.groupBy("b").agg(F.sum("id").alias("s")))
    total = lv1.agg(F.sum("s")).collect()[0][0]
    assert total == 120
    assert lv0.count() == 16    # round-0 pin still readable


def test_strategy_resolution_order(spark):
    assert pin_strategy(spark, "storage") == "storage"
    old = os.environ.get("SPARK_GRAFT_PIN")
    try:
        os.environ["SPARK_GRAFT_PIN"] = "storage"
        assert pin_strategy(spark) == "storage"
        os.environ["SPARK_GRAFT_PIN"] = "bogus"
        with pytest.raises(ValueError, match="pin strategy"):
            pin_strategy(spark)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_PIN", None)
        else:
            os.environ["SPARK_GRAFT_PIN"] = old
    assert pin_strategy(spark) == "local"


def test_minhash_gate_identical_under_storage_pins(spark, sf_dir):
    """The dedup gate's rows must be identical under either strategy —
    the pin is a materialization detail, never a semantics change."""
    import __spark_entry__ as entry
    q = entry.queries()["dedup_minhash_lsh"]
    local_rows = sorted(map(tuple, q(spark, sf_dir).collect()))
    old = os.environ.get("SPARK_GRAFT_PIN")
    try:
        os.environ["SPARK_GRAFT_PIN"] = "storage"
        storage_rows = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_PIN", None)
        else:
            os.environ["SPARK_GRAFT_PIN"] = old
    assert storage_rows == local_rows and len(local_rows) > 0


def test_operator_results_survive_repeat_calls(spark):
    """Regression (r5 review): two tile_pyramid / knn-style calls in one
    session must not invalidate the first call's returned DataFrame —
    public operators pin under anonymous per-call slots."""
    from pyspark.sql import functions as F

    from go_shapefile_spark.operators.tiles import tile_pyramid

    pts1 = spark.range(0, 200).select(
        (F.col("id") % 36 * 10 - 180.0).alias("lon"),
        (F.col("id") % 18 * 10 - 90.0).alias("lat"))
    pts2 = spark.range(0, 50).select(
        F.lit(0.5).alias("lon"), F.lit(0.5).alias("lat"))
    p1 = tile_pyramid(pts1, max_res=2)
    n1 = p1.count()
    p2 = tile_pyramid(pts2, max_res=2)
    assert p2.count() > 0
    assert p1.count() == n1          # first result still computable


def test_release_pins_frees_session(spark):
    from go_shapefile_spark.operators.pinning import (_PINS, fresh_pins,
                                                      release_pins)
    pin = fresh_pins(spark, None, "local")
    pin(spark.range(5))
    assert any(k[0] == id(spark) for k in _PINS)
    release_pins(spark)
    assert not any(k[0] == id(spark) for k in _PINS)
