"""Snapshot table format: atomic commits, time travel, incremental reads,
and snapshot-driven pipeline resume."""

import posixpath
import uuid

import pytest
from pyspark.sql import functions as F

from go_shapefile_spark.sources import fsio
from go_shapefile_spark.sources.table_format import SnapshotTable


def test_append_time_travel_incremental(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    assert t.current_snapshot_id() is None
    assert t.files() == []

    s1 = t.append(spark.range(100).withColumn("batch", F.lit(1)))
    s2 = t.append(spark.range(100, 250).withColumn("batch", F.lit(2)))
    assert [s["snapshot_id"] for s in t.snapshots()] == [s1, s2]

    assert t.read(spark).count() == 250                   # CURRENT
    assert t.read(spark, snapshot_id=s1).count() == 100   # time travel
    inc = t.incremental(spark, from_snapshot_id=s1)
    assert inc.count() == 150
    assert inc.agg(F.min("id")).first()[0] == 100
    # full history from the beginning
    assert t.incremental(spark, from_snapshot_id=None).count() == 250


def test_uncommitted_data_is_invisible(spark, tmp_path):
    """A crash after writing data files but before the commit leaves the
    table exactly at its previous snapshot."""
    root = str(tmp_path / "tbl2")
    t = SnapshotTable(root)
    t.append(spark.range(10))
    # simulate a writer dying mid-append: data staged, no commit
    orphan = posixpath.join(root, "data", uuid.uuid4().hex)
    spark.range(999).write.parquet(orphan)
    assert t.read(spark).count() == 10
    assert len(t.files()) > 0
    assert all(orphan not in f for f in t.files())


def test_snapshot_driven_incremental_resume(spark, tmp_path):
    """Lineage keyed by snapshot id + incremental reads = each appended
    batch is processed exactly once across resumes (north rule:
    snapshot-id-driven idempotent resume)."""
    from go_shapefile_spark.operators.lineage import LineageLog, run_stage

    root = str(tmp_path / "tbl3")
    out = str(tmp_path / "out3")
    t = SnapshotTable(root)
    lineage = LineageLog(str(tmp_path / "lineage3"))

    def process_up_to(snapshot_id):
        done = lineage.done("agg")
        last = max(done.values(), key=lambda r: r["snapshot_id"])[
            "snapshot_id"] if done else None
        if last == snapshot_id:
            return {}
        inc = t.incremental(spark, from_snapshot_id=last,
                            to_snapshot_id=snapshot_id)
        return run_stage(
            "agg", [snapshot_id],
            lambda key: inc.agg(F.count(F.lit(1)).alias("n"),
                                F.sum("id").alias("s")),
            out, lineage, snapshot_id=snapshot_id)

    s1 = t.append(spark.range(100))
    assert set(process_up_to(s1)) == {s1}
    s2 = t.append(spark.range(100, 300))
    assert set(process_up_to(s2)) == {s2}
    # resume with nothing new appended → no-op
    assert process_up_to(s2) == {}
    # partials across both runs sum to the full table
    total = (spark.read.parquet(posixpath.join(out, "agg"))
             .agg(F.sum("n"), F.sum("s")).first())
    assert total[0] == 300 and total[1] == sum(range(300))
