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


def test_catalog_cas_two_writers_one_loses_cleanly(tmp_path):
    """VERDICT r2 #9: with a catalog attached, two committers racing from
    the same parent resolve to exactly one winner; the loser raises
    CommitConflict and the table is never torn."""
    from concurrent.futures import ThreadPoolExecutor

    from go_shapefile_spark.sources.table_format import (
        CommitConflict, InMemoryCatalog)

    root = str(tmp_path / "cat_tbl")
    cat = InMemoryCatalog()
    t1 = SnapshotTable(root, catalog=cat)
    t2 = SnapshotTable(root, catalog=cat)
    base = t1.commit(["f0.parquet"])

    # deterministic stale-parent race: both writers base work on `base`
    s1 = t1.commit(["f1.parquet"], expected_parent=base)
    with pytest.raises(CommitConflict):
        t2.commit(["f2.parquet"], expected_parent=base)
    assert t2.current_snapshot_id() == s1
    assert t2.files() == ["f0.parquet", "f1.parquet"]
    # loser retries from the new CURRENT and succeeds
    s2 = t2.commit(["f2.parquet"])
    assert t2.files() == ["f0.parquet", "f1.parquet", "f2.parquet"]
    assert [s["snapshot_id"] for s in t2.snapshots()] == [base, s1, s2]

    # threaded race from one shared parent: exactly one winner
    outcomes = []

    def racer(t, f):
        try:
            outcomes.append(("ok", t.commit([f], expected_parent=s2)))
        except CommitConflict:
            outcomes.append(("conflict", None))

    with ThreadPoolExecutor(max_workers=2) as ex:
        ex.submit(racer, t1, "r1.parquet").result()
        ex.submit(racer, t2, "r2.parquet").result()
    # second racer used the stale parent s2 on purpose
    assert sorted(o[0] for o in outcomes) == ["conflict", "ok"]
    # chain stays linear and consistent
    snaps = t1.snapshots()
    assert len(snaps) == 4
    assert all(a["snapshot_id"] == b["parent"]
               for a, b in zip(snaps, snaps[1:]))
    # losers' staged manifests were deleted: metadata dir holds exactly
    # the committed chain
    n_manifests = len([p for p in fsio.list_files(t1.meta)
                       if "snap-" in p])
    assert n_manifests == 4


def test_catalog_imports_pre_catalog_table(tmp_path):
    """A table committed WITHOUT a catalog keeps working when one is
    attached later (pointer import on first CAS)."""
    from go_shapefile_spark.sources.table_format import InMemoryCatalog

    root = str(tmp_path / "import_tbl")
    plain = SnapshotTable(root)
    s1 = plain.commit(["a.parquet"])
    cat = InMemoryCatalog()
    t = SnapshotTable(root, catalog=cat)
    assert t.current_snapshot_id() == s1
    s2 = t.commit(["b.parquet"])
    assert cat.current(root) == s2
    assert t.files() == ["a.parquet", "b.parquet"]


def test_compaction_replace_semantics(spark, tmp_path):
    """compact(): same rows, fewer files; time travel to pre-compaction
    snapshots still works; incremental readers skip the replace snapshot
    (it adds no data); appends after compaction diff normally."""
    t = SnapshotTable(str(tmp_path / "ct"))
    s1 = t.append(spark.range(0, 100).withColumn("v", F.col("id") * 2)
                  .repartition(4))
    s2 = t.append(spark.range(100, 200).withColumn("v", F.col("id") * 2)
                  .repartition(4))
    n_before = len(t.files())
    assert n_before == 8
    sc = t.compact(spark, target_file_bytes=1 << 30)   # → 1 file
    assert sc is not None
    assert len(t.files()) == 1
    assert t.snapshot(sc)["operation"] == "replace"
    # single live file → nothing to gain → no-op
    assert t.compact(spark, target_file_bytes=1 << 30) is None
    # rows identical, pre-compaction time travel intact
    assert t.read(spark).count() == 200
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(200))
    assert t.read(spark, snapshot_id=s1).count() == 100
    # snapshot-diff: the replace snapshot contributes nothing
    assert t.added_since(s2) == []
    with pytest.raises(ValueError):
        t.incremental(spark, s2)
    # appends after compaction diff normally from the replace snapshot
    s3 = t.append(spark.range(200, 250).withColumn("v", F.col("id") * 2))
    assert t.incremental(spark, sc).count() == 50
    assert t.read(spark).count() == 250


def test_compaction_loses_cleanly_to_concurrent_append(spark, tmp_path):
    """A racing append between the compaction's read and its commit must
    surface as CommitConflict with the appended rows intact."""
    from go_shapefile_spark.sources.table_format import (CommitConflict,
                                                         InMemoryCatalog)

    cat = InMemoryCatalog()
    t = SnapshotTable(str(tmp_path / "cr"), catalog=cat)
    t.append(spark.range(0, 50).repartition(4))

    orig_commit = t.commit
    raced = {}

    def racing_commit(*a, **k):
        if not raced and k.get("operation") == "replace":
            raced["x"] = True
            SnapshotTable(t.root, catalog=cat).append(spark.range(50, 60))
        return orig_commit(*a, **k)

    t.commit = racing_commit
    with pytest.raises(CommitConflict):
        t.compact(spark, target_file_bytes=1 << 30)
    assert t.read(spark).count() == 60   # append survived, table intact


def test_expire_snapshots_gc(spark, tmp_path):
    """expire_snapshots drops old manifests and deletes data files only
    retained snapshots no longer reference (the pre-compaction GC)."""
    t = SnapshotTable(str(tmp_path / "gc"))
    s1 = t.append(spark.range(0, 100).repartition(4))
    s2 = t.append(spark.range(100, 200).repartition(4))
    old_files = set(t.files())
    sc = t.compact(spark, target_file_bytes=1 << 30)
    s3 = t.append(spark.range(200, 220))
    stats = t.expire_snapshots(keep_last=2)       # keep (sc, s3)
    assert stats["snapshots"] == 2
    assert stats["files"] == len(old_files)       # pre-compaction files GC'd
    for f in old_files:
        assert not fsio.exists(f)
    # current reads + diff reads over retained chain still exact
    assert t.read(spark).count() == 220
    assert t.incremental(spark, sc).count() == 20
    assert [s["snapshot_id"] for s in t.snapshots()] == [sc, s3]
    # expired ids are gone: time travel fails loudly
    with pytest.raises(Exception):
        t.read(spark, snapshot_id=s1)
    # diffing FROM the newest expired id still works — the walk only
    # reads manifests NEWER than the from-id, which are retained
    assert t.added_since(s2) == t.snapshot(s3)["added_files"]
    # diffing from a deeper expired id needs an expired manifest → raises
    with pytest.raises(ValueError):
        t.added_since(s1)


def test_catalogless_compaction_race_best_effort(spark, tmp_path):
    """Without a catalog, a pinned-parent commit re-reads the pointer
    just before flipping it — the practical compaction-vs-append race is
    detected (best-effort; only a catalog closes it atomically)."""
    from go_shapefile_spark.sources.table_format import CommitConflict

    t = SnapshotTable(str(tmp_path / "ncr"))
    t.append(spark.range(0, 40).repartition(4))

    orig_commit = t.commit
    raced = {}

    def racing_commit(*a, **k):
        if not raced and k.get("operation") == "replace":
            raced["x"] = True
            SnapshotTable(t.root).append(spark.range(40, 50))
        return orig_commit(*a, **k)

    t.commit = racing_commit
    with pytest.raises(CommitConflict):
        t.compact(spark, target_file_bytes=1 << 30)
    assert t.read(spark).count() == 50     # append survived


def test_expire_removes_empty_commit_dirs(spark, tmp_path):
    """GC also removes commit directories whose data files are all dead
    (writer sidecars like _SUCCESS are never in a manifest)."""
    import posixpath

    t = SnapshotTable(str(tmp_path / "gcd"))
    t.append(spark.range(0, 30).repartition(3))
    old_dirs = {posixpath.dirname(f) for f in t.files()}
    t.compact(spark, target_file_bytes=1 << 30)
    t.append(spark.range(30, 40))
    t.expire_snapshots(keep_last=2)
    for d in old_dirs:
        assert not fsio.exists(d)


def test_merge_copy_on_write_semantics(spark, tmp_path):
    """MERGE replaces matched keys, inserts unseen keys, rewrites ONLY
    the files containing a matched key, and leaves the pre-merge
    snapshot time-travelable."""
    t = SnapshotTable(str(tmp_path / "mt"))
    t.append(spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                                   "k long, s string, v long"))
    s2 = t.append(spark.createDataFrame([(3, "c", 30), (4, "d", 40)],
                                        "k long, s string, v long"))
    files_before = set(t.files())
    assert len(files_before) >= 2

    upd = spark.createDataFrame([(2, "B", 200), (9, "z", 900)],
                                "k long, s string, v long")
    s3 = t.merge(spark, upd, ["k"])

    rows = {r.k: (r.s, r.v) for r in t.read(spark).collect()}
    assert rows == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30),
                    4: ("d", 40), 9: ("z", 900)}

    # CoW at file granularity: the second commit's files held no
    # matched key, so they must be referenced UNCHANGED by the merge
    # snapshot; at least one file (the k=2 holder) was rewritten
    files_after = set(t.files(s3))
    carried = files_before & files_after
    assert carried and files_after != files_before
    s2_files = set(t.snapshot(s2)["added_files"])
    assert s2_files <= files_after   # untouched commit carried over

    # pre-merge snapshot still reads the old rows (time travel)
    old = {r.k: r.v for r in t.read(spark, snapshot_id=s2).collect()}
    assert old == {1: 10, 2: 20, 3: 30, 4: 40}

    # merge into an empty table is an append
    t2 = SnapshotTable(str(tmp_path / "mt2"))
    t2.merge(spark, upd, ["k"])
    assert {r.k for r in t2.read(spark).collect()} == {2, 9}


def test_merge_conflict_with_racing_append(spark, tmp_path):
    from go_shapefile_spark.sources.table_format import (
        CommitConflict, InMemoryCatalog)

    cat = InMemoryCatalog()
    root = str(tmp_path / "mc")
    t = SnapshotTable(root, catalog=cat)
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"))

    # simulate a racer: another handle appends after the merge reads
    racer = SnapshotTable(root, catalog=cat)

    class RacingTable(SnapshotTable):
        def files(self, snapshot_id=None):
            files = super().files(snapshot_id)
            racer.append(spark.createDataFrame([(5, 50)],
                                               "k long, v long"))
            return files

    rt = RacingTable(root, catalog=cat)
    with pytest.raises(CommitConflict):
        rt.merge(spark, spark.createDataFrame([(1, 11)],
                                              "k long, v long"), ["k"])
    # the racer's row is intact and no merge data leaked in
    assert {(r.k, r.v) for r in t.read(spark).collect()} == {(1, 10),
                                                             (5, 50)}
