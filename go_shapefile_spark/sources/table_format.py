"""Minimal snapshot/manifest table format — Iceberg-style semantics on
plain parquet + JSON manifests.

The north rule puts the image table and lineage on Iceberg; the sandbox
has no Iceberg runtime jar (SURVEY §7 slice 3 fallback), so this module
provides the exact semantics the engine needs from it, storage-agnostic
via :mod:`fsio` (local paths or s3://... URIs):

* **atomic append commits** — data files are staged under a unique
  directory, then one snapshot manifest + CURRENT-pointer write makes
  them visible; a crash before commit leaves the table unchanged;
* **snapshot ids** — every commit produces an id recording its parent,
  the added files, and the full live file list;
* **time travel** — ``read(spark, snapshot_id=...)`` scans exactly that
  snapshot's file list;
* **incremental reads** — ``incremental(spark, from_id)`` scans only
  files added after ``from_id`` (the snapshot-diff a resumable pipeline
  consumes: stage lineage keyed by snapshot id + incremental read =
  process-each-appended-file-exactly-once).

Layout::

    <root>/data/<commit-uuid>/part-*.parquet
    <root>/metadata/snap-<seq>-<uuid>.json
    <root>/metadata/CURRENT          (current snapshot id)

Concurrency: without a catalog, the CURRENT pointer is last-writer-wins
(object stores expose no compare-and-swap primitive portably).  Pass a
``catalog`` implementing :class:`Catalog` to get optimistic concurrency
exactly as Iceberg does it: the commit flips the pointer through the
catalog's atomic compare-and-swap, and a racer whose parent snapshot is
stale loses CLEANLY with :class:`CommitConflict` — its staged manifest
is deleted, the table is never torn.  With a catalog attached the
catalog is the SOURCE OF TRUTH for CURRENT (it must be as durable as
the commits it orders); the CURRENT file becomes a best-effort,
regression-guarded hint for catalog-less readers.  ``InMemoryCatalog``
is the reference implementation (and test double); a metastore/
DynamoDB/JDBC catalog slots in behind the same two methods.
"""

from __future__ import annotations

import json
import posixpath
import threading
import time
import uuid
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession

from . import fsio


class CommitConflict(Exception):
    """Another writer committed first; re-read CURRENT and retry."""


class Catalog(Protocol):
    """The two-method hook a real catalog implements (Iceberg's catalog
    contract reduced to what the table format needs)."""

    def current(self, table_root: str) -> str | None:
        """Current snapshot id for the table (None = no commits)."""
        ...

    def cas_current(self, table_root: str, expected: str | None,
                    new_id: str) -> bool:
        """Atomically set CURRENT to ``new_id`` iff it still equals
        ``expected``; returns False (no change) when it does not."""
        ...


class InMemoryCatalog:
    """Process-local CAS catalog: the reference implementation of the
    hook (usable as-is when all committers share one driver; tests use
    it to prove the two-writer contract)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._current: dict[str, str | None] = {}

    def current(self, table_root: str) -> str | None:
        with self._lock:
            return self._current.get(table_root)

    def cas_current(self, table_root: str, expected: str | None,
                    new_id: str) -> bool:
        with self._lock:
            cur = self._current.get(table_root, _UNSET)
            if cur is _UNSET:
                # first CAS on a table this catalog hasn't seen: import
                # the caller's view of CURRENT (a table committed before
                # the catalog was attached); the lock serializes racers,
                # so only the first import wins
                cur = expected
            if cur != expected:
                return False
            self._current[table_root] = new_id
            return True


_UNSET = object()


class SnapshotTable:
    def __init__(self, root: str, catalog: Catalog | None = None):
        self.root = root
        self.meta = posixpath.join(root, "metadata")
        self.catalog = catalog
        fsio.makedirs(self.meta)

    # --- metadata ----------------------------------------------------------

    def _snap_path(self, snapshot_id: str) -> str:
        return posixpath.join(self.meta, f"snap-{snapshot_id}.json")

    def current_snapshot_id(self) -> str | None:
        if self.catalog is not None:
            sid = self.catalog.current(self.root)
            if sid is not None:
                return sid
            # fall through: a table committed WITHOUT the catalog stays
            # readable when one is attached later (pointer import)
        return self._current_from_file()

    def snapshot(self, snapshot_id: str) -> dict[str, Any]:
        return json.loads(fsio.read_bytes(self._snap_path(snapshot_id)))

    def snapshots(self) -> list[dict[str, Any]]:
        """Commit chain, oldest RETAINED first (the walk stops cleanly
        at an expired ancestor's missing manifest)."""
        out: list[dict[str, Any]] = []
        sid = self.current_snapshot_id()
        while sid is not None:
            try:
                snap = self.snapshot(sid)
            except FileNotFoundError:
                break          # ancestor expired by expire_snapshots
            out.append(snap)
            sid = snap["parent"]
        return out[::-1]

    def files(self, snapshot_id: str | None = None) -> list[str]:
        sid = snapshot_id or self.current_snapshot_id()
        if sid is None:
            return []
        return self.snapshot(sid)["files"]

    # --- commits -----------------------------------------------------------

    def commit(self, added_files: list[str], operation: str = "append",
               row_count: int | None = None,
               expected_parent: Any = _UNSET,
               files_override: list[str] | None = None) -> str:
        """Append ``added_files`` as a new snapshot; returns its id.
        The manifest write is atomic, then the pointer flips — readers
        see either the old or the new snapshot, never a partial one.

        With a catalog attached the pointer flip is a compare-and-swap on
        the parent snapshot: a concurrent committer whose parent is stale
        raises :class:`CommitConflict` and leaves the table untouched
        (its manifest is an unreachable orphan).  ``expected_parent``
        lets a writer pin the snapshot its work was based on (optimistic
        concurrency across retries); default is the parent read now.
        """
        parent = self.current_snapshot_id() if expected_parent is _UNSET \
            else expected_parent
        if parent is not None:
            prev = self.snapshot(parent)
            prev_files, seq = prev["files"], prev["sequence"] + 1
        else:
            prev_files, seq = [], 1
        sid = f"{seq:06d}-{uuid.uuid4().hex[:12]}"
        # a "replace" snapshot (compaction) rewrites the live file list
        # without adding data: added_files stays empty so incremental
        # (snapshot-diff) readers skip it, exactly as Iceberg's
        # append-scan skips replace snapshots
        snap = {
            "snapshot_id": sid, "parent": parent, "sequence": seq,
            "timestamp_ms": int(time.time() * 1000), "operation": operation,
            "added_files": [] if files_override is not None
            else list(added_files),
            "row_count": row_count,
            "files": list(files_override) if files_override is not None
            else prev_files + list(added_files),
        }
        fsio.atomic_write_bytes(self._snap_path(sid),
                                json.dumps(snap).encode())
        if self.catalog is None and expected_parent is not _UNSET:
            # Best-effort conflict check for pinned-parent commits
            # (compaction) without a catalog: re-read the pointer just
            # before flipping it.  NOT atomic — only a catalog closes
            # the window completely — but it catches the practical race
            # (a rewrite that took seconds vs a pointer re-read) instead
            # of silently dropping a concurrent append's rows.
            if self._current_from_file() != parent:
                fsio.rmtree(self._snap_path(sid))
                raise CommitConflict(
                    f"snapshot {parent!r} is no longer CURRENT of "
                    f"{self.root} (no catalog: best-effort detection); "
                    f"re-read and retry")
        if self.catalog is not None:
            if not self.catalog.cas_current(self.root, parent, sid):
                # clean loser: remove the manifest we just staged so the
                # metadata dir only ever holds committed snapshots
                fsio.rmtree(self._snap_path(sid))
                raise CommitConflict(
                    f"snapshot {parent!r} is no longer CURRENT of "
                    f"{self.root}; re-read and retry")
            # With a catalog the CATALOG is the authority; the CURRENT
            # file is a best-effort hint for catalog-less readers.  Guard
            # it against regression: a preempted winner must not overwrite
            # a later winner's pointer (files alone cannot order writers —
            # that is exactly why durable deployments need the catalog).
            # The commit has already SUCCEEDED (catalog CAS won): a
            # broken/stale hint must not surface as a commit failure, or
            # a retrying caller would double-append.  Skip the hint
            # update instead — the catalog is the source of truth.
            try:
                prev_sid = self._current_from_file()
                if prev_sid is not None and \
                        self.snapshot(prev_sid)["sequence"] >= seq:
                    return sid
            except Exception:
                return sid
        fsio.atomic_write_bytes(posixpath.join(self.meta, "CURRENT"),
                                sid.encode())
        return sid

    def _current_from_file(self) -> str | None:
        p = posixpath.join(self.meta, "CURRENT")
        if not fsio.exists(p):
            return None
        return fsio.read_bytes(p).decode().strip() or None

    def append(self, df: DataFrame) -> str:
        """Stage a DataFrame as parquet under a unique data dir, then
        commit — the crash-safe append path."""
        data_dir = posixpath.join(self.root, "data", uuid.uuid4().hex)
        df.write.parquet(data_dir)
        files = [f for f in fsio.list_files(data_dir)
                 if f.endswith(".parquet")]
        return self.commit(files)

    # --- reads -------------------------------------------------------------

    def read(self, spark: SparkSession,
             snapshot_id: str | None = None) -> DataFrame:
        """Scan a snapshot (CURRENT by default) — time travel by id."""
        files = self.files(snapshot_id)
        if not files:
            raise ValueError(f"table {self.root} has no committed snapshot")
        return spark.read.parquet(*files)

    def added_since(self, from_snapshot_id: str | None,
                    to_snapshot_id: str | None = None) -> list[str]:
        """Files appended strictly after ``from_snapshot_id`` up to
        ``to_snapshot_id`` (CURRENT by default)."""
        sid = to_snapshot_id or self.current_snapshot_id()
        out: list[str] = []
        while sid is not None and sid != from_snapshot_id:
            try:
                snap = self.snapshot(sid)
            except FileNotFoundError as e:
                raise ValueError(
                    f"snapshot chain broken at {sid!r} (expired?); "
                    f"cannot diff from {from_snapshot_id!r}") from e
            out = snap["added_files"] + out
            sid = snap["parent"]
        if from_snapshot_id is not None and sid != from_snapshot_id:
            raise ValueError(
                f"{from_snapshot_id} is not an ancestor of the target snapshot")
        return out

    def incremental(self, spark: SparkSession, from_snapshot_id: str | None,
                    to_snapshot_id: str | None = None) -> DataFrame:
        """Scan only the rows appended after ``from_snapshot_id`` — the
        snapshot-diff read an idempotent resume consumes.  Replace
        (compaction) snapshots add no files and are skipped naturally."""
        files = self.added_since(from_snapshot_id, to_snapshot_id)
        if not files:
            raise ValueError("no files added between the given snapshots")
        return spark.read.parquet(*files)

    # --- maintenance -------------------------------------------------------

    def compact(self, spark: SparkSession,
                target_file_bytes: int = 128 << 20) -> str | None:
        """Rewrite the live file list into ~``target_file_bytes`` files
        and commit it as a REPLACE snapshot: same rows, fewer files.

        Small-file compaction is the table-maintenance half of the
        append-only design — a streaming/micro-batch writer leaves many
        tiny files whose per-file open cost eventually dominates scans.
        Old data files stay on disk (older snapshots still reference
        them — time travel keeps working) until ``expire_snapshots``
        garbage-collects them.  Returns the new snapshot id, or None
        when there is nothing to gain.  Concurrent appends: with a
        catalog the commit CASes on the snapshot the rewrite read, so a
        racing append makes this raise :class:`CommitConflict` (staged
        rewrite files are cleaned up) rather than dropping the appended
        rows; without one the pointer is re-read just before the flip —
        best-effort detection of the same race (only a catalog closes
        the window atomically).
        """
        parent = self.current_snapshot_id()
        files = self.files(parent)
        if len(files) <= 1:
            return None
        total = sum(fsio.getsize(f) for f in files)
        n_out = max(1, -(-total // target_file_bytes))
        if n_out >= len(files):
            return None
        data_dir = posixpath.join(self.root, "data",
                                  f"compact-{uuid.uuid4().hex}")
        spark.read.parquet(*files).repartition(int(n_out)) \
            .write.parquet(data_dir)
        new_files = [f for f in fsio.list_files(data_dir)
                     if f.endswith(".parquet")]
        try:
            return self.commit(new_files, operation="replace",
                               expected_parent=parent,
                               files_override=new_files)
        except CommitConflict:
            fsio.rmtree(data_dir)
            raise

    def merge(self, spark: SparkSession, updates: DataFrame,
              key_cols: list[str]) -> str:
        """Copy-on-write MERGE (upsert): every current row whose key
        matches an ``updates`` row is replaced by it; update rows with
        unseen keys insert.  ``updates`` must be key-unique and share
        the table schema.

        CoW at FILE granularity, the Iceberg merge-on-write shape:
        only data files that actually contain a matched key are
        rewritten (their unmatched rows carry over via an anti-join,
        unioned with all update rows); untouched files are referenced
        as-is by the new REPLACE snapshot — on a 100-TB table a merge
        touching one partition rewrites one partition.  The commit
        CASes on the snapshot the merge read (a racing append raises
        :class:`CommitConflict` and the staged rewrite is cleaned up).
        Matched-file discovery uses the scan's ``_metadata.file_path``
        — one aggregation over the key join, collected only to the
        (already driver-sized) file-list granularity.
        """
        from pyspark.sql import functions as F

        def _plain(p: str) -> str:
            if p.startswith("file:"):
                from urllib.parse import unquote, urlparse
                return unquote(urlparse(p).path)
            return p

        parent = self.current_snapshot_id()
        files = self.files(parent)
        if not files:
            return self.append(updates)
        keys = updates.select(*key_cols).distinct()
        cur = spark.read.parquet(*files).withColumn(
            "_src_file", F.col("_metadata.file_path"))
        hit_norm = {_plain(r[0]) for r in
                    cur.join(F.broadcast(keys), key_cols)
                    .select("_src_file").distinct().collect()}
        by_norm = {_plain(f): f for f in files}
        hits = [orig for norm, orig in by_norm.items()
                if norm in hit_norm]
        untouched = [f for f in files if f not in set(hits)]
        data_dir = posixpath.join(self.root, "data",
                                  f"merge-{uuid.uuid4().hex}")
        cols = [c for c in updates.columns]
        if hits:
            kept = (spark.read.parquet(*hits)
                    .join(keys, key_cols, "left_anti").select(*cols))
            rewritten = kept.unionByName(updates.select(*cols))
        else:
            rewritten = updates.select(*cols)
        rewritten.write.parquet(data_dir)
        new_files = [f for f in fsio.list_files(data_dir)
                     if f.endswith(".parquet")]
        try:
            return self.commit(new_files, operation="replace",
                               expected_parent=parent,
                               files_override=untouched + new_files)
        except CommitConflict:
            fsio.rmtree(data_dir)
            raise

    def expire_snapshots(self, keep_last: int = 2) -> dict[str, int]:
        """Drop all but the most recent ``keep_last`` snapshots and
        delete data files no retained snapshot references — the GC that
        reclaims pre-compaction files.  Time travel to an expired id
        stops working (by design); ``added_since`` from an expired id
        raises.  Returns {'snapshots': n_expired, 'files': n_deleted}.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        chain = self.snapshots()
        expired, kept = chain[:-keep_last], chain[-keep_last:]
        if not expired:
            return {"snapshots": 0, "files": 0}
        live = {f for s in kept for f in s["files"]}
        dead = {f for s in expired for f in s["files"]} - live
        for f in sorted(dead):
            fsio.rmtree(f)
        # a commit dir whose parquet files are all dead also holds
        # writer sidecars (_SUCCESS, .crc) no manifest lists — drop the
        # whole dir once empty of data so expired commits leave nothing
        live_dirs = {posixpath.dirname(f) for f in live}
        for d in sorted({posixpath.dirname(f) for f in dead} - live_dirs):
            if not any(f.endswith(".parquet") for f in fsio.list_files(d)):
                fsio.rmtree(d)
        for s in expired:
            fsio.rmtree(self._snap_path(s["snapshot_id"]))
        return {"snapshots": len(expired), "files": len(dead)}
