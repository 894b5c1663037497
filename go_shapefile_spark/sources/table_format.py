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

Concurrency: the CURRENT pointer is last-writer-wins (object stores
expose no compare-and-swap primitive portably); a real deployment puts a
catalog/lock in front, exactly as Iceberg does.
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from . import fsio


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.meta = posixpath.join(root, "metadata")
        fsio.makedirs(self.meta)

    # --- metadata ----------------------------------------------------------

    def _snap_path(self, snapshot_id: str) -> str:
        return posixpath.join(self.meta, f"snap-{snapshot_id}.json")

    def current_snapshot_id(self) -> str | None:
        p = posixpath.join(self.meta, "CURRENT")
        if not fsio.exists(p):
            return None
        return fsio.read_bytes(p).decode().strip() or None

    def snapshot(self, snapshot_id: str) -> dict[str, Any]:
        return json.loads(fsio.read_bytes(self._snap_path(snapshot_id)))

    def snapshots(self) -> list[dict[str, Any]]:
        """Commit chain, oldest first."""
        out: list[dict[str, Any]] = []
        sid = self.current_snapshot_id()
        while sid is not None:
            snap = self.snapshot(sid)
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
               row_count: int | None = None) -> str:
        """Append ``added_files`` as a new snapshot; returns its id.
        The manifest write is atomic, then the pointer flips — readers
        see either the old or the new snapshot, never a partial one."""
        parent = self.current_snapshot_id()
        if parent is not None:
            prev = self.snapshot(parent)
            prev_files, seq = prev["files"], prev["sequence"] + 1
        else:
            prev_files, seq = [], 1
        sid = f"{seq:06d}-{uuid.uuid4().hex[:12]}"
        snap = {
            "snapshot_id": sid, "parent": parent, "sequence": seq,
            "timestamp_ms": int(time.time() * 1000), "operation": operation,
            "added_files": list(added_files), "row_count": row_count,
            "files": prev_files + list(added_files),
        }
        fsio.atomic_write_bytes(self._snap_path(sid),
                                json.dumps(snap).encode())
        fsio.atomic_write_bytes(posixpath.join(self.meta, "CURRENT"),
                                sid.encode())
        return sid

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
            snap = self.snapshot(sid)
            out = snap["added_files"] + out
            sid = snap["parent"]
        if from_snapshot_id is not None and sid != from_snapshot_id:
            raise ValueError(
                f"{from_snapshot_id} is not an ancestor of the target snapshot")
        return out

    def incremental(self, spark: SparkSession, from_snapshot_id: str | None,
                    to_snapshot_id: str | None = None) -> DataFrame:
        """Scan only the rows appended after ``from_snapshot_id`` — the
        snapshot-diff read an idempotent resume consumes."""
        files = self.added_since(from_snapshot_id, to_snapshot_id)
        if not files:
            raise ValueError("no files added between the given snapshots")
        return spark.read.parquet(*files)
