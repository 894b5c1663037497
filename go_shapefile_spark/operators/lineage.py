"""Per-partition lineage + idempotent checkpoint/resume (SURVEY.md §2.B E11).

North rule: "resumable from checkpoint with per-partition lineage +
metrics".  An Iceberg ``_lineage`` side table would hold one row per
(stage, partition) with row counts and the input snapshot id; here the
same semantics run on a parquet directory (the sandbox has no Iceberg
runtime jar — SURVEY.md §7 slice 3 fallback; the directory version plays
the snapshot id).

Protocol (crash-safe by construction):
1. a partition's output is written to ``<out>/<stage>/part=<key>`` first,
2. only then is its lineage row appended (write-temp + atomic rename),
3. a re-run skips every partition whose lineage row says ``done`` —
   half-written outputs without a lineage row are overwritten.
So any stage can be killed at any point and re-run to an identical
final state (verified by the kill-and-rerun test).
"""

from __future__ import annotations

import json
import posixpath
import time
from typing import Callable

from pyspark.sql import DataFrame

from ..sources import fsio


class LineageLog:
    """Append-only lineage ledger: one JSON file per completed partition.

    Object-store friendly by construction: no read-modify-write, each
    completion is one atomic write (temp+rename on local FS, single PUT
    on object stores — see fsio.atomic_write_bytes).  ``root`` may be a
    local directory or any pyarrow-fs URI (s3://..., hdfs://...)."""

    def __init__(self, root: str):
        self.root = root
        fsio.makedirs(root)

    def _stage_dir(self, stage: str) -> str:
        d = posixpath.join(self.root, stage)
        fsio.makedirs(d)
        return d

    def done(self, stage: str) -> dict[str, dict]:
        out = {}
        for path in fsio.list_files(self._stage_dir(stage)):
            if path.endswith(".json"):
                try:
                    rec = json.loads(fsio.read_bytes(path))
                except json.JSONDecodeError:
                    continue  # torn write from a crashed run → not done
                if rec.get("status") == "done":
                    out[rec["partition"]] = rec
        return out

    def record(self, stage: str, partition: str, row_count: int,
               snapshot_id: str, metrics: dict | None = None) -> None:
        rec = {"stage": stage, "partition": partition, "row_count": row_count,
               "snapshot_id": snapshot_id, "status": "done",
               "wall_time_s": metrics.get("wall_time_s") if metrics else None}
        d = self._stage_dir(stage)
        fsio.atomic_write_bytes(posixpath.join(d, f"{partition}.json"),
                                json.dumps(rec).encode())


def input_snapshot_id(input_paths: list[str]) -> str:
    """Fingerprint of the inputs a stage reads — the parquet-directory
    analog of an Iceberg snapshot id.

    Hash of every input file's (path, size, mtime), so a resume after
    the inputs changed re-runs everything instead of serving stale
    partitions.  Directories are expanded one level (a parquet dataset's
    part files)."""
    import hashlib

    entries: list[str] = []
    for p in input_paths:
        files = fsio.list_files(p) if fsio.is_dir(p) else [p]
        for f in sorted(files):
            fi = fsio.info(f)
            mtime = fi.mtime.isoformat() if fi.mtime is not None else ""
            entries.append(f"{f}|{fi.size}|{mtime}")
    return hashlib.md5("\n".join(entries).encode()).hexdigest()[:16]


def run_stage(stage: str, partitions: list[str],
              build: Callable[[str], DataFrame],
              out_root: str, lineage: LineageLog,
              snapshot_id: str = "v1") -> dict[str, int]:
    """Run ``build(partition)`` for every partition not yet marked done
    *at this snapshot*; write each result to its own directory, then
    record lineage.  Pass ``snapshot_id=input_snapshot_id([...])`` so a
    completed partition is only skipped while its inputs are unchanged —
    a resume after the inputs moved re-runs it.

    Returns {partition: row_count} for the partitions run this call.
    """
    done = lineage.done(stage)
    ran: dict[str, int] = {}
    for key in partitions:
        if key in done and done[key].get("snapshot_id") == snapshot_id:
            continue
        t0 = time.monotonic()
        df = build(key)
        out_dir = posixpath.join(out_root, stage, f"part={key}")
        df.write.mode("overwrite").parquet(out_dir)
        # row count from what was actually written (cheap metadata read)
        n = df.sparkSession.read.parquet(out_dir).count()
        lineage.record(stage, key, n, snapshot_id,
                       {"wall_time_s": time.monotonic() - t0})
        ran[key] = n
    return ran


def stage_output(spark, out_root: str, stage: str) -> DataFrame:
    return spark.read.parquet(posixpath.join(out_root, stage))
