"""Filesystem abstraction for sources and the lineage ledger.

The reference reads shapefiles through Go's ``fs.FS`` interface (reference
shapefile.go:208-320, ReadFS) so any filesystem — OS, zip, embedded —
can back a read.  The Spark-native analog is a URI-addressed filesystem:
``s3a://bucket/tiles/x.shp`` must work exactly like ``/data/x.shp``,
because on a real cluster the inputs live in object storage.

This module routes every byte-level access through ``pyarrow.fs``:

* bare paths → ``LocalFileSystem`` (zero behavior change for tests),
* ``file://``, ``s3://``, ``hdfs://``, ``gs://`` URIs →
  ``pyarrow.fs.FileSystem.from_uri`` (the same Arrow filesystems Spark's
  own parquet reader uses from Python).

All helpers take the full path/URI; resolution happens per call so the
functions are trivially usable inside Spark tasks (pyarrow is installed
on executors — it ships with pyspark — and resolving on the worker skips
shipping live filesystem handles through pickled closures).

Seekable reads matter: ``open_seekable`` returns a random-access file
whose ``seek``/``read`` do HTTP range requests on object stores, so a
task reading records [a, b) of a 10 GB .shp fetches only its byte span
(the distributed analog of the reference's ``Scanner.Discard``,
scanner.go:458-525).
"""

from __future__ import annotations

import posixpath

import pyarrow.fs as pafs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """Path or URI → (filesystem, fs-local path)."""
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def info(path: str) -> pafs.FileInfo:
    fs, p = resolve(path)
    return fs.get_file_info(p)


def exists(path: str) -> bool:
    return info(path).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    return info(path).type == pafs.FileType.Directory


def getsize(path: str) -> int:
    i = info(path)
    if i.type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    return i.size


def read_bytes(path: str, offset: int = 0, length: int | None = None) -> bytes:
    """Read ``length`` bytes at ``offset`` (whole file when length None).

    One range request on object stores — the per-split read pattern.
    """
    fs, p = resolve(path)
    with fs.open_input_file(p) as f:
        if offset == 0 and length is None:
            return f.read()
        f.seek(offset)
        return f.read(length)


def open_seekable(path: str):
    """Random-access input file (for zipfile & friends)."""
    fs, p = resolve(path)
    return fs.open_input_file(p)


def write_bytes(path: str, data: bytes) -> None:
    """Create/overwrite ``path`` with ``data`` (single atomic PUT on
    object stores; plain create on local FS)."""
    fs, p = resolve(path)
    parent = posixpath.dirname(p)
    if parent and isinstance(fs, pafs.LocalFileSystem):
        fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(p) as f:
        f.write(data)


def atomic_write_bytes(path: str, data: bytes) -> None:
    """Write so that readers never observe a partial file.

    Local FS: write a dot-temp sibling then rename (POSIX-atomic).
    Object stores: a single PUT is already atomic per-object, so write
    directly — there is no rename primitive worth emulating.
    """
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        import uuid

        parent = posixpath.dirname(p)
        if parent:
            fs.create_dir(parent, recursive=True)
        tmp = posixpath.join(parent, f".tmp-{uuid.uuid4().hex}")
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, p)
    else:
        write_bytes(path, data)


def makedirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def rmtree(path: str) -> None:
    """Recursively delete a file or directory; no-op when absent.

    Accepts ``file:`` / ``file://`` URIs as well as bare paths (Spark's
    ``spark.sql.warehouse.dir`` reports managed-table locations as
    ``file:/...`` URIs).
    """
    if path.startswith("file:") and "://" not in path:
        path = "/" + path[5:].lstrip("/")
    fs, p = resolve(path)
    t = fs.get_file_info(p).type
    if t == pafs.FileType.Directory:
        fs.delete_dir(p)
    elif t == pafs.FileType.File:
        fs.delete_file(p)


def list_files(directory: str) -> list[str]:
    """Non-recursive file listing; returns full paths/URIs."""
    fs, p = resolve(directory)
    sel = pafs.FileSelector(p, allow_not_found=True)
    prefix = ""
    if "://" in directory:
        # Preserve scheme AND authority (hdfs://host:8020/dir — or just
        # hdfs://host:8020/ — must not come back as hdfs:///dir).  Two
        # URI styles exist: bucket-in-path filesystems (s3/gs: the
        # fs-local path already starts with the bucket) keep a bare
        # scheme:// prefix; authority filesystems (hdfs: fs-local path is
        # /dir) keep scheme://authority.
        scheme, rest = directory.split("://", 1)
        authority = rest.split("/", 1)[0]
        # Style is decided by the fs-local path SHAPE, not by comparing
        # segments (hdfs://data/data/tiles would false-match a
        # first-segment-equals-authority test): authority filesystems
        # (hdfs) resolve to an absolute "/dir" path, bucket-in-path
        # filesystems (s3/gs) resolve to "bucket/key" with no leading
        # slash.
        if authority and p.startswith("/"):
            prefix = f"{scheme}://{authority}"
        else:
            prefix = f"{scheme}://"
    out = []
    for i in fs.get_file_info(sel):
        if i.type == pafs.FileType.File:
            out.append(prefix + i.path)
    return sorted(out)
