"""fsio: URI resolution, range reads, atomic writes, listings."""

import os

import pytest

from go_shapefile_spark.sources import fsio


def test_resolve_and_range_reads(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(bytes(range(200)))
    for path in (str(p), f"file://{p}"):
        assert fsio.exists(path)
        assert fsio.getsize(path) == 200
        assert fsio.read_bytes(path) == bytes(range(200))
        assert fsio.read_bytes(path, 10, 5) == bytes(range(10, 15))
    assert not fsio.exists(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        fsio.getsize(str(tmp_path / "nope"))


def test_atomic_write_and_listing(tmp_path):
    d = tmp_path / "dir" / "sub"
    target = str(d / "out.json")
    fsio.atomic_write_bytes(target, b"{}")
    assert fsio.read_bytes(target) == b"{}"
    fsio.atomic_write_bytes(target, b'{"v": 2}')  # overwrite is atomic too
    assert fsio.read_bytes(target) == b'{"v": 2}'
    # no temp droppings left behind
    names = [os.path.basename(f) for f in fsio.list_files(str(d))]
    assert names == ["out.json"]
    assert fsio.is_dir(str(d)) and not fsio.is_dir(target)
    # listing keeps the scheme prefix for URI inputs
    uri_files = fsio.list_files(f"file://{d}")
    assert uri_files and all(f.startswith("file://") for f in uri_files)


def test_seekable_open(tmp_path):
    p = tmp_path / "seek.bin"
    p.write_bytes(b"0123456789")
    f = fsio.open_seekable(f"file://{p}")
    f.seek(4)
    assert f.read(3) == b"456"


def test_list_files_uri_edge_cases(tmp_path):
    """Authority-preserving listings survive trailing slashes and the
    results round-trip back through fsio reads; rmtree is idempotent and
    accepts file: URIs (the Spark warehouse.dir form)."""
    d = tmp_path / "edge"
    d.mkdir()
    (d / "a.bin").write_bytes(b"x")
    (d / "b.bin").write_bytes(b"y")
    plain = fsio.list_files(str(d))
    slashed = fsio.list_files(f"file://{d}/")
    unslashed = fsio.list_files(f"file://{d}")
    assert len(plain) == len(slashed) == len(unslashed) == 2
    # every listed URI is directly readable through fsio again
    for f in slashed:
        assert f.startswith("file://")
        assert fsio.read_bytes(f) in (b"x", b"y")
    # rmtree: file: single-slash URI form, then a no-op on re-delete
    fsio.rmtree(f"file:{d}")
    assert not fsio.exists(str(d))
    fsio.rmtree(str(d))   # absent → no-op, no raise
