"""Same-window A/B control for the polygon / DBF decode kernels.

VERDICT r4 #1: ``shapefile_parse_polygons_per_s`` and
``shapefile_parse_dbf_records_per_s`` dipped ~30% in BENCH_r04 vs r03
without a control.  This harness applies the protocol that debunked the
r3 point-parse scare (BENCH.md round-4 notes): measure the SAME
workload against two checkouts in ONE interleaved window, so a host
noise burst hits both sides equally.

Usage (one invocation = one tree, prints one JSON line):

    python tools/ab_kernel_bench.py <repo_root> <cache_root> [--spark]

- dbf_per_s     : parse_dbf_native_columns over the wide 100k-row DBF
- poly_kernel_per_s : parse_polygons_vectorized over .cache/bigpolys in
                  20k-record chunks, straight from bytes (no Spark) —
                  isolates the numpy kernel from scan plumbing
- poly_e2e_per_s (--spark) : read_shapefile_df(bigpolys).count() at
                  local[32], the exact number BENCH records

Interleave by alternating trees in one shell loop (per-tree minima are
taken across rounds), e.g.:

    git worktree add .worktrees/r3 <old-commit>
    ln -s /root/repo/.cache .worktrees/r3/.cache
    for round in 1 2 3; do
      for tree in /root/repo /root/repo/.worktrees/r3; do
        (cd $tree && python /root/repo/tools/ab_kernel_bench.py \
            $tree /root/repo/.cache --spark)
      done
    done
"""

from __future__ import annotations

import json
import os
import sys
import time


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    repo, cache = sys.argv[1], sys.argv[2]
    with_spark = "--spark" in sys.argv
    sys.path.insert(0, repo)
    import numpy as np

    from go_shapefile_spark.sources import shapefile_core as core

    out: dict[str, float] = {"tree": repo}

    # --- DBF column-decode kernel (no Spark) ---------------------------
    with open(os.path.join(cache, "wide_100000.dbf"), "rb") as f:
        data = f.read()
    hdr, flds, pos = core.parse_dbf_fields(data)
    decimals = [0, 0, 0, 0, 0, 0, 0, 0, 3, 3, 3, 0]
    best = min(_timed(lambda: core.parse_dbf_native_columns(
        data, hdr, flds, pos, decimals)) for _ in range(4))
    out["dbf_per_s"] = round(100_000 / best, 1)

    # --- polygon kernel, straight from bytes (no Spark) ----------------
    with open(os.path.join(cache, "bigpolys.shp"), "rb") as f:
        shp = f.read()
    with open(os.path.join(cache, "bigpolys.shx"), "rb") as f:
        shx = core.parse_shx(f.read())
    n = len(shx.offsets)

    def poly_pass() -> None:
        for s in range(0, n, 20_000):
            e = min(s + 20_000, n)
            start = int(shx.offsets[s])
            end = int(shx.offsets[e - 1] + 8 + shx.content_lengths[e - 1])
            rel = (shx.offsets[s:e] - start).astype(np.int64)
            vec = core.parse_polygons_vectorized(
                shp[start:end], rel,
                np.arange(s + 1, e + 1, dtype=np.int64))
            assert vec is not None and vec["n"] == e - s

    best = min(_timed(poly_pass) for _ in range(4))
    out["poly_kernel_per_s"] = round(n / best, 1)

    # --- polygon scan end-to-end through Spark (the BENCH number) ------
    if with_spark:
        from go_shapefile_spark.session import get_spark
        from go_shapefile_spark.sources.shapefile import read_shapefile_df
        spark = get_spark(app_name="ab-kernel", cores=32)
        pol = read_shapefile_df(spark, os.path.join(cache, "bigpolys"),
                                target_records_per_split=20_000)
        assert pol.count() == n
        best = min(_timed(pol.count) for _ in range(2))
        out["poly_e2e_per_s"] = round(n / best, 1)
        # Arrow-direct flat-point scan — the shapefile_parse_2m_points
        # path (VERDICT r5 #3: the one kernel without a same-window
        # control when its driver number dipped 2.7x in r5)
        big = read_shapefile_df(spark, os.path.join(cache, "bigpoints"),
                                target_records_per_split=100_000,
                                flat_points=True)
        n_big = big.count()
        best = min(_timed(big.count) for _ in range(2))
        out["flat_points_per_s"] = round(n_big / best, 1)
        spark.stop()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
