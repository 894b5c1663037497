"""Per-query isolation bench (guide §1.1/§1.4): noop-sink timing plus
explain("formatted") capture for individual registry queries.

bench.py is FROZEN for measurement; this harness exists so optimization
work can time one query at a time under the same session configuration
as bench.py's setup session (same get_spark defaults, same sf dir) and
record physical plans under plans/r06/.

Usage:
  python bench_extra.py [--rounds N] [--explain SUFFIX] [--sf-dir DIR] q...
  python bench_extra.py --list

With --explain SUFFIX, each query's .explain("formatted") is written to
plans/r06/<query>_<SUFFIX>.txt (e.g. SUFFIX=before / after).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="write plans/r06/<q>_<SUFFIX>.txt per query")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    qs = entry.queries()
    if args.list:
        for n in qs:
            print(n)
        return

    from go_shapefile_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-extra", cores=cpus)

    out: dict[str, list[float]] = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(args.rounds):
            t0 = time.monotonic()
            df = qs[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = samples
        if args.explain:
            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            with open(os.path.join(REPO, "plans", "r06",
                                   f"{name}_{args.explain}.txt"), "w") as f:
                f.write(buf.getvalue())
        print(json.dumps({"query": name, "samples": samples,
                          "min": min(samples)}))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
