"""Ad-hoc per-query timing harness for optimization A/Bs.

Times named registry queries (min of N draws, bench.py's forcing
action — ``.count()`` on the returned frame) in ONE session, printing
a JSON line per query. Used for same-session A/B comparisons where
bench.py's full headline sweep is too slow to iterate with.

Usage: python tools/measure_query.py [--reps N] [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from market_data_pipeline_databricks_spark.plans.registry import all_queries
from market_data_pipeline_databricks_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="measure_query")
    # the same warmup bench.py performs, so first-draw JIT noise does
    # not masquerade as a plan cost
    li = spark.read.parquet(f"{args.sf}/lineitem.parquet")
    li.count()

    queries = all_queries()
    out = {}
    for name in args.names:
        fn = queries[name]
        draws = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            draws.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(draws), "draws": draws,
                     "load": round(os.getloadavg()[0], 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
