"""Time the Spark side of every registered query at one scale factor.

Complements bench.py (headline set, min-of-3) with a one-shot latency
sweep across the WHOLE registry — the fastest way to spot a query whose
plan regressed (e.g. an expression re-evaluation or a lost broadcast)
before the driver or the oracle gate feels it.

Usage: python tools/sweep_timings.py [sf_dir] [top_n]
Prints the top-N slowest queries and the total, then one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from market_data_pipeline_databricks_spark.plans.registry import all_queries
from market_data_pipeline_databricks_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark(app_name="sweep_timings")
    times: dict[str, float] = {}
    failed: list[str] = []
    for name, fn in all_queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"ERROR {name}: {str(e)[:140]}", file=sys.stderr)

    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t:8.2f}s  {name}")
    total = round(sum(times.values()), 1)
    print(f"total {total}s over {len(times)} queries, {len(failed)} failed")
    print(json.dumps({"sf_dir": sf_dir, "total_s": total, "queries": times,
                      "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    main()
