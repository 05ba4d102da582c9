"""CLI: run the medallion pipeline end-to-end from a YAML config.

Replaces the reference's Databricks Job orchestration
(README.md:100-108 — 4 linear notebook tasks) with a plain runner::

    python -m market_data_pipeline_databricks_spark --config config.yaml
    python -m market_data_pipeline_databricks_spark --raw-dir data/raw --warehouse-dir wh

State passes between stages only through the written tables, same as
the reference's task boundaries.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="market_data_pipeline_databricks_spark",
        description="Run the bronze→silver→gold→quality pipeline.",
    )
    p.add_argument("--config", help="YAML config (reference config.yaml layout)")
    p.add_argument("--raw-dir", help="override: directory of raw CSVs")
    p.add_argument("--warehouse-dir", help="override: table output directory")
    p.add_argument("--source", help="override: provenance source tag")
    p.add_argument(
        "--show", action="store_true", help="print per-table summaries after the run"
    )
    p.add_argument(
        "--fetch-synthetic",
        action="store_true",
        help="populate raw_dir with deterministic synthetic OHLCV CSVs "
        "first (the reference's empty fetch_market_data.py step, made real)",
    )
    p.add_argument(
        "--run-query",
        metavar="NAME",
        help="instead of the pipeline, run one registry query by name "
        "(see --list-queries) against --sf-dir and print it",
    )
    p.add_argument(
        "--list-queries",
        action="store_true",
        help="list every registered query name and exit",
    )
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="testdata directory for --run-query (default sf0.01)",
    )
    args = p.parse_args(argv)

    if args.list_queries:
        from market_data_pipeline_databricks_spark.plans.registry import (
            all_queries,
        )

        for name in all_queries():
            print(name)
        return 0

    if args.run_query:
        from market_data_pipeline_databricks_spark.plans.registry import (
            all_queries,
        )
        from market_data_pipeline_databricks_spark.session import get_spark

        queries = all_queries()
        if args.run_query not in queries:
            print(f"unknown query: {args.run_query}", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"query-{args.run_query}")
        df = queries[args.run_query](spark, args.sf_dir)
        df.show(50, truncate=False)
        print(f"{args.run_query}: {df.count()} rows")
        return 0

    from market_data_pipeline_databricks_spark.config import (
        PipelineConfig,
        load_config,
    )
    from market_data_pipeline_databricks_spark.pipeline import run_pipeline
    from market_data_pipeline_databricks_spark.session import get_spark

    cfg = load_config(args.config) if args.config else PipelineConfig()
    overrides = {
        k: v
        for k, v in {
            "raw_dir": args.raw_dir,
            "warehouse_dir": args.warehouse_dir,
            "source": args.source,
        }.items()
        if v is not None
    }
    if overrides:
        from dataclasses import replace

        cfg = replace(cfg, **overrides)

    if args.fetch_synthetic:
        from market_data_pipeline_databricks_spark.sources.synthetic import fetch

        counts = fetch(cfg)
        for sym, n in counts.items():
            print(f"fetched {sym}: {n} rows")

    spark = get_spark(app_name="market-data-pipeline")
    out = run_pipeline(spark, cfg)
    for name, df in out.items():
        n = df.count()
        print(f"{name}: {n} rows")
        if args.show:
            df.show(20, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
