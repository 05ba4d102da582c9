"""Dump ``explain('formatted')`` for named registry queries.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX name [name ...]

Writes ``OUT_DIR/<name>_<SUFFIX>.txt``. EAGER drives run their
construction at build time; their file carries the lazy twin's plan
plus a header note saying so (the drive's cost profile lives in the
round's OPTIMIZATION notes, not in a static plan).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from market_data_pipeline_databricks_spark.plans.registry import all_queries
from market_data_pipeline_databricks_spark.session import get_spark


def main() -> int:
    out_dir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="dump_plans")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
