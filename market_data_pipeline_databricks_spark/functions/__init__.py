"""Reusable column-function library.

The reference keeps all rule/feature logic as inline Column
expressions (README.md:20); this package promotes them — plus the
standard quant features an analyst would ask of the gold table next —
to a named, composable, Catalyst-native function surface. Everything
is pure Column algebra (JVM-side, codegen-friendly); no UDFs.
"""

from market_data_pipeline_databricks_spark.functions.market import (
    drawdown,
    log_return,
    momentum,
    rolling_avg,
    rolling_vol,
    rolling_vwap,
    simple_return,
    zscore,
)

__all__ = [
    "simple_return",
    "log_return",
    "momentum",
    "rolling_avg",
    "rolling_vol",
    "rolling_vwap",
    "drawdown",
    "zscore",
]
