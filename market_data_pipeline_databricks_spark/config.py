"""Pipeline configuration.

The reference declares config in ``config.yaml`` but never wires it in
(its notebooks hardcode paths; see reference config.yaml:11 which even
contains an invalid date). This engine makes config real: one dataclass
drives symbols, paths, thresholds and table names, loadable from YAML
when pyyaml is available and constructible directly in tests.

Reference surface: /root/reference/config.yaml:1-24,
/root/reference/notebooks/gold/04_data_quality_checks.py:15-17.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from pathlib import Path


@dataclass(frozen=True)
class QualityThresholds:
    """DQ thresholds (reference 04_data_quality_checks.py:15-17)."""

    gap_days: int = 4
    abs_return: float = 0.10
    stale_days: int = 7


@dataclass(frozen=True)
class PipelineConfig:
    raw_dir: str = "data/raw"
    warehouse_dir: str = "warehouse"
    checkpoints_dir: str = "checkpoints"
    source: str = "stooq"
    symbols: tuple[str, ...] = ("SPY", "GLD", "EURUSD", "USO")
    start_date: str | None = None
    end_date: str | None = None
    thresholds: QualityThresholds = field(default_factory=QualityThresholds)

    # Table names (reference table DDL: 01_ingest_bronze.py:72,
    # 02_transform_silver.py:99,116, 03_aggregate_gold.py:19,
    # 04_data_quality_checks.py:23).
    bronze_table: str = "bronze_prices"
    silver_table: str = "silver_prices_daily"
    rejected_table: str = "silver_prices_rejected"
    gold_table: str = "gold_market_features_daily"
    dq_table: str = "data_quality_checks"

    def table_path(self, table: str) -> str:
        return str(Path(self.warehouse_dir) / table)

    def with_dirs(self, raw_dir: str, warehouse_dir: str) -> "PipelineConfig":
        return replace(self, raw_dir=raw_dir, warehouse_dir=warehouse_dir)


def load_config(path: str | Path) -> PipelineConfig:
    """Load YAML config with the reference's key layout; tolerate the
    reference's malformed dates by dropping unparseable values."""
    try:
        import yaml  # type: ignore
    except ImportError as exc:  # pragma: no cover - pyyaml is available here
        raise RuntimeError("pyyaml not installed; construct PipelineConfig directly") from exc

    raw = yaml.safe_load(Path(path).read_text()) or {}
    data = raw.get("data", {})
    paths = raw.get("paths", {})
    dq = raw.get("quality", {})

    def _valid_date(s: object) -> str | None:
        from datetime import date

        if not isinstance(s, str):
            return None
        try:
            date.fromisoformat(s)
            return s
        except ValueError:
            return None

    return PipelineConfig(
        raw_dir=paths.get("raw_dir", "data/raw"),
        warehouse_dir=paths.get("warehouse_dir", "warehouse"),
        checkpoints_dir=paths.get("checkpoints_dir", "checkpoints"),
        source=data.get("source", "stooq"),
        symbols=tuple(data.get("symbols", ("SPY", "GLD", "EURUSD", "USO"))),
        start_date=_valid_date(data.get("start_date")),
        end_date=_valid_date(data.get("end_date")),
        thresholds=QualityThresholds(
            gap_days=int(dq.get("gap_days", 4)),
            abs_return=float(dq.get("abs_return", 0.10)),
            stale_days=int(dq.get("stale_days", 7)),
        ),
    )
