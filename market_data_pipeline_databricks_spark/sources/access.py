"""Fine-grained access control: row-level security + column masking
applied as plan rewrites over a DataFrame — the governed-view layer a
multi-tenant lakehouse puts between raw tables and analysts (the
pattern SIGMOD'25's Databricks Lakeguard describes: enforce policy in
the query plan, not in copies of the data).

Design stance:

- a :class:`Policy` is DATA (a row-filter SQL predicate + per-column
  mask expressions keyed by the principal's grants), so policies can
  live in a catalog table and be audited;
- :func:`secured_view` rewrites the plan: the row filter composes
  into the scan (Catalyst pushes it down like any predicate — policy
  enforcement rides predicate pushdown for free, which is what makes
  this viable at 100 TB), and masked columns are REPLACED by their
  mask expression so the original value never appears downstream of
  the view — a consumer cannot select around the mask;
- deny-by-default: masking a column the principal lacks replaces it
  even in derived expressions because the rewrite happens before any
  consumer logic is applied.

The engine-side mask expressions are ordinary Columns (sha2, bucket,
literal redaction), so a governed view stays fully
Catalyst-optimizable — no UDF tax for policy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Policy:
    """One principal's access to one table.

    ``row_filter``: SQL boolean expression over the table's columns
    (``None`` = all rows). ``column_masks``: column name → SQL
    expression computing the masked replacement (may reference the
    original column). Unlisted columns pass through."""

    row_filter: str | None = None
    column_masks: dict[str, str] = field(default_factory=dict)


def secured_view(df: DataFrame, policy: Policy) -> DataFrame:
    """Apply ``policy`` to ``df``: filter rows, then replace every
    masked column IN PLACE (same name, masked value) so downstream
    consumers — joins, aggregates, exports — can never observe the
    raw value. All masks are applied in ONE projection over the
    original row, so a mask expression referencing another masked
    column sees the RAW value (as the Policy contract states) and the
    result never depends on dict insertion order. Raises
    ``ValueError`` for masks on unknown columns (a policy typo must
    not silently leave a column unmasked).

    A mask may change the column's DATA TYPE while keeping its name:
    ``masked_hash`` yields a string whatever the source type, and
    ``masked_bucket`` yields BIGINT (e.g. a DECIMAL balance becomes
    its BIGINT band). This is deliberate — the masked value is a
    different domain and silently casting it back could overflow or
    re-coarsen — but schema-sensitive consumers of a governed view
    (writers with declared DDL, unions with the raw table) must read
    the VIEW's schema, not the base table's."""
    unknown = [c for c in policy.column_masks if c not in df.columns]
    if unknown:
        raise ValueError(
            f"policy masks unknown columns {unknown}; table has "
            f"{df.columns} — refusing to apply a partial policy"
        )
    out = df
    if policy.row_filter is not None:
        out = out.filter(F.expr(policy.row_filter))
    if policy.column_masks:
        out = out.select(
            *[
                F.expr(policy.column_masks[c]).alias(c)
                if c in policy.column_masks
                else F.col(c)
                for c in out.columns
            ]
        )
    return out


def _sql_str_literal(s: str) -> str:
    """Escape ``s`` as a SQL single-quoted string literal. Policies
    are DATA (loaded from catalog tables), so a pepper containing a
    quote must become a literal, never spliced syntax — an unescaped
    quote in the SECURITY layer would be an injection vector that
    could close the literal and reference the raw column."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def masked_hash(col: str, pepper: str) -> str:
    """Convenience mask: salted SHA-256 pseudonym (deterministic for
    joins, irreversible without the pepper)."""
    return f"sha2(concat({_sql_str_literal(pepper + ':')}, {col}), 256)"


def masked_bucket(col: str, width: int) -> str:
    """Convenience mask: numeric generalization to ``width``-sized
    bands (k-anonymity-style coarsening).

    NOTE the mask changes the column's TYPE to BIGINT (like
    ``masked_hash`` produces a string) — see :func:`secured_view`.
    Raises ``ValueError`` for ``width <= 0``: a policy typo in the
    security layer must fail loudly, not silently NULL the column
    (width=0 divides by zero) or emit nonsense buckets (negative)."""
    if (
        isinstance(width, bool)
        or not isinstance(width, int)
        or width <= 0
    ):
        raise ValueError(
            f"masked_bucket width must be a positive integer, got {width!r} "
            "— a non-integral or boolean width silently changes the "
            "generalization the policy declared"
        )
    return f"CAST(FLOOR({col} / {width}.0) AS BIGINT) * {width}"
