"""Cross-engine-deterministic aggregate helpers (suite-only convention).

The driver's correctness gate hash-compares our Spark results against a
DuckDB oracle. Floating-point SUM/AVG are order-dependent, so a raw
``SUM(double)`` can differ between engines in the last ulp and fail the
hash — and even double→decimal casts disagree at half-way ties (Spark
rounds the exact decimal expansion HALF_UP; DuckDB scales the double).

The convention used by every suite query, mirrored in its oracle SQL:

1. evaluate the row expression in IEEE double (deterministic given the
   same parquet input and the same expression shape),
2. ``FLOOR(expr * 10^4)`` — floor has no ties, so the resulting integer
   is bit-identical across engines,
3. SUM the BIGINTs (exact, associative → partition-order independent,
   which also makes results *reproducible at scale* where partition
   order is never stable),
4. final division back to double (deterministic IEEE).

This is a test-oracle determinism convention, not the engine's numeric
semantics: engine lowering of ``sum(double)`` is a plain ``F.sum``.
Headroom: |expr| < 9.2e14 per row and < 9.2e18 for the sum; fine at the
oracle scale (sf0.01) and the bench scale (sf0.1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000  # 4 decimal digits — full cents precision


def _scaled(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(SCALE))  # -> long


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic sum of a double expression (see module doc)."""
    out = F.sum(_scaled(col)).cast("double") / F.lit(float(SCALE))
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact scaled sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(_scaled(c)).cast("double") / F.lit(float(SCALE))) / F.count(c)
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(FLOOR(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE}.0"


def oracle_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {SCALE}) AS BIGINT)) AS DOUBLE) / {SCALE}.0)"
        f" / COUNT({expr})"
    )
