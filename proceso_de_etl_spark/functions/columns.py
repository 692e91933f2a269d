"""Reusable column expressions (all JVM-side — no Python UDFs).

Exact-aggregation note: double-precision SUM depends on accumulation
order, which differs between a 32-way parallel Spark aggregate and any
other engine — and between two Spark runs with different partitioning.
``dsum``/``davg`` therefore route money/measure sums through an exact
DECIMAL accumulator and cast the final value back to DOUBLE: the
result is bit-identical regardless of parallelism, so downstream
consumers (and the DuckDB correctness oracle) see stable values.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: ColumnOrName, scale: int = 2) -> Column:
    """Exact fixed-point view of a double money/measure column."""
    return _col(c).cast(f"decimal(18,{scale})")


def dsum(c: ColumnOrName, scale: int = 2) -> Column:
    """Order-independent (exact) sum of a double column, as double.

    Perf note (measured, sf0.1): a scaled-BIGINT accumulator
    (sum(round(x*10^s)::bigint)/10^s) is ~2.5x faster than DECIMAL,
    but Spark's non-ANSI long sum WRAPS silently on overflow —
    unacceptable for an engine sized for 100 TB facts. DECIMAL
    accumulation cannot overflow (38-digit headroom), so it stays
    the default; swap in the long path only for bounded-domain
    columns where the product sum provably fits 63 bits."""
    return F.sum(money(c, scale)).cast("double")


def davg(c: ColumnOrName, scale: int = 2) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    return dsum(c, scale) / F.count(_col(c))


def clean_id(c: ColumnOrName, prefix: str) -> Column:
    """Normalize a business id: strip a leading prefix, cast to long.

    Re-expression of the reference's ``limpiar_id`` (reference
    main.py:38-41) — pandas str.replace + to_numeric(coerce) — as a
    single codegen'd expression: non-numeric leftovers become NULL
    exactly like ``errors='coerce'``.
    """
    return F.regexp_replace(_col(c).cast("string"), f"^{prefix}", "").try_cast("bigint")
