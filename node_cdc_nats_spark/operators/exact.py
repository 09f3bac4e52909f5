"""Deterministic float aggregation helpers.

Floating-point SUM/AVG are order-dependent, and Spark's partial+final
aggregation order differs from DuckDB's — so oracle value-hashes can flip
on the last ulp. Both engines round a double to DECIMAL identically (the
nearest 6-decimal value of a binary double is unambiguous in practice), and
decimal summation is exact, so `sum(cast(x as decimal)) :: double` is
bit-identical across engines *and* across partitionings — which also means
results are stable under AQE re-partitioning at 100 TB scale, not just in
the oracle diff.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(30,6)"


def dsum(col: Column | str) -> Column:
    """Exact (decimal-accumulated) sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average (sum_decimal / count) of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) / COUNT({expr})"
