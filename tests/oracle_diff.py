"""Driver-mimicking oracle diff: run a registered Spark query and its DuckDB
oracle SQL on the same parquet dir, compare row count, column names, and
order-insensitive exact values.

Stricter than any plausible driver hash: we require exact value equality
(floats compared bitwise after canonicalization), so any hashing scheme the
driver applies will also match.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from node_cdc_nats_spark.schemas import FIXTURE_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (dt.datetime, dt.date)):
        return ("t", str(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def _spark_schema_kinds(sdf) -> dict[str, str]:
    """Map each Spark column to the numpy dtype *kind* its null-free
    pandas materialization would carry ('i' int, 'f' float, 'b' bool);
    non-numeric/decimal/nested types are omitted (not dtype-checked)."""
    from pyspark.sql import types as T

    kinds: dict[str, str] = {}
    for f in sdf.schema.fields:
        t = f.dataType
        if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            kinds[f.name] = "i"
        elif isinstance(t, (T.FloatType, T.DoubleType)):
            kinds[f.name] = "f"
        elif isinstance(t, T.BooleanType):
            kinds[f.name] = "b"
    return kinds


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: repr(t),
    )


def compare(spark, name: str, query_fn, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = query_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    # Driver-faithfulness gate: the external driver canonicalizes results
    # with pandas sort/factorize, which REQUIRES hashable cells — a query
    # that emits array/binary/struct cells passes value comparison here but
    # crashes the driver (array_ops / nats_roundtrip, round 1). Checked on
    # the first NON-NULL cell per column (not just row 0 — a nullable
    # column whose first row is None would slip an unhashable column past
    # a row-0-only check).
    if srows:
        for i in range(len(scols)):
            cell = next((row[i] for row in srows if row[i] is not None), None)
            if isinstance(cell, (list, dict, set, bytearray)):
                problems.append(
                    f"{name}: column {scols[i]!r} emits unhashable "
                    f"{type(cell).__name__} cells — the driver canonicalizer "
                    "will crash; render as string/scalar instead"
                )
        if problems:
            return problems

    con = duckdb_conn(sf_dir)
    res = con.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    # Driver-faithfulness gate #2 (r5 root cause): the driver hashes the
    # PANDAS materialization of both sides, and pandas hashing is
    # dtype-sensitive — DuckDB SUM(int)/SUM(bigint) returns HUGEINT, which
    # lands in pandas as float64, so an uncast integer sum hash-mismatches
    # Spark's int64 even when every value is equal (q12_late_priority /
    # sessionize_events / funnel_conversion, CORRECTNESS_r05). Require the
    # pandas dtype KIND (int-family vs float) to match per null-free
    # numeric column; oracles fix it with CAST(... AS BIGINT/DOUBLE).
    # Columns containing NULLs are skipped: both engines coerce nullable
    # ints to float64 in pandas, so the driver sees matching dtypes there.
    ddf = con.execute(oracle).df()
    dkinds = {c: ddf[c].dtype.kind for c in ddf.columns}
    con.close()
    skinds = _spark_schema_kinds(sdf)
    for i, c in enumerate(scols):
        sk, dk = skinds.get(c), dkinds.get(c)
        if sk is None or dk is None or dk not in "iufb":
            continue
        if any(row[i] is None for row in srows):
            continue
        if (sk in "iub") != (dk in "iub"):
            problems.append(
                f"{name}: column {c!r} pandas dtype kind differs "
                f"spark={sk!r} duckdb={dk!r} — the driver's dtype-sensitive "
                "hash will mismatch on equal values; CAST the oracle (or "
                "Spark) side to the same numeric family"
            )
    if problems:
        return problems

    if sorted(scols) != sorted(dcols):
        problems.append(f"{name}: columns differ spark={sorted(scols)} duckdb={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"{name}: row count spark={len(srows)} duckdb={len(drows)}")
    s_set = _rowset(scols, srows)
    d_set = _rowset(dcols, drows)
    if s_set != d_set:
        diffs = 0
        for a, b in zip(s_set, d_set):
            if a != b:
                problems.append(f"{name}: first differing row\n  spark ={a}\n  duckdb={b}")
                diffs += 1
                if diffs >= 3:
                    break
        if not diffs:
            problems.append(f"{name}: value sets differ (length mismatch tail)")
    return problems
