"""Fixture-drift smoke: every driver table loads and resolves the declared
engine-facing schema, whatever physical types the generated parquet uses.

Round 3 lost 44/122 queries to a silent fixture regeneration (events.ts
flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) that no in-repo check caught.
This test fails loudly, by table name, on the next such drift.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    NumericType,
    StringType,
    TimestampNTZType,
)

from node_cdc_nats_spark.io import load_table
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize("table", TABLES)
def test_table_loads_and_projects(spark, table):
    df = load_table(spark, SF_DIR, table)
    # Touch every column through an actual projection so type resolution
    # (not just schema listing) runs — analysis errors surface here.
    assert df.select(*df.columns).limit(1).count() in (0, 1)


def test_events_ts_is_timestamp_ntz(spark):
    """The loader must normalize events.ts to TIMESTAMP_NTZ regardless of
    the parquet physical type (nanos-as-int64 or native timestamp)."""
    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType), (
        f"events.ts resolved to {df.schema['ts'].dataType}; "
        "fixture drift or loader regression"
    )
    # And event-time arithmetic must analyze — this is the exact expression
    # class that broke in round 3.
    from pyspark.sql import functions as F

    df.select(F.window("ts", "1 hour")).limit(1).count()


def test_key_columns_keep_expected_types(spark):
    """Pin the handful of column types the engine's operators rely on."""
    expectations = {
        "events": {"user_id": NumericType, "event_type": StringType,
                   "value": NumericType},
        "documents": {"doc_id": NumericType, "text": StringType},
        "embeddings": {"vec_id": NumericType, "embedding": ArrayType},
        "lineitem": {"l_quantity": NumericType, "l_returnflag": StringType},
        "orders": {"o_orderkey": NumericType},
    }
    for table, cols in expectations.items():
        schema = load_table(spark, SF_DIR, table).schema
        for col, expected in cols.items():
            actual = schema[col].dataType
            assert isinstance(actual, expected), (
                f"{table}.{col} resolved to {actual}, expected {expected.__name__}"
            )
