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
from tests.conftest import SF_DIR, SF_DIR_ORACLE

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


# FULL loaded schema of every driver table (r4 verdict task 2): the r3
# drift cost 13 CORRECTNESS errs + 58 test failures before any in-repo
# check named the cause. A physical-type change that load_table does not
# normalize away now fails HERE, naming the table. Pinned from the actual
# sf0.001/sf0.01 fixtures on 2026-08-14 (identical at both SFs).
PINNED_SCHEMAS = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": (
        "struct<c_custkey:bigint,c_name:string,c_nationkey:int,"
        "c_acctbal:double,c_mktsegment:string>"
    ),
    "supplier": (
        "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>"
    ),
    "part": (
        "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,"
        "p_size:int,p_retailprice:double>"
    ),
    "orders": (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>"
    ),
    "lineitem": (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp_ntz>"
    ),
    "events": (
        "struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    ),
    "documents": (
        "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>"
    ),
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
@pytest.mark.parametrize("table", TABLES)
def test_full_loaded_schema_is_pinned(spark, table, sf_dir):
    """The COMPLETE post-load schema of each driver table, not just spot
    columns — at BOTH the test SF and the driver's oracle SF (sf0.01, where
    CORRECTNESS runs). If the driver regenerates a fixture with a type the
    loader doesn't normalize, exactly this test fails with the table name
    and the schema diff — instead of 13 opaque CORRECTNESS errs (the r3
    failure mode)."""
    got = load_table(spark, sf_dir, table).schema.simpleString()
    assert got == PINNED_SCHEMAS[table], (
        f"{table} loaded schema drifted at {sf_dir}:\n  got    {got}\n"
        f"  pinned {PINNED_SCHEMAS[table]}\n"
        "If the new physical type is legitimate, teach io.load_table to "
        "normalize it (as with events.ts nanos→ntz) and re-pin."
    )


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
