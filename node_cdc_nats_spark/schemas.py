"""Schemas: the reference's CDCMsg envelope + driver fixture tables.

The CDCMsg envelope mirrors the protobuf message constructed at
``/root/reference/examples/cdc-pub.js:31-40`` and decoded at
``/root/reference/lib/nats.js:88-90``; ``ts`` is an engine addition (the
reference has no time axis, streaming semantics need one).
"""

from __future__ import annotations

from pyspark.sql import types as T

CDC_MSG = T.StructType(
    [
        T.StructField("publisher", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("contentType", T.StringType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("reply", T.StringType()),
        T.StructField("QOS", T.IntegerType()),
        T.StructField("retain", T.BooleanType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Driver-provided fixture tables (FIXTURES.md) — all sf dirs share these.
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
