"""node_cdc_nats_spark — a PySpark-native analytics engine covering the
capability surface of ``rigoiot/node-cdc-nats`` (reference: a NATS CDC
pub/sub client, ``/root/reference/lib/nats.js``), re-expressed Spark-first.

The reference moves protobuf ``CDCMsg`` envelopes over NATS subjects and
dispatches them to MQTT-pattern subscriptions (``lib/nats.js:86-113``).
This engine models that stream relationally: the envelope is a
``StructType`` row, subscriptions are filtered DataFrame views, RPC is a
stream-stream as-of correlation, and the accumulated CDC history is a
queryable batch table — plus the full relational operator matrix and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference lacks, designed for 100 TB scale.

Layout:
    session.py    SparkSession builder tuned for the target cluster
    schemas.py    CDCMsg envelope + fixture schemas
    io.py         parquet loaders (incl. nanos-timestamp handling)
    registry.py   query/oracle registration (driver contract)
    operators/    batch operators (relational, cdc, dedup, text, ...)
    functions/    scalar helpers (mqtt pattern compiler, ...)
    streaming/    Structured Streaming operators
    sources/      custom DataSource connectors (NATS)
"""

__version__ = "0.1.0"

from .registry import register, QUERIES, ORACLES  # noqa: F401
