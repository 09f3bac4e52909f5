"""CDCMsg envelope codec + NATS connector roundtrip as oracle-checked
operators (SURVEY.md §2.1 rows S1/S2/S6).

``cdc_encode_decode`` proves the protobuf codec inside a DataFrame plan:
events → envelope struct → wire bytes (`to_protobuf` analog) → decoded
struct (`lib/nats.js:88-90` analog) → fields. The oracle is the direct
projection of the same fields — decode(encode(x)) == x, so any codec drift
breaks the hash.

``nats_roundtrip`` drives the full connector: a streaming write of CDCMsg
envelopes through ``format("nats_cdc")`` (spool transport standing in for
the broker — no NATS server exists in this container) and a streaming read
back through the same format, returning the decoded rows. The oracle is
again the direct projection: transport + codec must be lossless.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.cdcmsg import decode_col, encode_col
from ..io import load_table
from ..registry import register
from ..sources.nats import register_nats_source
from ..streaming.source import _ckpt_dir, read_events_stream, run_to_memory

_ENVELOPE_ORACLE = """
    SELECT 'nms' AS publisher,
           CONCAT('cdc/', event_type, '/', CAST(user_id % 10 AS VARCHAR)) AS channel,
           'json' AS contentType,
           'http' AS protocol,
           '' AS reply,
           CAST(event_id % 3 AS INT) AS QOS,
           event_id % 2 = 0 AS retain,
           props AS payload
    FROM events
"""
# ^ payload compares as its UTF-8 string decode: raw binary cells come back
# from Spark as bytearray, which the driver's canonicalizer cannot sort/hash
# (same crash class as array_ops round 1). The wire payload is UTF-8 JSON by
# construction, so the decode is lossless and the codec proof is unchanged.


def _envelope_cols(df: DataFrame) -> DataFrame:
    """Construct the CDCMsg fields exactly as examples/cdc-pub.js:31-40
    does (publisher 'nms', contentType 'json', protocol 'http', empty
    reply), with the logical subject in `channel`."""
    return df.select(
        F.lit("nms").alias("publisher"),
        F.concat(
            F.lit("cdc/"), F.col("event_type"), F.lit("/"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("channel"),
        F.lit("json").alias("contentType"),
        F.lit("http").alias("protocol"),
        F.lit("").alias("reply"),
        (F.col("event_id") % 3).cast("int").alias("QOS"),
        (F.col("event_id") % 2 == 0).alias("retain"),
        F.col("props").cast("binary").alias("payload"),
    )


@register("cdc_encode_decode", oracle=_ENVELOPE_ORACLE)
def cdc_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _envelope_cols(load_table(spark, sf_dir, "events"))
    wire = env.select(
        encode_col(
            F.struct(
                "publisher", "channel", "contentType", "protocol", "reply",
                "QOS", "retain", "payload",
            )
        ).alias("wire")
    )
    return (
        wire.select(decode_col(F.col("wire")).alias("m"))
        .select("m.*")
        .withColumn("payload", F.col("payload").cast("string"))
    )


@register("nats_roundtrip", oracle=_ENVELOPE_ORACLE)
def nats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_nats_source(spark)
    spool = tempfile.mkdtemp(prefix="nats_spool_")
    # Publish in ONE micro-batch (no maxFilesPerTrigger): the roundtrip op
    # proves transport+codec losslessness, not incremental batching — the
    # reader's multi-segment offset path is covered separately by the
    # durable-offset resume test (tests/test_nats_connector.py). 5 batches
    # of Python-datasource writer startup cost ~7s of pure overhead here.
    # Cost decomposition (r8 profile, sf0.1, min-of-2): publish 5.1 s +
    # subscribe 2.8 s. The publish half is NOT the protobuf encode (1.0 s
    # single-threaded for 100k envelopes, measured standalone) — it is the
    # one-FILE-per-message spool layout: 100k create+write+rename syscalls
    # cost 8.5 s single-threaded (~2-3 s across the 4 writer partitions).
    # The r9 lever, if this op's wall time matters: a segment spool
    # (length-prefixed frames, many messages per file — the JetStream
    # file-store shape) written once per partition per batch; the reader's
    # offset contract moves from filename order to (segment, byte-offset),
    # and the wire format is untouched. The TCP publish path has no such
    # per-message fixed cost.
    env_stream = _envelope_cols(read_events_stream(spark, sf_dir, single_batch=True))
    ckpt = _ckpt_dir()
    pub = (
        env_stream.writeStream.format("nats_cdc")
        .option("spool", spool)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    pub.awaitTermination()
    # Read back through the executor-parallel partitioned reader (the
    # JetStream-shaped scale path) so the driver exercises it end-to-end;
    # the driver-side simple reader keeps its own coverage in
    # tests/test_nats_connector.py.
    sub = (
        spark.readStream.format("nats_cdc")
        .option("spool", spool)
        .option("partitions", "4")
        .load()
    )
    return run_to_memory(sub, "append").withColumn(
        "payload", F.col("payload").cast("string")
    )
