"""RocksDB state-store option for the stateful streaming ops (r4 verdict
task 4): at 100 TB, traffic-per-horizon state for stream_rpc_state /
stream_dedup cannot be assumed to fit the default in-memory
HDFSBackedStateStore; RocksDB spills to local disk with incremental
checkpoints. These tests prove the engine's stateful queries run green —
and produce identical results — under the Spark-bundled RocksDB provider.
"""

from __future__ import annotations

import pytest

from node_cdc_nats_spark.session import ROCKSDB_PROVIDER, use_rocksdb_state_store
from tests.conftest import SF_DIR

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_store(spark):
    try:
        prev = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        prev = None
    use_rocksdb_state_store(spark)
    assert spark.conf.get(_PROVIDER_KEY) == ROCKSDB_PROVIDER
    yield spark
    if prev is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prev)


def test_stream_rpc_state_green_under_rocksdb(spark, rocksdb_store):
    """The heaviest stateful op (applyInPandasWithState + event-time
    timers) must produce the same decisions under RocksDB as under the
    default store — state content is provider-independent."""
    from node_cdc_nats_spark.streaming.rpc import stream_rpc_state

    under_rocksdb = stream_rpc_state(spark, SF_DIR).count()
    spark.conf.unset(_PROVIDER_KEY)
    baseline = stream_rpc_state(spark, SF_DIR).count()
    use_rocksdb_state_store(spark)  # fixture still expects it set
    assert under_rocksdb == baseline
    assert under_rocksdb > 0


def test_stream_dedup_green_under_rocksdb(spark, rocksdb_store):
    from node_cdc_nats_spark.streaming.windows import stream_dedup

    assert stream_dedup(spark, SF_DIR).count() > 0


def test_stream_cdc_column_diff_identical_under_rocksdb(spark, rocksdb_store):
    # The r8 stateful twin carries string state (types/props arrays) plus
    # a per-key carry row — provider-independence must hold for it too,
    # and on VALUES, not just counts (the carry row is where a
    # serialization bug would corrupt silently).
    from node_cdc_nats_spark.streaming.cdc_diff import stream_cdc_column_diff

    under = {tuple(r) for r in stream_cdc_column_diff(spark, SF_DIR).collect()}
    spark.conf.unset(_PROVIDER_KEY)
    baseline = {tuple(r) for r in stream_cdc_column_diff(spark, SF_DIR).collect()}
    use_rocksdb_state_store(spark)
    assert under == baseline and len(under) > 0


def test_stream_asof_nearest_and_ohlc_green_under_rocksdb(spark, rocksdb_store):
    from node_cdc_nats_spark.streaming.asof import stream_join_asof_nearest
    from node_cdc_nats_spark.streaming.ohlc import stream_downsample_ohlc

    assert stream_join_asof_nearest(spark, SF_DIR).count() > 0
    assert stream_downsample_ohlc(spark, SF_DIR).count() > 0


def test_unknown_state_store_raises():
    """A typo ('RocksDB', 'rocks') must fail loudly, not silently run the
    in-memory default at a scale that needed disk-backed state."""
    from node_cdc_nats_spark.session import get_spark

    with pytest.raises(ValueError, match="unknown state_store"):
        get_spark(state_store="RocksDB")
