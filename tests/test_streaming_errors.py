"""S8 error-channel parity: the reference re-emits broker errors as
NatsError events (`lib/nats.js:58-60,82-84`); the engine's analog is a
StreamingQueryListener translating query failures into NatsError events
(`streaming/errors.py`)."""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql.streaming import StreamingQueryException

from node_cdc_nats_spark.sources.nats import NatsError
from node_cdc_nats_spark.streaming.errors import error_channel
from node_cdc_nats_spark.streaming.source import read_events_stream

from .conftest import SF_DIR


def _wait_for(cond, timeout=30.0):
    deadline = time.monotonic() + timeout
    while not cond() and time.monotonic() < deadline:
        time.sleep(0.05)
    return cond()


def test_poisoned_batch_emits_nats_error_event(spark):
    received: list[NatsError] = []
    with error_channel(spark, received.append) as listener:
        stream = read_events_stream(spark, SF_DIR, single_batch=True)

        def poison(df, batch_id):
            raise ValueError("poisoned micro-batch")

        query = (
            stream.writeStream.foreachBatch(poison)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_err_"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException):
            query.awaitTermination()
        # listener delivery is asynchronous — wait for the terminated event
        assert _wait_for(lambda: listener.errors)
    err = listener.errors[0]
    assert isinstance(err, NatsError)
    assert "poisoned micro-batch" in str(err)
    assert err.chained_error is not None  # raw runtime text preserved
    assert received == listener.errors  # handler got the same event


def test_clean_stop_emits_no_error_event(spark):
    with error_channel(spark) as listener:
        stream = read_events_stream(spark, SF_DIR, single_batch=True)
        query = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ok_"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        time.sleep(0.5)  # grace for any (wrong) async event delivery
    assert listener.errors == []


def test_nats_error_message_only_construction():
    # processErr constructs with message only — code stays unset
    # (lib/nats.js:82-84); coded construction is unchanged.
    e = NatsError("boom")
    assert e.code is None and str(e) == "boom"
    e2 = NatsError("bad", "BAD_MSG")
    assert e2.code == "BAD_MSG" and str(e2) == "BAD_MSG: bad"
