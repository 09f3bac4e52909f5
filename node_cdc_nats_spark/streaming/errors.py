"""Streaming error channel — the reference's `processErr` re-emit as a
`StreamingQueryListener` (SURVEY.md §2.1 S8).

The reference wires the broker's error event straight into its own
emitter, wrapped in `NatsError` (`lib/nats.js:58-60,82-84`):

    this.nc.on("error", function(error) { client.processErr(error); });
    Nats.prototype.processErr = function(error) {
        this.emit("error", new NatsError(error.message));
    };

The engine's transport is the Structured Streaming runtime, so the analog
event source is the query lifecycle: a failed micro-batch terminates the
query with an exception, and the listener translates that termination into
a `NatsError` event delivered to the registered handlers — same
wrap-and-re-emit contract, same error type, message-only construction.

Scale note: listeners run on the driver and receive only lifecycle
metadata (no per-row traffic), so the channel costs nothing on the hot
path regardless of stream volume.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from ..sources.nats import NatsError


class NatsErrorListener(StreamingQueryListener):
    """Translates query failures into `NatsError` events (`processErr`
    analog). Collects every error on `.errors` and forwards each to the
    optional handler — the `.on("error", cb)` twin."""

    def __init__(self, on_error: Callable[[NatsError], None] | None = None):
        self.errors: list[NatsError] = []
        self._on_error = on_error

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception is None:
            return  # clean stop — not an error event
        # Message-only construction, chained to the raw runtime text —
        # exactly processErr's `new NatsError(error.message)`.
        err = NatsError(str(event.exception), chained=event.exception)
        self.errors.append(err)
        if self._on_error is not None:
            self._on_error(err)


class error_channel:
    """Context manager installing a `NatsErrorListener` for the session:

        with error_channel(spark) as listener:
            ... run streaming queries ...
        assert not listener.errors

    Removal on exit keeps test sessions clean; a long-lived deployment
    registers the listener once at startup instead.
    """

    def __init__(
        self,
        spark: SparkSession,
        on_error: Callable[[NatsError], None] | None = None,
    ):
        self._spark = spark
        self.listener = NatsErrorListener(on_error)

    def __enter__(self) -> NatsErrorListener:
        self._spark.streams.addListener(self.listener)
        return self.listener

    def __exit__(self, *exc) -> None:
        self._spark.streams.removeListener(self.listener)
