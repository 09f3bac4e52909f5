"""Streaming RPC correlation with first-wins and 408 timeout — the
reference's `rpc()` (`lib/nats.js:196-256`) as a custom stateful streaming
operator (SURVEY.md §4.2 item 3, the one genuinely stateful piece of custom
logic in the engine).

Reference semantics being reproduced:
- subscribe to N response subjects, publish request (`lib/nats.js:215-236`)
- FIRST response wins (`lib/nats.js:216-223`) — here: minimum response
  event-time, tie-broken by response id
- no response within the timeout resolves {code: 408} exactly once
  (`lib/nats.js:238-247`)

Event-time correctness requires deciding a request only once the watermark
passes its deadline (any response that could still beat the current winner
has then provably arrived), so BOTH outcomes emit at watermark-crossing
time via `applyInPandasWithState` with EventTimeTimeout timers. Requests
whose deadline the final watermark never reaches stay pending and emit
nothing — the oracle applies the same cutoff.

State per correlation key (user_id): pending (req_id, req_ts) pairs +
responses not yet safely discardable. Responses with ts < watermark -
timeout can serve no undecided or future request (late input is dropped at
the watermark), so they are pruned every invocation — state is bounded by
traffic within one timeout+delay horizon, never by stream length. That
prune IS the 100 TB story: key cardinality × horizon, independent of
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..registry import register
from .source import read_events_stream, run_to_memory

TIMEOUT_MIN = 10
DELAY = "30 minutes"

_STATE_SCHEMA = StructType(
    [
        StructField("req_ids", ArrayType(LongType())),
        StructField("req_ts", ArrayType(LongType())),  # epoch micros
        StructField("resp_ids", ArrayType(LongType())),
        StructField("resp_ts", ArrayType(LongType())),
    ]
)
_OUT_SCHEMA = StructType(
    [
        StructField("req_id", LongType()),
        StructField("resp_id", LongType()),
        StructField("code", IntegerType()),
    ]
)


def _make_rpc_state_fn():
    """Build the per-group state function. Returned as a NESTED function so
    cloudpickle serializes it by value — executor workers don't have the
    repo on sys.path (driver contract), and a module-level function would
    pickle by reference and ModuleNotFoundError on the workers."""

    def _rpc_state_fn(key, pdfs, state: GroupState):
        import pandas as pd

        TIMEOUT_US = 10 * 60 * 1_000_000
        if state.exists:
            req_ids, req_ts, resp_ids, resp_ts = state.get
            req_ids, req_ts = list(req_ids), list(req_ts)
            resp_ids, resp_ts = list(resp_ids), list(resp_ts)
        else:
            req_ids, req_ts, resp_ids, resp_ts = [], [], [], []

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_us = pdf["ts"].astype("int64") // 1000  # datetime64[ns] -> epoch us
            for eid, t_us, etype in zip(pdf["event_id"], ts_us, pdf["event_type"]):
                if etype == "click":
                    req_ids.append(int(eid))
                    req_ts.append(int(t_us))
                else:
                    resp_ids.append(int(eid))
                    resp_ts.append(int(t_us))

        wm_us = state.getCurrentWatermarkMs() * 1000
        out_req, out_resp, out_code = [], [], []
        still_ids, still_ts = [], []
        for rid, rts in zip(req_ids, req_ts):
            deadline = rts + TIMEOUT_US
            if deadline <= wm_us:
                # Decidable: every response with ts <= deadline has arrived.
                best = None
                for pid, pts in zip(resp_ids, resp_ts):
                    if rts <= pts <= deadline and (
                        best is None or (pts, pid) < best
                    ):
                        best = (pts, pid)
                out_req.append(rid)
                out_resp.append(None if best is None else best[1])
                out_code.append(408 if best is None else 200)
            else:
                still_ids.append(rid)
                still_ts.append(rts)

        # Prune responses that can no longer matter: any undecided or future
        # request has req_ts >= wm - ... a response serves requests with
        # req_ts <= resp_ts, so keep responses with resp_ts >= wm - timeout.
        keep = [
            (pid, pts)
            for pid, pts in zip(resp_ids, resp_ts)
            if pts + TIMEOUT_US >= wm_us
        ]
        resp_ids = [p for p, _ in keep]
        resp_ts = [t for _, t in keep]

        if still_ids or resp_ids:
            state.update((still_ids, still_ts, resp_ids, resp_ts))
            if still_ids:
                state.setTimeoutTimestamp(min(t + TIMEOUT_US for t in still_ts) // 1000)
        else:
            state.remove()

        if out_req:
            yield pd.DataFrame(
                {"req_id": out_req, "resp_id": out_resp, "code": out_code}
            ).astype({"req_id": "int64", "resp_id": "float64", "code": "int32"})

    return _rpc_state_fn


@register(
    "stream_rpc_state",
    oracle=f"""
    WITH req AS (
      SELECT event_id AS req_id, user_id, CAST(ts AS TIMESTAMP) AS req_ts
      FROM events WHERE event_type = 'click'),
    resp AS (
      SELECT event_id AS resp_id, user_id, CAST(ts AS TIMESTAMP) AS resp_ts
      FROM events WHERE event_type IN ('purchase', 'signup')),
    wmx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE AS w FROM events),
    matched AS (
      SELECT r.req_id, p.resp_id,
             ROW_NUMBER() OVER (PARTITION BY r.req_id
                                ORDER BY p.resp_ts, p.resp_id) AS rn
      FROM req r JOIN resp p
        ON p.user_id = r.user_id
       AND p.resp_ts >= r.req_ts
       AND p.resp_ts <= r.req_ts + INTERVAL {TIMEOUT_MIN} MINUTE)
    SELECT q.req_id, m.resp_id,
           CAST(CASE WHEN m.resp_id IS NULL THEN 408 ELSE 200 END AS INT) AS code
    FROM req q LEFT JOIN (SELECT req_id, resp_id FROM matched WHERE rn = 1) m
      USING (req_id)
    WHERE q.req_ts + INTERVAL {TIMEOUT_MIN} MINUTE <= (SELECT w FROM wmx)
    """,
)
def stream_rpc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``rpc_first_response`` (operators/cdc.py): 'click'
    events are requests, 'purchase'/'signup' the unioned response subjects,
    user_id the correlation key, 10-minute timeout under a 30-minute
    watermark. Decisions (200 with the first response, or 408) emit exactly
    once, when the watermark crosses each request's deadline; requests the
    final watermark never reaches are still pending and emit nothing, which
    the oracle's WHERE clause mirrors."""
    src = read_events_stream(spark, sf_dir)
    flow = src.filter(
        F.col("event_type").isin("click", "purchase", "signup")
    ).select("event_id", "ts", "user_id", "event_type")
    decided = (
        flow.withWatermark("ts", DELAY)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_rpc_state_fn(),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return run_to_memory(decided, "append").select(
        "req_id", F.col("resp_id").cast("long").alias("resp_id"), "code"
    )
