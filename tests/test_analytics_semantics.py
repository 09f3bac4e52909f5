"""Semantic unit tests for the event-analytics ops (operators/analytics.py)
against an independent pure-Python reference on synthetic, adversarial
events — boundary gaps, same-instant ties, out-of-stage orderings — cases
the uniform driver fixture never produces.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from node_cdc_nats_spark import registry

registry.load_all()

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP_US = 30 * 60 * 1_000_000


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _sessions_reference(rows):
    """Independent sessionization: (user, session) -> (start, end, n, total)."""
    by_user: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(r[2], []).append(r)
    out = {}
    for uid, evs in by_user.items():
        sid = 0
        prev_us = None
        for e in evs:
            us = int((e[1] - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
            if prev_us is not None and us - prev_us > GAP_US:
                sid += 1
            prev_us = us
            key = (uid, sid + 1)  # running SUM starts each user at 1
            s = out.setdefault(key, [e[1], e[1], 0, 0.0])
            s[0] = min(s[0], e[1])
            s[1] = max(s[1], e[1])
            s[2] += 1
            s[3] += e[4]
    return out


def test_sessionize_boundary_gap_and_ties(spark, tmp_path):
    # user 1: gap of EXACTLY 30 min (same session), then 30 min + 1 µs
    # (new session); user 2: two events at the same instant (one session,
    # event_id tiebreak); user 3: a single event.
    rows = [
        (1, T0, 1, "view", 1.0),
        (2, T0 + dt.timedelta(minutes=30), 1, "view", 2.0),  # == gap: same
        (3, T0 + dt.timedelta(minutes=60, microseconds=1), 1, "view", 3.0),  # > gap: new
        (4, T0, 2, "click", 5.0),
        (5, T0, 2, "view", 6.0),
        (6, T0 + dt.timedelta(days=2), 3, "purchase", 7.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        (r.user_id, r.session_id): (
            r.session_start, r.session_end, r.n_events, r.total_value
        )
        for r in registry.QUERIES["sessionize_events"](spark, sf).collect()
    }
    want = {k: tuple(v) for k, v in _sessions_reference(rows).items()}
    assert got == want
    assert len(want) == 4  # u1 splits into 2; u2 and u3 one each


def test_funnel_requires_stage_order(spark, tmp_path):
    # u1 completes in order; u2 clicks BEFORE signing up (click must not
    # count, so its later purchase must not either); u3 has a click at the
    # SAME instant as signup with a larger event_id (counts: the running
    # min includes the earlier-ordered signup row); u4 purchases before
    # its (qualifying) click (purchase must not count).
    m = dt.timedelta(minutes=1)
    rows = [
        (1, T0, 1, "signup", 0.0), (2, T0 + m, 1, "click", 0.0),
        (3, T0 + 2 * m, 1, "purchase", 0.0),
        (4, T0, 2, "click", 0.0), (5, T0 + m, 2, "signup", 0.0),
        (6, T0 + 2 * m, 2, "purchase", 0.0),
        (7, T0, 3, "signup", 0.0), (8, T0, 3, "click", 0.0),
        (9, T0, 4, "signup", 0.0), (10, T0 + m, 4, "purchase", 0.0),
        (11, T0 + 2 * m, 4, "click", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    row = registry.QUERIES["funnel_conversion"](spark, sf).collect()[0]
    # signups: u1,u2,u3,u4 all have a signup event
    assert row.n_signup == 4
    # clicks after signup: u1, u3 (same-instant, later event_id), u4
    assert row.n_click_after_signup == 3
    # purchases after a qualifying click: u1 only
    assert row.n_purchase_after_click == 1


def test_retention_weeks_are_monday_anchored(spark, tmp_path):
    # 2024-01-01 is a Monday. u1's first event lands mid-week Wednesday;
    # activity the NEXT Tuesday is offset 1 (calendar week, not 7-day
    # delta from first event, which would put +6 days at offset 0).
    wed = T0 + dt.timedelta(days=2)
    next_tue = T0 + dt.timedelta(days=8)
    rows = [
        (1, wed, 1, "view", 0.0),
        (2, next_tue, 1, "view", 0.0),  # 6 days later, but next ISO week
        (3, T0, 2, "view", 0.0),
        (4, T0 + dt.timedelta(days=21), 2, "view", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in registry.QUERIES["retention_cohorts"](spark, sf).collect()
    }
    jan1 = dt.date(2024, 1, 1)
    assert got == {
        (jan1, 0): 2,  # both users active in their cohort week
        (jan1, 1): 1,  # u1 the following calendar week
        (jan1, 3): 1,  # u2 three weeks on
    }


def test_analytics_oracle_parity_on_tie_heavy_corpus(spark, tmp_path):
    """Cross-engine determinism under timestamp TIES: the driver fixture's
    microsecond-random ts never collides, so its oracle parity cannot
    exercise the (ts, event_id) tiebreak both engines must share. Build a
    corpus where most per-user instants collide and run the REGISTERED
    DuckDB oracles against the Spark ops on it."""
    import os
    import random

    rng = random.Random(20260814)
    rows = []
    eid = 0
    # 40 users x 120 events drawn from only 12 distinct instants each:
    # ~10 events share every instant, so every window frame boundary is
    # exercised, and types land on tied instants in every order.
    for uid in range(40):
        instants = sorted(
            T0 + dt.timedelta(minutes=rng.randrange(0, 50_000)) for _ in range(12)
        )
        for _ in range(120):
            ts = instants[rng.randrange(12)]
            et = rng.choice(["view", "click", "signup", "purchase", "error"])
            rows.append((eid, ts, uid, et, round(rng.uniform(0, 20), 2)))
            eid += 1
    sf = _write_events(tmp_path, rows)
    # compare()'s DuckDB side creates views over every fixture table, so
    # link the untouched ones in from the smallest driver fixture.
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings".split()
    ):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", tmp_path / f"{t}.parquet")

    from node_cdc_nats_spark import registry

    from .oracle_diff import compare

    for name in ("sessionize_events", "funnel_conversion", "retention_cohorts"):
        problems = compare(
            spark, name, registry.QUERIES[name], registry.ORACLES[name], sf
        )
        assert not problems, "\n".join(problems[:5])


def test_transition_matrix_counts_and_probs(spark, tmp_path):
    """Hand-built two-user sequence with a same-instant tie: transitions
    follow the (ts, event_id) order, user boundaries produce no pair, and
    p_next row-normalizes per prev_type."""
    rows = [
        # user 1: a -> b -> b (the b@t2/b@t2 tie ordered by event_id)
        (1, T0, 1, "a", 0.0),
        (2, T0 + dt.timedelta(seconds=1), 1, "b", 0.0),
        (3, T0 + dt.timedelta(seconds=2), 1, "b", 0.0),
        # user 2: a -> c
        (4, T0, 2, "a", 0.0),
        (5, T0 + dt.timedelta(seconds=5), 2, "c", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p_next"])
        for r in registry.QUERIES["events_transition_matrix"](spark, d).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "b"): (1, 1.0),
    }


def test_rolling_active_users_window_edges(spark, tmp_path):
    """Trailing-7-day actives: a user active on day 0 counts for grid
    days 0..6 only (inclusive both ends), and a user's multiple events
    in-window count once."""
    def ev(i, day, uid):
        return (i, T0 + dt.timedelta(days=day), uid, "click", 0.0)

    # user 1 on days 0 (twice) and 7; user 2 on day 7 only.
    d = _write_events(
        tmp_path, [ev(1, 0, 1), ev(2, 0, 1), ev(3, 7, 1), ev(4, 7, 2)]
    )
    got = {
        r["day"].isoformat(): r["active_7d"]
        for r in registry.QUERIES["rolling_active_users"](spark, d).collect()
    }
    # grid = {day0, day7}; day0 window [d-6, d0] sees only user 1's day-0
    # events (once); day7 window [day1, day7] sees both users' day-7
    # events but NOT user 1's day-0 activity (6-day trailing bound).
    assert got == {"2024-01-01": 1, "2024-01-08": 2}


def test_user_concentration_lorenz_shares(spark, tmp_path):
    """Hand-built skew: user 1 fires 3 events, users 2 and 3 one each.
    Census rows descend by activity; cumulative shares are exact
    integer ratios (top user = 1/3 of users, 3/5 of events)."""
    def ev(i, uid):
        return (i, T0 + dt.timedelta(seconds=i), uid, "click", 0.0)

    d = _write_events(tmp_path, [ev(1, 1), ev(2, 1), ev(3, 1), ev(4, 2), ev(5, 3)])
    rows = [
        (r["events_per_user"], r["n_users"], r["n_events"],
         r["cum_users_share"], r["cum_events_share"])
        for r in registry.QUERIES["events_user_concentration"](spark, d).collect()
    ]
    assert rows == [
        (3, 1, 3, 1.0 / 3.0, 3.0 / 5.0),
        (1, 2, 2, 1.0, 1.0),
    ]


def test_weekly_stickiness_ratio(spark, tmp_path):
    """Hand-built week (2024-01-01 is a Monday): user 1 active all 7
    days (two events on Monday — dedups to one active day), user 2
    active Monday only. WAU = 2, active user-days = 8 over 7 observed
    days, stickiness = (8/7)/2 = 4/7."""
    def ev(i, day, uid):
        return (i, T0 + dt.timedelta(days=day, seconds=i), uid, "click", 0.0)

    rows = [ev(i, i, 1) for i in range(7)] + [ev(7, 0, 1), ev(8, 0, 2)]
    d = _write_events(tmp_path, rows)
    got = [
        (r["week"].isoformat(), r["wau"], r["active_user_days"],
         r["n_days"], r["stickiness"])
        for r in registry.QUERIES["events_weekly_stickiness"](spark, d).collect()
    ]
    assert got == [("2024-01-01", 2, 8, 7, (8.0 / 7.0) / 2.0)]


def test_asof_nearest_direction_and_ties(spark, tmp_path):
    """Hand-built timeline, user 1: purchases at t=100s and t=200s,
    clicks at t=90 (forward only→200? no: 100 is nearer), t=150
    (EQUAL 50s gaps → backward tie rule → 100s purchase), t=160
    (nearer forward → 200s), t=100 (coincident → backward at distance
    zero). User 2 has a click and no purchases → null match."""
    def ev(i, sec, uid, typ):
        return (i, T0 + dt.timedelta(seconds=sec), uid, typ, 0.0)

    rows = [
        ev(1, 100, 1, "purchase"), ev(2, 200, 1, "purchase"),
        ev(3, 90, 1, "click"), ev(4, 150, 1, "click"),
        ev(5, 160, 1, "click"), ev(6, 100, 1, "click"),
        ev(7, 50, 2, "click"),
    ]
    d = _write_events(tmp_path, rows)
    got = {
        r["event_id"]: (r["nearest_purchase_id"], r["direction"])
        for r in registry.QUERIES["join_asof_nearest"](spark, d).collect()
    }
    assert got == {
        3: (1, "forward"),    # only forward candidates exist before t=100
        4: (1, "backward"),   # 50s vs 50s tie -> earlier (backward) wins
        5: (2, "forward"),    # 60s back vs 40s forward
        6: (1, "backward"),   # coincident purchase counts as backward
        7: (None, None),      # no purchases for user 2
    }


def test_cdc_column_diff_transitions(spark, tmp_path):
    """Hand-built version chain for one key: insert, an update changing
    only value, an update changing type+props but not value, and an
    exact-repeat update changing nothing (n_changed = 0)."""
    rows = [
        (1, T0, 9, "signup", 1.0),
        (2, T0 + dt.timedelta(seconds=1), 9, "signup", 2.5),
        (3, T0 + dt.timedelta(seconds=2), 9, "click", 2.5),
        (4, T0 + dt.timedelta(seconds=3), 9, "click", 2.5),
    ]
    d = _write_events(tmp_path, rows)
    got = {
        r["event_id"]: (r["op"], r["changed_cols"], r["n_changed"], r["value_delta"])
        for r in registry.QUERIES["cdc_column_diff"](spark, d).collect()
    }
    # props is the constant "{}" in the fixture writer, so only
    # event_type/value transitions appear.
    assert got == {
        1: ("I", None, 0, None),
        2: ("U", "value", 1, 1.5),
        3: ("U", "event_type", 1, 0.0),
        4: ("U", "", 0, 0.0),
    }
