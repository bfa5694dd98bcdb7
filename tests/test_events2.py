"""Semantic invariants for the event-analytics tier (events2): exact
oracle equality is covered by test_oracle.py; these assert the properties
that make the answers *meaningful*, not just engine-agreeing."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _rows(spark, name):
    import __spark_entry__ as E

    return E.queries()[name](spark, SF_DIR).collect()


def test_funnel_monotone(spark):
    counts = {r["step"]: r["users"] for r in _rows(spark, "q_funnel")}
    assert set(counts) == {"1_view", "2_click", "3_purchase"}
    assert counts["1_view"] >= counts["2_click"] >= counts["3_purchase"]
    assert counts["1_view"] > 0


def test_retention_week0_covers_every_user(spark):
    rows = _rows(spark, "q_retention")
    assert all(r["week_offset"] >= 0 for r in rows)
    week0 = sum(r["users"] for r in rows if r["week_offset"] == 0)
    import duckdb

    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    # every user is active in their own cohort week by construction
    assert week0 == n_users
    # retention never exceeds the cohort's week-0 size
    base = {
        r["cohort_week"]: r["users"] for r in rows if r["week_offset"] == 0
    }
    for r in rows:
        assert r["users"] <= base[r["cohort_week"]]


def test_attribution_totals_match_purchases(spark):
    rows = _rows(spark, "q_attribution")
    import duckdb

    n_purchases = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert sum(r["purchases"] for r in rows) == n_purchases
    # a purchase that IS the user's first event has no prior touch
    for r in rows:
        if r["last_touch"] == "direct":
            assert r["first_touch"] == "purchase"


def test_interpolate_between_neighbors(spark):
    rows = sorted(_rows(spark, "q_interpolate"), key=lambda r: r["hour_ts"])
    # spine is contiguous hourly
    for a, b in zip(rows, rows[1:]):
        assert b["hour_ts"] - a["hour_ts"] == 3600
    # every interpolated value lies within the span of observed values
    obs = [r["v_interp"] for r in rows if r["observed"]]
    lo, hi = min(obs), max(obs)
    for r in rows:
        if not r["observed"]:
            assert lo - 1e-9 <= r["v_interp"] <= hi + 1e-9


def test_scd2_intervals_contiguous(spark):
    rows = _rows(spark, "q_scd2")
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in user_rows] == list(
            range(1, len(user_rows) + 1)
        )
        for a, b in zip(user_rows, user_rows[1:]):
            assert a["valid_to"] == b["valid_from"]  # half-open, contiguous
            assert a["state"] != b["state"]  # runs are maximal
            assert not a["is_current"]
        assert user_rows[-1]["is_current"]
        assert user_rows[-1]["valid_to"] is None


def test_event_pattern_matches_brute_force(spark):
    """q_event_pattern counts non-overlapping `view (click)* purchase`
    runs per user. Re-derive each user's symbol string with DuckDB and
    count with Python's regex engine — the counts must agree exactly."""
    import re

    import duckdb

    rows = {r["user_id"]: r["n_patterns"] for r in _rows(spark, "q_event_pattern")}
    seqs = duckdb.sql(
        "SELECT user_id, string_agg(left(event_type, 1), '' ORDER BY ts, event_id)"
        f" FROM '{SF_DIR}/events.parquet' GROUP BY user_id"
    ).fetchall()
    expected = {
        uid: len(re.findall("vc*p", s)) for uid, s in seqs if re.search("vc*p", s)
    }
    assert rows == expected
    assert len(expected) > 0
