"""Funnel + cohort retention (queries.py events family): ordered-step
semantics and the distinct-per-offset contract on hand fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from locus_spark import queries as q


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, (ts, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_funnel_steps_strictly_ordered(spark, tmp_path, monkeypatch):
    T = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: full ordered funnel
        (T, 1, "view"), (T + s, 1, "click"), (T + 2 * s, 1, "purchase"),
        # user 2: click BEFORE first view -> stops at view
        (T, 2, "click"), (T + s, 2, "view"),
        # user 3: purchase before click -> stops at click
        (T, 3, "view"), (T + s, 3, "purchase"), (T + 2 * s, 3, "click"),
        # user 4: view only
        (T, 4, "view"),
        # user 5: simultaneous view+click (strict > drops the click)
        (T, 5, "view"), (T, 5, "click"),
    ]
    ev = _ev(spark, rows)
    monkeypatch.setattr(
        q.derived, "register_base_tables",
        lambda spark_, sf: ev.createOrReplaceTempView("events"),
    )
    got = {r["event_type"]: r["n_users"] for r in q.q_events_funnel(spark, "x").collect()}
    assert got == {"view": 5, "click": 2, "purchase": 1}


def test_retention_counts_distinct_users_per_offset(spark, monkeypatch):
    T = dt.datetime(2024, 3, 10)
    d = dt.timedelta(days=1)
    rows = [
        (T, 1, "view"), (T + d, 1, "view"), (T + d, 1, "click"),  # 2 events day1
        (T, 2, "view"),
        (T + d, 3, "view"), (T + 3 * d, 3, "view"),
    ]
    ev = _ev(spark, rows)
    monkeypatch.setattr(
        q.derived, "register_base_tables",
        lambda spark_, sf: ev.createOrReplaceTempView("events"),
    )
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in q.q_events_retention(spark, "x").collect()
    }
    assert got == {
        ("2024-03-10", 0): 2,   # users 1,2 — day-1 double activity counted once
        ("2024-03-10", 1): 1,   # user 1
        ("2024-03-11", 0): 1,   # user 3's own cohort
        ("2024-03-11", 2): 1,
    }


def test_anomaly_zscore_matches_numpy(spark, monkeypatch):
    import numpy as np

    T = dt.datetime(2024, 5, 1)
    h = dt.timedelta(hours=1)
    rows = []
    # 10 quiet hours (1 error / 10 events), one storm hour (8/10)
    for k in range(10):
        for j in range(10):
            rows.append((T + k * h, j, "error" if j == 0 else "view"))
    for j in range(10):
        rows.append((T + 10 * h, j, "error" if j < 8 else "view"))
    ev = _ev(spark, rows)
    monkeypatch.setattr(
        q.derived, "register_base_tables",
        lambda spark_, sf: ev.createOrReplaceTempView("events"),
    )
    got = {r["hour"]: r for r in q.q_events_anomaly(spark, "x").collect()}
    rates = np.array([0.1] * 10 + [0.8])
    mu, sd = rates.mean(), rates.std()
    assert len(got) == 11
    storm = got["2024-05-01 10:00"]
    assert (storm["n_total"], storm["n_err"], storm["rate"]) == (10, 8, 0.8)
    assert storm["z"] == round((0.8 - mu) / sd, 6)
    assert storm["is_anomaly"] is True
    quiet = got["2024-05-01 00:00"]
    assert quiet["is_anomaly"] is False
    assert quiet["z"] == round((0.1 - mu) / sd, 6)
