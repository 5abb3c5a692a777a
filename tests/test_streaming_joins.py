"""Stream-stream attribution join: multi-batch replay pinning (a) batch
equivalence for in-watermark data, including a late-but-inside-watermark
click arriving a micro-batch after its view, and (b) the drop of a click
older than the advanced watermark — the state-expiry semantics that keep
join state bounded by watermark + gap instead of stream history."""

from __future__ import annotations

import datetime as dt
import time

from locus_spark.streaming.joins import (
    attribute_clicks_batch,
    attribute_clicks_stream,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_stream_file(spark, rows, stage_dir, dst, mtime):
    import glob
    import os
    import shutil

    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(stage_dir)
    )
    part = glob.glob(str(stage_dir) + "/part-*.parquet")[0]
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(part, str(dst))
    os.utime(str(dst), (mtime, mtime))


def test_stream_stream_join_replay_and_late_drop(spark, tmp_path):
    t = lambda h, m=0: dt.datetime(2026, 1, 2, h, m)  # noqa: E731
    views_dir, clicks_dir = tmp_path / "views", tmp_path / "clicks"
    now = time.time()

    # views batch 1: V100 (user 1, 10:00), V200 (user 2, 10:05)
    _write_stream_file(
        spark,
        [(100, t(10, 0), 1, "view", 0.0, ""), (200, t(10, 5), 2, "view", 0.0, "")],
        tmp_path / "sv1", views_dir / "b1.parquet", now - 100,
    )
    # clicks batch 1: C101 joins V100 (same user, +10 min)
    _write_stream_file(
        spark,
        [(101, t(10, 10), 1, "click", 1.0, "")],
        tmp_path / "sc1", clicks_dir / "b1.parquet", now - 100,
    )
    # batch 2: C201 arrives a micro-batch late but inside the watermark —
    # must still join V200 (cross-batch state).  The 13:00 rows on both
    # sides advance the event-time watermark to ~12:00 without joining
    # (different users).
    _write_stream_file(
        spark,
        [(700, t(13, 0), 7, "view", 0.0, "")],
        tmp_path / "sv2", views_dir / "b2.parquet", now - 50,
    )
    _write_stream_file(
        spark,
        [(201, t(10, 6), 2, "click", 1.0, ""), (800, t(13, 0), 8, "click", 1.0, "")],
        tmp_path / "sc2", clicks_dir / "b2.parquet", now - 50,
    )
    # batch 3: a no-match click at 13:05 — one intervening micro-batch in
    # which the ~12:00 watermark evicts V100 from view state (Spark joins a
    # batch's input against EXISTING state before evicting, and the
    # watermark itself lags a batch, so eviction is only guaranteed to have
    # happened by the batch after the watermark advanced)
    _write_stream_file(
        spark,
        [(900, t(13, 5), 9, "click", 1.0, "")],
        tmp_path / "sc3", clicks_dir / "b3.parquet", now - 30,
    )
    # batch 4: C102 (user 1, 10:02) is older than the watermark and its view
    # state is gone — no attribution, even though the batch form would join
    # it to V100
    _write_stream_file(
        spark,
        [(102, t(10, 2), 1, "click", 1.0, "")],
        tmp_path / "sc4", clicks_dir / "b4.parquet", now - 10,
    )

    out = attribute_clicks_stream(
        spark, str(views_dir), str(clicks_dir),
        gap_s=1800, watermark="1 hour", max_files_per_trigger=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attribution_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish within 180s"
    got = {
        (r.view_id, r.click_id)
        for r in spark.table("attribution_stream_test").collect()
    }
    assert got == {(100, 101), (200, 201)}

    # batch form over the concatenated input also joins the late C102 —
    # the difference is exactly the watermark drop
    all_rows = [
        (100, t(10, 0), 1, "view", 0.0, ""),
        (200, t(10, 5), 2, "view", 0.0, ""),
        (700, t(13, 0), 7, "view", 0.0, ""),
        (101, t(10, 10), 1, "click", 1.0, ""),
        (201, t(10, 6), 2, "click", 1.0, ""),
        (800, t(13, 0), 8, "click", 1.0, ""),
        (900, t(13, 5), 9, "click", 1.0, ""),
        (102, t(10, 2), 1, "click", 1.0, ""),
    ]
    batch = attribute_clicks_batch(spark.createDataFrame(all_rows, SCHEMA), gap_s=1800)
    batch_pairs = {(r.view_id, r.click_id) for r in batch.collect()}
    assert batch_pairs == got | {(100, 102)}


def test_attribution_batch_bounds(spark):
    # inclusive bounds on both ends of the gap; self-pairs impossible
    # (a click is never a view); cross-user pairs never join
    t0 = dt.datetime(2026, 1, 2, 10, 0)
    rows = [
        (1, t0, 1, "view", 0.0, ""),
        (2, t0, 1, "click", 1.0, ""),                             # dt = 0: joins
        (3, t0 + dt.timedelta(seconds=1800), 1, "click", 1.0, ""),  # dt = gap: joins
        (4, t0 + dt.timedelta(seconds=1801), 1, "click", 1.0, ""),  # beyond: no
        (5, t0 - dt.timedelta(seconds=1), 1, "click", 1.0, ""),     # before: no
        (6, t0, 2, "click", 1.0, ""),                             # other user: no
    ]
    got = {
        (r.view_id, r.click_id)
        for r in attribute_clicks_batch(
            spark.createDataFrame(rows, SCHEMA), gap_s=1800
        ).collect()
    }
    assert got == {(1, 2), (1, 3)}
