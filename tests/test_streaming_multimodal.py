"""Streaming hourly rollup (availableNow vs batch) and multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from locus_spark.operators.multimodal import (
    extract_media_features,
    fake_decode_image,
    frame_sample_plan,
    real_decode_image,
)
from locus_spark.streaming import hourly_event_stream

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch_counts(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(src)
    stream_df = hourly_event_stream(spark, src)
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    got = {
        (r.hour, r.event_type): r.n
        for r in spark.table("hourly_test").collect()
    }
    want = {
        (r.hour, r.event_type): r.n
        for r in spark.read.parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


@pytest.fixture()
def media(spark):
    rows = [
        (i, "image" if i % 2 == 0 else "video", bytes([i % 256] * (50 + i)), 64, 64, 3500)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )


def test_media_features_schema_and_determinism(spark, media):
    out = extract_media_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,features:array<float>>"
    )
    rows = {r.media_id: r.features for r in out.collect()}
    assert len(rows) == 20 and all(len(v) == 8 for v in rows.values())
    expect = fake_decode_image(bytes([0] * 50))
    assert np.allclose(rows[0], expect, rtol=1e-6)


def test_media_feature_stats_flat_schema(spark, media):
    from locus_spark.operators.multimodal import (
        extract_media_feature_stats,
        fake_decode_stats,
    )

    out = extract_media_feature_stats(media)
    assert out.columns == ["media_id", "kind"] + [f"f{i}" for i in range(8)]
    assert all(f.dataType.simpleString() == "double" for f in out.schema.fields[2:])
    rows = {r.media_id: [r[f"f{i}"] for i in range(8)] for r in out.collect()}
    assert len(rows) == 20
    # bit-exact against the local kernel (the oracle-parity contract)
    expect = fake_decode_stats(bytes([3 % 256] * 53))
    assert rows[3] == expect.tolist()


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode_image(b"\xff\xd8")


def test_sessionize_stateful_stream(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): sessions closed by
    an inactivity gap inside the batch are emitted; the open tail session
    stays in state."""
    import datetime as dt

    from locus_spark.streaming.sessionize import sessionize_stream

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user 1: 3 events tight, then a 2h gap -> closed session of 3
        (1, t0), (1, t0 + dt.timedelta(minutes=5)), (1, t0 + dt.timedelta(minutes=10)),
        (1, t0 + dt.timedelta(hours=2, minutes=10)),
        # user 2: 1 event, 1h gap, 2 events -> closed session of 1
        (2, t0), (2, t0 + dt.timedelta(hours=1)),
        (2, t0 + dt.timedelta(hours=1, minutes=1)),
    ]
    src = str(tmp_path / "sess_events")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize_stream(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # NOTE: availableNow does NOT terminate this query — ProcessingTimeTimeout
    # keeps it alive waiting to fire the idle-session timeout (gap_s = 30 min),
    # so awaitTermination would block.  Poll the sink for the two in-batch
    # closed sessions, then stop the query explicitly.
    import time

    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.table("sessions_test").count() >= 2:
                break
            time.sleep(1)
        got = {
            (r.user_id, r.n_events): (r.session_start, r.session_end)
            for r in spark.table("sessions_test").collect()
        }
    finally:
        q.stop()
    assert (1, 3) in got and got[(1, 3)] == (t0, t0 + dt.timedelta(minutes=10))
    assert (2, 1) in got and got[(2, 1)] == (t0, t0)


def _write_stream_file(spark, rows, schema, stage_dir, dst, mtime):
    """One parquet part file with a controlled mtime — the file source
    orders micro-batches by modification time, so this pins replay order."""
    import glob
    import os
    import shutil

    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(stage_dir)
    )
    part = glob.glob(str(stage_dir) + "/part-*.parquet")[0]
    shutil.copy(part, str(dst))
    os.utime(str(dst), (mtime, mtime))


def test_windowed_stream_drops_too_late_events(spark, tmp_path):
    """Out-of-order replay of the watermarked hourly rollup: with one file
    per micro-batch, an event arriving late but inside the 2h watermark
    updates its window, while an event older than the watermark is dropped
    — the late-data semantics the docstring declares, exercised end-to-end."""
    import datetime as dt
    import time

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t = lambda h, m=0: dt.datetime(2026, 1, 2, h, m)  # noqa: E731
    src = tmp_path / "late_events"
    src.mkdir()
    now = time.time()
    # batch 1: on-time events at 10:00/10:30 -> watermark becomes 08:30
    _write_stream_file(
        spark,
        [(1, t(10, 0), 1, "click", 1.0, ""), (2, t(10, 30), 2, "click", 1.0, "")],
        schema,
        tmp_path / "stage1",
        src / "b1.parquet",
        now - 100,
    )
    # batch 2: 09:00 is late but newer than the 08:30 watermark (kept)
    _write_stream_file(
        spark,
        [(3, t(9, 0), 3, "click", 1.0, "")],
        schema,
        tmp_path / "stage2",
        src / "b2.parquet",
        now - 70,
    )
    # batch 3: 05:00 is older than the watermark (dropped).  NOTE the
    # watermark becomes effective one batch AFTER the commit that advanced
    # it (measured here: a too-late row in batch 2 still passes with
    # numRowsDroppedByWatermark=0), hence the separate third file.
    _write_stream_file(
        spark,
        [(4, t(5, 0), 4, "click", 1.0, "")],
        schema,
        tmp_path / "stage3",
        src / "b3.parquet",
        now - 40,
    )

    out = hourly_event_stream(
        spark, str(src), watermark="2 hours", max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_window_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    rows = spark.table("late_window_test").collect()
    by_hour = {}
    for r in rows:  # update mode: last emitted row per window wins
        by_hour[r.hour] = r.n
    assert by_hour.get(t(10)) == 2  # on-time window complete
    assert by_hour.get(t(9)) == 1  # late-but-inside-watermark event kept
    assert t(5) not in by_hour  # older than watermark: dropped
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # the state operator counted exactly the 05:00 row


def test_sessionize_stream_out_of_order_replay(spark, tmp_path):
    """Out-of-order replay of the stateful sessionizer, pinning the
    documented ordered-arrival caveat (streaming/sessionize.py): an event
    arriving after its session was already emitted folds into the OPEN
    session instead (last never moves backwards), so the stream diverges
    from the batch form, which sees full history."""
    import datetime as dt
    import time as _time

    from locus_spark.streaming.sessionize import sessionize_batch, sessionize_stream

    schema = "user_id long, ts timestamp"
    t0 = dt.datetime(2026, 1, 3, 0, 0, 0)
    m = lambda minutes: t0 + dt.timedelta(minutes=minutes)  # noqa: E731
    src = tmp_path / "sess_replay"
    src.mkdir()
    now = _time.time()
    # batch 1 opens session A (2 events); batch 2's 3h event closes A;
    # batch 3 replays a LATE event (minute 7) that belonged in A but folds
    # into the open 3h session, then a 6h event closes that one.
    _write_stream_file(
        spark, [(1, m(0)), (1, m(10))], schema, tmp_path / "s1", src / "b1.parquet",
        now - 100,
    )
    _write_stream_file(
        spark, [(1, m(180))], schema, tmp_path / "s2", src / "b2.parquet", now - 70,
    )
    _write_stream_file(
        spark, [(1, m(7)), (1, m(360))], schema, tmp_path / "s3", src / "b3.parquet",
        now - 40,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = sessionize_stream(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_replay_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps the query alive for idle-session timeouts;
    # poll for the two closed sessions, then stop (same harness as above).
    try:
        deadline = _time.monotonic() + 120
        while _time.monotonic() < deadline:
            if spark.table("sess_replay_test").count() >= 2:
                break
            _time.sleep(1)
        got = {
            r.session_start: (r.session_end, r.n_events)
            for r in spark.table("sess_replay_test").collect()
        }
    finally:
        q.stop()
    # session A closed WITHOUT the late minute-7 event (already emitted)
    assert got[m(0)] == (m(10), 2)
    # the late event folded into the open 3h session: n=2, end NOT moved back
    assert got[m(180)] == (m(180), 2)
    # the batch form sees full history and puts minute 7 into session A
    batch = {
        r.session_start: (r.session_end, r.n_events)
        for r in sessionize_batch(
            spark.createDataFrame(
                [(1, 10, m(0)), (1, 11, m(10)), (1, 12, m(180)), (1, 13, m(7)),
                 (1, 14, m(360))],
                "user_id long, event_id long, ts timestamp",
            ),
            gap_s=1800,
        ).collect()
    }
    assert batch[m(0)] == (m(10), 3)  # documented divergence under disorder


def test_frame_sample_plan(spark, media):
    out = frame_sample_plan(media, every_ms=1000)
    counts = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in counts)  # 0,1000,2000,3000 for 3500ms


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    """Multi-batch redelivery replay of the watermark-bounded ingest dedup:
    an exact copy of an already-seen key arriving in a LATER micro-batch
    (inside the watermark) is dropped; a fresh key in the same batch passes;
    and the result equals the batch form over the concatenated input."""
    import datetime as dt
    import time

    from locus_spark.streaming.dedup import (
        dedup_events_batch,
        dedup_events_stream,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t = lambda h, m=0: dt.datetime(2026, 1, 2, h, m)  # noqa: E731
    src = tmp_path / "replayed_events"
    src.mkdir()
    now = time.time()
    b1 = [
        (1, t(10, 0), 1, "click", 1.0, ""),
        (2, t(10, 30), 2, "view", 2.0, ""),
    ]
    # batch 2: event 1 redelivered (exact copy, inside the 2h watermark)
    # alongside a fresh event 3
    b2 = [
        (1, t(10, 0), 1, "click", 1.0, ""),
        (3, t(10, 45), 3, "click", 3.0, ""),
    ]
    _write_stream_file(spark, b1, schema, tmp_path / "s1", src / "b1.parquet", now - 100)
    _write_stream_file(spark, b2, schema, tmp_path / "s2", src / "b2.parquet", now - 50)

    out = dedup_events_stream(
        spark, str(src), watermark="2 hours", max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    got = {r.event_id for r in spark.table("dedup_stream_test").collect()}
    assert got == {1, 2, 3}  # the redelivered copy of 1 appears exactly once
    assert spark.table("dedup_stream_test").count() == 3

    batch = dedup_events_batch(spark.createDataFrame(b1 + b2, schema))
    assert {r.event_id for r in batch.collect()} == got


def test_trending_stream_matches_batch_topn(spark, tmp_path):
    """Replay the events table through the watermarked (window, k) count
    stream, then apply the batch top-3 selection over the sink — the
    rank-at-read split must equal the all-batch trending query."""
    from locus_spark.operators.selection import top_n_per_group
    from locus_spark.streaming import trending_props_stream

    src = str(tmp_path / "events")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(src)
    stream_df = trending_props_stream(spark, src)
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("trending_counts_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    # cut the MemorySink lineage: the two-pass selection self-joins its
    # input, and two scans of the same in-memory sink plan share attribute
    # ids (Conflicting attributes analysis error) without this
    sink = spark.table("trending_counts_test").localCheckpoint(eager=True)
    got = {
        (r.ws, r.k): r.cnt
        for r in top_n_per_group(
            sink, group_col="ws", order_col="cnt", n=3, id_col="k",
            lo=0.0, hi=100000.0,
        ).collect()
    }

    batch_counts = (
        spark.read.parquet(src)
        .select(
            F.window("ts", "1 hour").start.alias("ws"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("ws", "k")
        .agg(F.count("*").alias("cnt"))
    )
    want = {
        (r.ws, r.k): r.cnt
        for r in top_n_per_group(
            batch_counts, group_col="ws", order_col="cnt", n=3, id_col="k",
            lo=0.0, hi=100000.0,
        ).collect()
    }
    assert got == want and got
