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


def test_frame_sample_plan(spark, media):
    out = frame_sample_plan(media, every_ms=1000)
    counts = out.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in counts)  # 0,1000,2000,3000 for 3500ms
