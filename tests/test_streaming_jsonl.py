"""Streaming JSONL ingestion (streaming/jsonl_ingest.py): multi-file
replay with a planted corrupt line — clean rows match the batch reader,
corrupt lines land in the corrupt sink, and a re-run over the same
checkpoint ingests nothing twice."""

from __future__ import annotations

import json

from locus_spark.streaming.jsonl_ingest import run_ingest_available_now


def _doc(i, text="plain", lang="en"):
    return json.dumps(
        {"doc_id": i, "text": text, "lang": lang, "source": "web",
         "n_chars": len(text)}
    )


def test_streaming_jsonl_ingest_splits_and_is_exactly_once(spark, tmp_path):
    src = tmp_path / "arrivals"
    src.mkdir()
    # two arrival files, the second carrying a malformed line
    (src / "a.jsonl").write_text(
        "\n".join([_doc(1, 'new\nline "q"'), _doc(2)]) + "\n"
    )
    (src / "b.jsonl").write_text(
        "\n".join([_doc(3, lang="de"), '{"doc_id": 4, "text": broken']) + "\n"
    )

    clean, corrupt, ck = (
        str(tmp_path / "clean"), str(tmp_path / "corrupt"), str(tmp_path / "ck")
    )
    run_ingest_available_now(spark, str(src), clean, corrupt, ck)

    rows = {r["doc_id"]: r for r in spark.read.parquet(clean).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == 'new\nline "q"'  # escapes survive
    bad = spark.read.parquet(corrupt).collect()
    assert len(bad) == 1 and "broken" in bad[0][0]

    # replay over the same checkpoint: already-seen files are not re-ingested
    run_ingest_available_now(spark, str(src), clean, corrupt, ck)
    assert spark.read.parquet(clean).count() == 3
    assert spark.read.parquet(corrupt).count() == 1

    # a NEW arrival after the replay is picked up incrementally
    (src / "c.jsonl").write_text(_doc(5) + "\n")
    run_ingest_available_now(spark, str(src), clean, corrupt, ck)
    assert spark.read.parquet(clean).count() == 4
