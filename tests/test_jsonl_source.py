"""JSONL ingestion (sources/jsonl.py): round-trip parity and PERMISSIVE
corrupt-record capture with a planted malformed line."""

from __future__ import annotations

import json

from locus_spark.sources.jsonl import (
    CORRUPT_COL,
    read_documents_jsonl,
    split_corrupt,
)


def test_jsonl_corrupt_lines_are_captured_not_dropped(spark, tmp_path):
    good = [
        {"doc_id": 1, "text": "a line\nwith a newline and a \"quote\"",
         "lang": "en", "source": "web", "n_chars": 35},
        {"doc_id": 2, "text": "plain", "lang": "de", "source": "web",
         "n_chars": 5},
    ]
    lines = [json.dumps(good[0]), '{"doc_id": 3, "text": "trunca',
             json.dumps(good[1]), "not json at all"]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")

    raw = read_documents_jsonl(spark, str(p))
    clean, corrupt = split_corrupt(raw)

    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    # embedded newline and quotes survive the round trip byte-exactly
    assert rows[1]["text"] == good[0]["text"]
    assert rows[1]["n_chars"] == 35 and rows[2]["lang"] == "de"
    assert CORRUPT_COL not in clean.columns

    bad = [r[CORRUPT_COL] for r in corrupt.collect()]
    assert sorted(bad) == sorted([lines[1], lines[3]])
    raw.unpersist()
