#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count) with a warm session; per-query
wall seconds are reported, value = total.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from locus_spark import queries as q  # noqa: E402
from locus_spark.session import get_spark  # noqa: E402

#: headline set — one per operator family + the pipeline ops
HEADLINE = [
    "kd_find_box",
    "kd_find_ball",
    "kd_nearest",
    "kd_knn",
    "r_find_subsets",
    "r_find_supersets",
    "r_knn",
    "seg_knn_to_point",
    "seg_knn",
    "tile_point_counts",
    "pip_polygons",
    "raster_vector",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "doc_token_stats",
    "doc_lang_id",
    "ann_cosine_topk",
    "media_features",
    "kd_knn_persisted",
    "events_hourly",
    "media_frame_sample",
    "pages_geotile_lang",
    "pages_knn",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="locus_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    registry = q.queries()
    # warm the session (codegen, parquet reader, Python workers) so the first
    # measured query doesn't absorb one-time JVM startup costs
    from locus_spark.sources.derived import register_base_tables

    register_base_tables(spark, sf_dir)
    spark.table("region").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.monotonic()
        rows[name] = fn(spark, sf_dir).count()
        results[name] = round(time.monotonic() - t0, 3)
        # release cached/checkpointed blocks (ring-loop state, dedup shingle
        # caches) so earlier queries' storage doesn't pressure later ones
        spark.catalog.clearCache()
    total = round(sum(results.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf),
                "rows": rows,
                "cores": int(cpus),
                # session is pre-warmed before timing; numbers are
                # steady-state, not cold-start (see BENCH.md)
                "timing": "warm_session_single_run",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
