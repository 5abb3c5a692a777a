#!/usr/bin/env python
"""A/B the small-scale kNN round-state materialization modes (round-5
seg_knn regression investigation, VERDICT r4 item 1).

Runs the spatial kNN family at sf0.1 under each mode of
``spark.locus.knn.smallstate`` in ONE warm session per mode (fresh JVM per
mode so block-store state can't leak across modes), min-of-N walls.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = os.environ.get("AB_QUERIES", "seg_knn,seg_knn_to_point,kd_knn,r_knn").split(",")
REPS = int(os.environ.get("AB_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_mode(mode: str) -> None:
    from locus_spark import queries as q
    from locus_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{mode}")
    spark.conf.set("spark.locus.knn.smallstate", mode)
    reg = q.queries()
    out = {}
    for name in QUERIES:
        walls = []
        for _ in range(REPS):
            t0 = time.monotonic()
            reg[name](spark, SF_DIR).count()
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(walls), "walls": walls}
    print(json.dumps({"mode": mode, "queries": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_mode(sys.argv[1])
    else:
        for mode in ("lazy", "lazy_fresh", "eager"):
            subprocess.run(
                [sys.executable, __file__, mode], check=True, cwd=str(REPO)
            )
