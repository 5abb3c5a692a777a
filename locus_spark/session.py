"""SparkSession factory tuned for this engine.

AQE on (runtime skew-join splitting + partition coalescing), Arrow on
(vectorized pandas UDF transfer), shuffle partitions sized to the local core
count instead of the 200 default. On a real cluster the same builder is used
with ``master`` unset (taken from spark-submit).
"""

from __future__ import annotations

import os
import pathlib

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

#: repo root containing the ``locus_spark`` package — shipped to Python
#: workers so module-level UDF kernels resolve.  On a real cluster the same
#: thing is done with ``spark-submit --py-files locus_spark.zip``.
_PKG_PARENT = str(pathlib.Path(__file__).resolve().parent.parent)


def _ensure_worker_pythonpath() -> None:
    """Python workers inherit the driver's env in local mode; make sure the
    package parent dir is importable there (must run before the JVM starts)."""
    current = os.environ.get("PYTHONPATH", "")
    if _PKG_PARENT not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _PKG_PARENT + (os.pathsep + current if current else "")
        )


def get_spark(
    app_name: str = "locus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    _ensure_worker_pythonpath()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode shares one JVM between driver and executor: under full
        # CPU saturation the heartbeat thread can starve for minutes, and the
        # default 120 s timeout then kills the executor mid-job (seen in the
        # kNN ring loop at local[4] with every core busy).
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "1200s")
        # GC reliable-checkpoint files once their DataFrames are collected
        # (the kNN ring loop checkpoints small frames every round)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
