"""SparkSession factory with scale-oriented defaults.

The reference engine hand-tunes parallelism per operator
(``src/graph/service/GraphFlags.cpp:27-28`` — worker threads, operator
threads). Under Spark that knob surface collapses into a handful of session
configs; everything else (partial aggregation, pipelining, spill) is
automatic. Defaults below are chosen for the local[32]/128GiB test harness
but every one of them scales to a real cluster: AQE re-plans shuffles at
runtime, coalesces small partitions, and rewrites skewed joins — exactly the
machinery you want at 100 TB where static planning is always wrong.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow makes pandas_udf / mapInPandas / toPandas batch-transfer instead of
# pickling row-at-a-time; non-negotiable for the pipeline operators.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # at sf0.1 (~600k lineitem) 32 shuffle partitions keeps each post-shuffle
    # partition comfortably in memory; on a real cluster AQE coalesces from
    # a deliberately-high initial number instead.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": "16g",
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "134217728",
    # the events table is written with TIMESTAMP(NANOS) which the vectorized
    # parquet reader rejects; read as long and convert (catalog.load_tables)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "nebula_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the session.

    Master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    same code path serves tests, bench, and a real cluster (where
    ``spark.master`` is injected by the cluster manager and the local default
    is ignored because a session already exists).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
