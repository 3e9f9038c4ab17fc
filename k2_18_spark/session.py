"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster but testable on local[N]:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (every Python-side op is a vectorized pandas UDF)
- explicit shuffle-partition sizing (callers may override per-scale)
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def superstep_conf(spark: SparkSession):
    """Run a superstep loop with AQE disabled, restoring it after.

    AQE materializes every shuffle stage to re-plan — measurably worse
    for iterative jobs that issue dozens of small, identically-shaped
    queries (30-60% per-superstep latency here). Skew inside the loops
    is handled explicitly (hub broadcast split, map-side partial
    aggregation), so AQE's skew-join protection isn't needed there;
    ad-hoc relational queries keep AQE on.
    """
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def get_spark(
    app_name: str = "k2_18_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    so the same entry point runs under spark-submit on a real cluster
    (where ``master`` is injected by the launcher and must stay None).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_ENV_LOADED"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    conf = {
        # AQE: runtime coalescing + skew-join splitting — mandatory for
        # power-law link graphs (hub pages skew every dst-keyed shuffle).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for every pandas UDF / toPandas boundary.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            if shuffle_partitions is not None
            else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        ),
        # Superstep loops build long plans; keep planner costs flat.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # local mode: the driver IS the executor — size it for the box
        # (bench holds a 1.5M-edge graph + adjacency + embedding corpus
        # cached at once; 8g forced constant GC on the late queries)
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        # shuffle/checkpoint scratch on tmpfs when available: this box's
        # /tmp is a shared virtual disk whose co-tenant writeback stalls
        # BypassMergeSortShuffleWriter's transferTo for tens of seconds
        # (jstack-verified); a real cluster's executors get local SSDs.
        # Override with SPARK_GRAFT_LOCAL_DIR.
        "spark.local.dir": os.environ.get(
            "SPARK_GRAFT_LOCAL_DIR",
            "/dev/shm/spark-local"
            if os.access("/dev/shm", os.W_OK)
            else "/tmp",
        ),
        "spark.ui.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
