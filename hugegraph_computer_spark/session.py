"""SparkSession factory with the engine's default tuning.

Defaults are chosen for iterative graph workloads at scale:

* AQE on (runtime shuffle-partition coalescing + skew-join splitting) —
  replaces the reference engine's fixed hash partitioning
  (computer-core/.../graph/partition/HashPartitioner.java:43-52).
* Arrow on — every Python-side kernel in this engine is a vectorized
  pandas UDF over Arrow batches (the reference is row-at-a-time Java;
  we explicitly avoid row-at-a-time Python).
* shuffle partitions sized to the local test harness; on a real cluster
  set ``spark.sql.shuffle.partitions`` ~ 2-3x total cores and rely on AQE
  coalescing for the small supersteps at the tail of convergence.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Iterative algorithms re-plan every superstep; keep the driver light.
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    master: str | None = None,
    app_name: str = "hugegraph-computer-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entry points run under the driver harness and in tests.
    """
    # Under ``spark-submit`` the JVM gateway is already up (PythonRunner
    # exports PYSPARK_GATEWAY_PORT) and carries the submitted master /
    # deploy conf; forcing ``.master()`` here would override the cluster
    # manager chosen on the command line (entry point B, SURVEY.md §3).
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_submit:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None and not under_submit:
        # local default only — under spark-submit the submitted/cluster
        # conf must win, so no value is forced unless the caller asks
        n = master.split("[")[-1].rstrip("]") if master and "[" in master else "32"
        shuffle_partitions = 32 if not n.isdigit() else max(8, int(n))
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local mode: give the single JVM room for cached adjacency + shuffle
    # (a no-op under spark-submit, where the JVM is already running and
    # driver memory was fixed by the submit command)
    if not under_submit:
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g")
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
