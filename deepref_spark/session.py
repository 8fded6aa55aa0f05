"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (single JVM, local[N]) but chosen to survive a
1000-executor cluster: AQE with skew-join handling, Arrow batching for
every pandas UDF, shuffle partition count decoupled from core count (so
the same plan scales N -> 4N without re-tuning), UTC timestamps for
oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One BLAS thread per task: Spark supplies the parallelism (one python
# worker per core); multi-threaded BLAS inside each worker oversubscribes
# the box and destroys scaling (measured: 32 workers x OpenBLAS threads
# ran SLOWER than 8). Must be set before numpy loads in the workers —
# they inherit the JVM's env, which inherits ours.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

# Shuffle partitions are sized for the LARGEST parallelism we run
# (local[32]); keeping it fixed across parallelism levels means the
# N-core and 4N-core runs execute the same physical plan and the
# scaling-efficiency measurement isolates the hardware, not the planner.
DEFAULT_SHUFFLE_PARTITIONS = 128


def get_spark(
    app_name: str = "deepref_spark",
    cores: int | str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect advisoryPartitionSizeInBytes when coalescing instead
        # of keeping >= defaultParallelism micro-partitions — the
        # setting the Spark docs themselves recommend ("it's
        # recommended to set this config to false"): post-shuffle
        # partitions then track DATA SIZE at any scale (64 MB default
        # advisory) rather than the local core count. Env-overridable
        # so the trade can be re-measured per deployment.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate turns every explode(expensive_expr)
        # into a pushed-down size(expensive_expr) > 0 filter that
        # re-evaluates the full expression tree (for our shingle arrays,
        # re-tokenizing each document inside the filter lambda: measured
        # 10x+ on the dedup suite). Our generated arrays are non-empty
        # by construction (sequence floors at 1), so the inferred filter
        # only ever costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
