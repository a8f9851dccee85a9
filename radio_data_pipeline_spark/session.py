"""SparkSession factory with scale-oriented defaults.

The same config block is intended for a 1000-executor cluster; only
``master`` and the shuffle-partition count are local-mode artifacts.
AQE handles runtime coalescing and skew-join splitting, so the static
shuffle-partition number is a ceiling, not a tuning knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "radio-data-pipeline-spark",
              cpus: int | None = None,
              master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` (or env ``SPARK_GRAFT_MASTER``) overrides the default
    ``local[cpus]`` — e.g. ``local-cluster[2,8,4096]`` runs the same
    plans on REAL separate executor JVMs (serialized closures, network
    shuffle/broadcast, per-executor Python workers), the closest
    in-container approximation of a multi-node cluster. For any
    non-``local[...]`` master the repo root is exported to executor
    Python workers via ``spark.executorEnv.PYTHONPATH`` so cloudpickled
    UDF/applyInPandas kernels can import this package remotely.

    Scale rationale per config:
    - AQE on: runtime shuffle-partition coalescing, skew-join split,
      dynamic broadcast conversion — required at 100 TB where static
      planning guesses wrong.
    - Arrow on: every pandas UDF / applyInPandas kernel moves data as
      Arrow batches instead of pickled rows.
    - shuffle.partitions: sized for local runs; on a real cluster AQE
      coalesces from a high initial number, so we also raise
      ``initialPartitionNum``.
    """
    cpus = cpus or DEFAULT_CPUS
    master = master or os.environ.get("SPARK_GRAFT_MASTER") \
        or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size post-shuffle partitions by bytes, not cluster default
        # parallelism — the documented production setting; small
        # shuffles collapse to few tasks, huge ones still fan out
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        # ...but never let byte-based coalescing collapse CPU-dense,
        # byte-light stages (minhash/simhash kernels) below one task
        # per core — the measured 6x regression in BENCH_SCALING.md
        # finding 5. On a real cluster set this ~= total cores.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
                str(cpus))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # single-node / fast-network clusters gain nothing from
        # locality delay scheduling
        .config("spark.locality.wait", "0")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(cpus * 4))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # older testdata generations store events.ts as
        # TIMESTAMP(NANOS); Spark reads those as a nanosecond LONG
        # under this flag (harmless for timestamp[us] data; set again
        # at runtime by load_table for sessions we didn't build)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if not master.startswith("local["):
        # Separate executor JVMs spawn their own Python workers in
        # their own working directories; ship the repo root so
        # cloudpickled kernels resolve this package there.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # Spark's 1g executor default is sized for neither the
        # array-fold kernels nor sf0.1 shuffles; without this the
        # worker OOM-kills and relaunches executors mid-query (362
        # relaunches measured in one bench run). A local-cluster
        # master declares memoryPerWorker itself — asking for more
        # than that fails at SparkContext construction, so default to
        # exactly the worker's allotment and let the env override
        # DOWNWARD for multi-executor-per-worker layouts.
        import re
        exec_mem = os.environ.get("SPARK_GRAFT_EXECUTOR_MEM")
        if exec_mem is None:
            m = re.match(r"local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]",
                         master)
            exec_mem = f"{m.group(1)}m" if m else "6g"
        builder = (
            builder
            .config("spark.executorEnv.PYTHONPATH", repo_root)
            .config("spark.executor.memory", exec_mem)
        )
    return builder.getOrCreate()
