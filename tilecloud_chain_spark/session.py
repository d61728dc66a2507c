"""SparkSession factory with the engine's default tuning.

Local-mode knobs mirror what we'd set on a real cluster: AQE (runtime
re-planning + skew-join splitting), Arrow for pandas UDF transfer, parquet
filter pushdown. ``cores`` parameterizes the two-cluster-size scaling bench
(N vs 4N realization, BASELINE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tilecloud_chain_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()

def ensure_parallelism(df, probe=None):
    """Repartition a NARROW DataFrame (fewer partitions than the cluster's
    default parallelism — e.g. one small parquet file, or the output of a
    broadcast join over one) up to default parallelism, so a compute-bound
    Arrow/UDF stage downstream doesn't run on one core. The gate only ever
    fires on tiny inputs: at 100 TB the scan already yields orders of
    magnitude more partitions than cores and this is a no-op. Shared by
    the MinHash/langid/BPE/line-stats scale paths.

    Probing cost: under AQE, ``Dataset.rdd`` on a plan containing an
    Exchange finalizes the adaptive plan — which EXECUTES the exchange's
    upstream stages just to answer ``getNumPartitions`` (measured: 2 jobs
    / 2.1 s for a semi-join probe whose stages then re-run in the real
    action). AQE wraps a plan in ``AdaptiveSparkPlan`` exactly when it
    holds an exchange or subquery, so the guard probes ONLY unwrapped
    plans (scans, checkpoints — there the RDD conversion is lazy
    metadata, zero jobs; detection must use the EXECUTED plan string: the
    pre-``EnsureRequirements`` ``sparkPlan()`` shows joins without their
    exchanges). A caller whose ``df`` is join-fed passes ``probe`` = the
    scan-sourced input whose partitioning the join's streamed side
    inherits (broadcast joins preserve it); with no probe and a wrapped
    plan the guard backs off untouched — post-shuffle parallelism is
    config-driven, not file-driven."""
    target = probe if probe is not None else df
    qe = target._jdf.queryExecution()
    if "AdaptiveSparkPlan" in qe.executedPlan().toString():
        return df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if target.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
