"""Event-time windowed aggregations (engine capability beyond the reference).

The reference has NO event-time semantics (SURVEY.md §2.11: its "streaming"
is a work queue) — but a general-purpose engine at this scale needs them for
telemetry/lineage analytics, so they're provided as first-class operators:

- ``tumbling_counts``: batch form — ``F.window`` bucketing (SQL-oracle-able
  via DuckDB ``time_bucket``);
- ``streaming_tumbling_counts``: the SAME aggregation as a Structured
  Streaming query with a watermark, run with Trigger.AvailableNow over a
  file source; its complete output is property-tested equal to the batch
  form (late-data semantics collapse to equality when the source is
  replayed in full).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, minutes: int = 60 * 24) -> DataFrame:
    """Tumbling event-time window counts + value sums per event_type."""
    w = F.window(F.col("ts"), f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    minutes: int = 60 * 24,
    watermark: str = "1 hour",
    schema: str | None = None,
) -> None:
    """Same aggregation through the streaming runtime: file source ->
    watermark -> windowed agg -> complete-mode sink via foreachBatch
    (AvailableNow drains then stops)."""
    if schema is None:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
    src = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
