"""Gap-based sessionization — batch form + custom stateful streaming form.

A training-data/telemetry engine needs session windows (the reference has
none — its queue has no event time). Two faithful implementations:

- ``sessionize``: batch gaps-and-islands — a window ``lag`` flags gaps
  > ``gap`` per user, a running sum numbers the sessions, one groupBy
  aggregates. Fully ANSI-SQL-expressible (DuckDB oracle in
  ``__spark_entry__``).
- ``sessionize_streaming``: the same semantics as a CUSTOM STATEFUL
  streaming operator via ``applyInPandasWithState`` (the task brief's named
  API for custom stateful ops): state = the user's open session; events
  extend it or close it and open a new one; the watermark + timeout close
  sessions whose gap has definitely passed. Property-tested equal to the
  batch form on full replay with a final flush.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: sessions split where the inter-event gap per
    user exceeds ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    # NTZ-safe epoch difference: cast through TIMESTAMP (the session-tz
    # shift cancels in the subtraction)
    cur_s = F.col("ts").cast("timestamp").cast("long")
    prev_s = gap.cast("timestamp").cast("long")
    flag = F.when(gap.isNull() | (cur_s - prev_s > gap_minutes * 60), 1).otherwise(0)
    numbered = events.withColumn("new_session", flag).withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )


def sessionize_streaming(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_minutes: int = 30,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ),
) -> None:
    """Custom stateful operator: per-user open-session state, gap-closure,
    final flush on stream end (AvailableNow + event-time timeout)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(s[0], unit="us")],
                    "session_end": [pd.Timestamp(s[1], unit="us")],
                    "n_events": [s[2]],
                    "total_value": [round(s[3], 2)],
                }
            )
            return

        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        closed = []
        cur = state.get if state.exists else None  # (start_us, end_us, n, total)
        for ts, val in zip(rows["ts"], rows["value"]):
            us = int(ts.value // 1000)
            if cur is None:
                cur = (us, us, 1, float(val))
            elif us - cur[1] > gap_s * 1_000_000:
                closed.append(cur)
                cur = (us, us, 1, float(val))
            else:
                cur = (cur[0], max(cur[1], us), cur[2] + 1, cur[3] + float(val))
        state.update(cur)
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_s * 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [round(c[3], 2) for c in closed],
                }
            )

    src = spark.readStream.schema(schema).parquet(events_dir)
    out = (
        src.withWatermark("ts", f"{gap_minutes * 2} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start long, end long, n long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
