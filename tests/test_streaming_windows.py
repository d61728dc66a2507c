"""Event-time windowed aggregation: streaming (watermark + AvailableNow)
produces exactly the batch result on a fully-replayed source."""

from pyspark.sql import functions as F

from tilecloud_chain_spark.streaming.windows import (
    streaming_tumbling_counts,
    tumbling_counts,
)


def test_streaming_windows_equal_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = tumbling_counts(events, minutes=60 * 24)
    expected = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in batch.collect()
    }

    # streaming file source requires a directory
    import shutil

    src_dir = tmp_path / "events_dir"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "part-0.parquet")

    out_dir = str(tmp_path / "out")
    streaming_tumbling_counts(
        spark,
        str(src_dir),
        str(tmp_path / "ckpt"),
        out_dir,
        minutes=60 * 24,
        watermark="1 hour",
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_batch_windows_shapes(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = tumbling_counts(events, minutes=60 * 24)
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == events.count()  # every event in exactly one window


def test_as_of_join_semantics(spark):
    """<= match (equal ts matches), latest-wins, NULL before first anchor;
    plan check: ONE shuffle (the key), no range cross join."""
    from pyspark.sql import functions as F

    from tilecloud_chain_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 9, "b"), (1, 10, "c"), (2, 3, "d"), (2, 50, "e")],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 4, 100), (1, 9, 200), (2, 10, 300)], "k int, t int, v int"
    )
    out = as_of_join(left, right, key="k", ts="t", value_cols=["v"])
    got = {(r.k, r.t): r.asof_v for r in out.collect()}
    assert got == {(1, 5): 100, (1, 9): 200, (1, 10): 200,
                   (2, 3): None, (2, 50): 300}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # union shuffle + window sort
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
