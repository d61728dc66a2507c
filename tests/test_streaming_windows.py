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


def test_as_of_join_null_value_cols_no_torn_rows(spark):
    """A right row holding NULL in one value column must be returned AS the
    matched row (its NULL included) — not stitched with an earlier non-null
    value from a DIFFERENT right row (torn row). Cross-checked against
    DuckDB's native ASOF LEFT JOIN on the same data."""
    import duckdb
    import pandas as pd

    from tilecloud_chain_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, 5), (1, 12), (1, 20), (2, 7)], "k int, t int"
    )
    # right row at t=10 carries (NULL, 21): the as-of match at left t=12/20
    # must return v1=NULL (from the t=10 row), not v1=11 from the t=2 row
    right = spark.createDataFrame(
        [(1, 2, 11, 20), (1, 10, None, 21), (2, 9, 33, None)],
        "k int, t int, v1 int, v2 int",
    )
    out = as_of_join(left, right, key="k", ts="t", value_cols=["v1", "v2"])
    got = {(r.k, r.t): (r.asof_v1, r.asof_v2) for r in out.collect()}
    assert got[(1, 12)] == (None, 21)   # matched row's NULL, not a torn 11
    assert got[(1, 20)] == (None, 21)
    assert got[(1, 5)] == (11, 20)
    assert got[(2, 7)] == (None, None)  # no right row yet

    con = duckdb.connect()
    con.register("l", pd.DataFrame({"k": [1, 1, 1, 2], "t": [5, 12, 20, 7]}))
    con.register("r", pd.DataFrame(
        {"k": [1, 1, 2], "t": [2, 10, 9],
         "v1": pd.array([11, None, 33], dtype="Int64"),
         "v2": pd.array([20, 21, None], dtype="Int64")}
    ))
    oracle = con.execute(
        "SELECT l.k, l.t, r.v1, r.v2 FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.t >= r.t"
    ).fetchall()
    want = {(k, t): (v1 if v1 is not None else None,
                     v2 if v2 is not None else None)
            for k, t, v1, v2 in oracle}
    assert got == want
