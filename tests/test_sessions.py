"""Sessionization: batch gaps-and-islands vs applyInPandasWithState custom
stateful streaming operator."""

import os
import shutil

from tilecloud_chain_spark.streaming.sessions import sessionize, sessionize_streaming


def test_stateful_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in sessionize(ev, 30).collect()
    }
    assert len(batch) > 100

    src = tmp_path / "events_dir"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "p.parquet")
    out = str(tmp_path / "out")
    sessionize_streaming(spark, str(src), str(tmp_path / "ck"), out, 30)
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    # every emitted streaming session is EXACTLY a batch session
    assert all(batch.get(k) == v for k, v in got.items())
    # append-mode semantics: only each user's final still-open session may
    # be unemitted at stream end
    n_users = ev.select("user_id").distinct().count()
    assert len(batch) - len(got) <= n_users
    assert len(got) / len(batch) > 0.9


def test_batch_sessions_cover_all_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F

    s = sessionize(ev, 30)
    assert s.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # session bounds ordered
    assert s.filter(F.col("session_end") < F.col("session_start")).count() == 0
