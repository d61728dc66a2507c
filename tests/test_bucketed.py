"""Bucketed co-located joins: no shuffle Exchange on either join side."""

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.config import SWISSGRID_5
from tilecloud_chain_spark.functions import gridmath as GM
from tilecloud_chain_spark.operators import spatial as SP
from tilecloud_chain_spark.sources import enumerate as EN
from tilecloud_chain_spark.sources.bucketed import (
    cell_join_bucketed,
    write_bucketed,
)
from tilecloud_chain_spark.sources.images import position_exprs


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_cell_join_is_shuffle_free(spark, no_broadcast):
    x, y = position_exprs(F.col("id"), SWISSGRID_5)
    pts = spark.range(0, 20000).select(F.col("id").alias("pid"), x, y)
    assigned = SP.assign_tiles(pts, SWISSGRID_5, [3]).select("pid", "cell")
    tiles = EN.dense_tiles(spark, SWISSGRID_5, [3]).select(
        GM.cell_key(F.col("z"), F.col("x"), F.col("y")), "x", "y"
    )
    write_bucketed(assigned, "bkt_points", buckets=8)
    write_bucketed(tiles, "bkt_tiles", buckets=8)
    try:
        j = cell_join_bucketed(spark, "bkt_points", "bkt_tiles")
        n = j.count()
        assert n == 20000  # every point joins its tile
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the defining property: NO repartitioning exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_points")
        spark.sql("DROP TABLE IF EXISTS bkt_tiles")


def test_unbucketed_same_join_shuffles(spark, no_broadcast):
    """Control: the identical join over plain DataFrames DOES shuffle —
    demonstrating what bucketing removes."""
    x, y = position_exprs(F.col("id"), SWISSGRID_5)
    pts = spark.range(0, 20000).select(F.col("id").alias("pid"), x, y)
    assigned = SP.assign_tiles(pts, SWISSGRID_5, [3]).select("pid", "cell")
    tiles = EN.dense_tiles(spark, SWISSGRID_5, [3]).select(
        GM.cell_key(F.col("z"), F.col("x"), F.col("y"))
    )
    j = assigned.join(tiles, "cell")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
