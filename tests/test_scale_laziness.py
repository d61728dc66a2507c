"""10^12-design-point sanity: enumeration and assignment stay lazy and
plan-time-bounded — nothing trillion-sized ever touches the driver."""

import time

from pyspark.sql import functions as F

from tilecloud_chain_spark.config import Grid
from tilecloud_chain_spark.operators import spatial as SP
from tilecloud_chain_spark.sources import enumerate as EN

# a deep pyramid down to sub-mm resolutions: z16 matrix is
# ~1.2M x 0.8M tiles (~1e12) and z17 ~4e12 — the design point.
DEEP = Grid(
    name="deep",
    resolutions=tuple(100.0 / (2**z) for z in range(18)),
    bbox=(420000.0, 30000.0, 900000.0, 350000.0),
    tile_size=256,
)


def test_trillion_tile_enumeration_is_lazy(spark):
    z = 16  # matrix ~1.2M x ~0.8M tiles ~ 1e12
    w, h = DEEP.matrix_size(z)
    assert w * h > 10**12  # the design point
    t0 = time.time()
    df = EN.dense_tiles(spark, DEEP, [z])
    head = df.limit(5).collect()
    assert len(head) == 5
    assert time.time() - t0 < 30  # plan + first partition only
    # the range rectangle was computed at plan time; no driver-side loop
    rng = EN.dense_range(DEEP, z, DEEP.bbox)
    assert rng == (0, w - 1, 0, h - 1)


def test_trillion_tile_bbox_pruning_counts_exactly(spark):
    """A small bbox inside the trillion-tile matrix enumerates ONLY its
    rectangle — plan-time pruning, exact count."""
    z = 11
    span = DEEP.span(z)
    bbox = (500000.0, 150000.0, 500000.0 + 100 * span, 150000.0 + 80 * span)
    df = EN.dense_tiles(spark, DEEP, [z], bounds=bbox)
    n = df.count()
    assert 100 * 80 <= n <= 101 * 81  # corner-floor inclusivity
    cells = SP.assign_tiles(
        spark.createDataFrame([(500000.0 + span, 150000.0 + span)], "x double, y double"),
        DEEP,
        [z],
    ).collect()
    assert len(cells) == 1
    # the assigned tile is inside the enumerated window
    assert bbox[0] <= 500000.0 + span <= bbox[2]


def test_deep_sparse_planning_is_distributed(spark):
    """Sparse enumeration at a deep zoom plans row-bands on executors: a
    geometry covering ~4000 metatile rows yields its intervals without any
    driver-side per-row loop (wall-clock bounded)."""
    from tilecloud_chain_spark import geometry as G

    z = 8  # res 0.39 m/px, metatile span 800m; geometry 100km tall
    geom = G.box_geom(500000, 150000, 501000, 250000)  # 1km x 100km sliver
    t0 = time.time()
    df = EN.sparse_metatiles(spark, DEEP, {z: geom}, [z], n=8)
    n = df.count()
    wall = time.time() - t0
    span = DEEP.span(z, 8)
    rows_expected = int(100000 / span) + 1
    cols_expected = int(1000 / span) + 2
    assert rows_expected <= n <= rows_expected * cols_expected
    assert wall < 60, wall


def test_ensure_parallelism_gate(spark):
    """The narrow-input guard repartitions only when the input has fewer
    partitions than default parallelism — a well-partitioned (scale) input
    must pass through untouched (no shuffle added to 100 TB plans)."""
    from tilecloud_chain_spark.session import ensure_parallelism

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1).selectExpr("id")
    widened = ensure_parallelism(narrow)
    assert widened.rdd.getNumPartitions() == par

    wide = spark.range(0, 1000, 1, par * 2).selectExpr("id")
    passed = ensure_parallelism(wide)
    assert passed is wide  # identity: not even a new plan node


def test_ensure_parallelism_never_executes_join_stages(spark):
    """Probing partition counts on a join-fed plan under AQE finalizes the
    adaptive plan and EXECUTES the join's stages (measured 2 jobs / 2.1 s)
    — the guard must back off from exchange-bearing plans without
    launching a single job."""
    from pyspark.sql import functions as F

    from tilecloud_chain_spark.session import ensure_parallelism

    docs = spark.range(0, 5000, 1, 2).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    ids = docs.select((F.col("doc_id") % 97).alias("doc_id")).distinct()
    joined = docs.join(ids, "doc_id", "left_semi")

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = ensure_parallelism(joined)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert out is joined  # backed off untouched
    assert after == before, "probe launched Spark jobs on a join-fed plan"
