"""Distributed enumeration + filter goldens (reference test_generate suite)."""

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import LAYERS, SWISSGRID_5, Grid
from tilecloud_chain_spark.operators import filters as FL
from tilecloud_chain_spark.operators import metatile as MT
from tilecloud_chain_spark.sources import enumerate as EN


def layer_geoms(layer_name, zooms):
    wkt = LAYERS[layer_name].geom_wkt
    g = G.parse_wkt(wkt)
    return {z: g for z in zooms}


def test_dense_tiles_full_z0_count(spark):
    df = EN.dense_tiles(spark, SWISSGRID_5, [0])
    assert df.count() == 19 * 13


def test_dense_tiles_bbox_golden(spark):
    """test_layer_bbox: bbox [550000,170000,560000,180000] -> (x=5, y∈{6,7})."""
    df = EN.dense_tiles(spark, SWISSGRID_5, [0], bounds=(550000, 170000, 560000, 180000))
    got = {(r.x, r.y) for r in df.collect()}
    assert got == {(5, 6), (5, 7)}


def test_polygon_z0_filter_golden(spark):
    """polygon layer z0 -> 12 tiles product(x 4..7, y 5..7)
    (tests/test_generate.py:1384-1406)."""
    geoms = layer_geoms("polygon", [0])
    df = EN.dense_tiles(spark, SWISSGRID_5, [0], bounds=geoms[0].bounds())
    df = FL.geom_intersect_filter(df, SWISSGRID_5, geoms)
    got = {(r.x, r.y) for r in df.collect()}
    assert got == {(x, y) for x in (4, 5, 6, 7) for y in (5, 6, 7)}


def test_line_pipeline_generated_dropped_stored_golden(spark):
    """Line layer z0, meta 8x8 (tests/test_generate.py:935-977):
    1 metatile -> 64 generated; 6 stored (geometry-visible); 58 dropped."""
    geoms = layer_geoms("line", [0])
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    metas = FL.geom_intersect_filter(
        metas, SWISSGRID_5, geoms, buffer_px=LAYERS["line"].filter_buffer_px(), n="n"
    )
    assert [(r.z, r.x, r.y, r.n) for r in metas.collect()] == [(0, 0, 0, 8)]

    children = MT.split_to_tiles(metas, clamp_matrix=SWISSGRID_5.matrix_size(0))
    generated = children.count()
    assert generated == 64

    stored = FL.geom_intersect_filter(children, SWISSGRID_5, geoms)
    got = {(r.x, r.y) for r in stored.collect()}
    assert got == {(6, 5), (7, 5), (5, 6), (6, 6), (4, 7), (5, 7)}
    assert generated - len(got) == 58


def test_point_hash_pipeline_golden(spark):
    """point_hash z0 (tests/test_generate.py:1474-1499): 64 generated,
    62 dropped, stored (x,y) = {(7,5),(4,7)}."""
    geoms = layer_geoms("point_hash", [0])
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    metas = FL.geom_intersect_filter(
        metas, SWISSGRID_5, geoms, buffer_px=LAYERS["point_hash"].filter_buffer_px(), n="n"
    )
    children = MT.split_to_tiles(metas, clamp_matrix=SWISSGRID_5.matrix_size(0))
    assert children.count() == 64
    stored = FL.geom_intersect_filter(children, SWISSGRID_5, geoms)
    got = {(r.x, r.y) for r in stored.collect()}
    assert got == {(7, 5), (4, 7)}


def test_sparse_matches_driver_plan(spark):
    """Distributed sparse enumeration == driver-side plan on every fixture."""
    for name in ("point", "line", "polygon"):
        zooms = [0, 1, 2, 3]
        geoms = layer_geoms(name, zooms)
        dist = {
            (r.z, r.x, r.y, r.n)
            for r in EN.sparse_metatiles(spark, SWISSGRID_5, geoms, zooms, n=8).collect()
        }
        plan = set(EN.plan_sparse_metatiles(SWISSGRID_5, geoms, zooms, n=8))
        assert dist == plan, name


def test_min_resolution_seed_zoom_pruning(spark):
    """point_hash has min_resolution_seed=10 -> zoom 4 (res 5) pruned."""
    zooms = FL.select_zooms(SWISSGRID_5, None, min_resolution_seed=10.0)
    assert zooms == [0, 1, 2, 3]


def test_process_filter_partitions_disjoint_and_complete(spark):
    df = EN.dense_tiles(spark, SWISSGRID_5, [0, 1]).withColumn("n", F.lit(1))
    total = df.count()
    counts = [FL.process_filter(df, 3, i, n="n").count() for i in range(3)]
    assert sum(counts) == total
