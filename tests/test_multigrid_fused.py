"""Multi-grid pipeline golden (reference tests/test_multi_grid.py:26-64) and
fused render+split equivalence."""

import numpy as np
from pyspark.sql import functions as F

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import Grid, Layer, LAYERS, SWISSGRID_5
from tilecloud_chain_spark.operators import filters as FL
from tilecloud_chain_spark.operators import raster as R
from tilecloud_chain_spark.sources import enumerate as EN

# test-multi-grid.yaml grids: same pyramid in LV03 and LV95
MG_21781 = Grid(name="swissgrid_21781", resolutions=(1000, 500, 200, 100, 50, 20, 10, 5),
                bbox=(420000, 30000, 900000, 350000), tile_size=256, srs="EPSG:21781")
MG_2056 = Grid(name="swissgrid_2056", resolutions=(1000, 500, 200, 100, 50, 20, 10, 5),
               bbox=(2420000, 1030000, 2900000, 1350000), tile_size=256, srs="EPSG:2056")

WKT_POINTS_2056 = "MULTIPOINT ((2600000 1200000), (2530000 1150000))"


def test_multi_grid_all_z0_golden(spark):
    """Layer 'all' (point geoms, meta 2x2, no empty-tile hash) on two grids,
    z0: exactly 1 metatile and 4 stored tiles (0,{0,1},{0,1}) PER GRID —
    2 metatiles / 8 generated / 0 dropped / 8 stored total."""
    lay = Layer(name="all_mg", grid="*", meta=True, meta_size=2, meta_buffer=128)
    cases = [
        (MG_21781, G.parse_wkt("MULTIPOINT ((600000 200000), (530000 150000))")),
        (MG_2056, G.parse_wkt(WKT_POINTS_2056)),
    ]
    total_metas = total_tiles = 0
    for grid, geom in cases:
        geoms = {0: geom}
        metas = EN.sparse_metatiles(spark, grid, geoms, [0], n=2)
        metas = FL.geom_intersect_filter(
            metas, grid, geoms, buffer_px=lay.filter_buffer_px(), n="n"
        )
        mrows = metas.collect()
        assert [(r.z, r.x, r.y, r.n) for r in mrows] == [(0, 0, 0, 2)], grid.name
        total_metas += len(mrows)
        children = R.render_split_metatiles(
            metas, grid, geoms, meta_buffer=32, line_width_px=2.0
        )
        rows = children.collect()
        # no empty_tile_detection on this layer -> ALL children stored
        got = {(r.z, r.x, r.y) for r in rows}
        assert got == {(0, 0, 0), (0, 1, 0), (0, 0, 1), (0, 1, 1)}, grid.name
        total_tiles += len(rows)
    assert total_metas == 2 and total_tiles == 8  # reference golden counts


def test_fused_equals_unfused_bit_exact(spark):
    """render_split_metatiles == render_metatiles -> split_metatile_images,
    byte-for-byte."""
    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)

    unfused = R.split_metatile_images(
        R.render_metatiles(metas, SWISSGRID_5, geoms, meta_buffer=32),
        tile_size=256, meta_buffer=32, clamp_matrix=SWISSGRID_5.matrix_size(0),
    )
    fused = R.render_split_metatiles(metas, SWISSGRID_5, geoms, meta_buffer=32)
    a = {(r.z, r.x, r.y): bytes(r.data) for r in unfused.collect()}
    b = {(r.z, r.x, r.y): bytes(r.data) for r in fused.collect()}
    assert a == b


def test_fused_drop_empty_children_matches_hash_drop(spark):
    """drop_empty_children short-circuit == post-hoc sha2 hash-drop."""
    import hashlib

    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    fused_all = R.render_split_metatiles(metas, SWISSGRID_5, geoms, meta_buffer=32)
    dropped = FL.hash_drop(
        fused_all, hashlib.sha256(R.empty_tile_bytes(256)).hexdigest()
    )
    fused_pre = R.render_split_metatiles(
        metas, SWISSGRID_5, geoms, meta_buffer=32, drop_empty_children=True
    )
    a = {(r.x, r.y) for r in dropped.collect()}
    b = {(r.x, r.y) for r in fused_pre.collect()}
    assert a == b == {(6, 5), (7, 5), (5, 6), (6, 6), (4, 7), (5, 7)}
