"""Driver-side enumeration planning tests (no Spark) against reference goldens."""

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import (
    Grid,
    SWISSGRID_5,
    WKT_LINE,
    WKT_POINTS,
)
from tilecloud_chain_spark.sources.enumerate import (
    dense_range,
    merge_index_intervals,
    metatile_range,
    plan_sparse_metatiles,
)


def test_merge_index_intervals_golden():
    """Pinned by reference tests/test_generate.py:202-206."""
    assert merge_index_intervals([(5, 7), (1, 3), (3, 4), (9, 9), (8, 8)]) == [(1, 9)]


def test_sparse_metatilecoords_split_by_row_golden():
    """Pinned by reference tests/test_generate.py:252-276: 8x8 unit grid,
    three disjoint boxes -> [(0,0,3,1),(0,1,3,1),(0,3,3,1),(0,6,5,1)]."""
    grid = Grid(name="unit", resolutions=(1.0,), bbox=(0, 0, 8, 8), tile_size=1)
    geom = G.union(
        G.box_geom(0.2, 4.2, 1.8, 4.8),
        G.box_geom(3.2, 4.2, 3.8, 4.8),
        G.box_geom(6.2, 2.2, 6.8, 2.8),
    )
    got = list(plan_sparse_metatiles(grid, {0: geom}, [0], n=1))
    assert got == [(0, 0, 3, 1), (0, 1, 3, 1), (0, 3, 3, 1), (0, 6, 5, 1)]


def test_dense_range_bbox_golden():
    """test_layer_bbox (tests/test_generate.py:1384-1428): bbox
    [550000,170000,560000,180000] z0 -> tiles (y,x) {(6,5),(7,5)}."""
    rng = dense_range(SWISSGRID_5, 0, (550000, 170000, 560000, 180000))
    assert rng == (5, 5, 6, 7)


def test_dense_range_polygon_bounds():
    g = G.parse_wkt("POLYGON ((600000 200000, 600000 150000, 530000 150000, 530000 200000, 600000 200000))")
    rng = dense_range(SWISSGRID_5, 0, g.bounds())
    assert rng == (4, 7, 5, 7)


def test_dense_range_full_grid_matrix():
    rng = dense_range(SWISSGRID_5, 0, SWISSGRID_5.bbox)
    assert rng == (0, 18, 0, 12)
    assert SWISSGRID_5.matrix_size(0) == (19, 13)
    assert SWISSGRID_5.matrix_size(1) == (38, 25)


def test_metatile_range_rounding():
    assert metatile_range((4, 7, 5, 7), 8) == (0, 0, 0, 0)
    assert metatile_range((7, 9, 0, 8), 8) == (0, 1, 0, 1)


def test_sparse_line_z0_single_metatile():
    """Line layer z0 with meta 8x8: the whole line lives in metatile (0,0)
    (golden: 1 metatile -> 64 generated tiles, tests/test_generate.py:935-977)."""
    geom = G.parse_wkt(WKT_LINE)
    got = list(plan_sparse_metatiles(SWISSGRID_5, {0: geom}, [0], n=8))
    assert got == [(0, 0, 0, 8)]


def test_sparse_points_z2():
    """Points at z2 (res 20, metatile span 40960m): two separate metatiles."""
    geom = G.parse_wkt(WKT_POINTS)
    got = set(plan_sparse_metatiles(SWISSGRID_5, {2: geom}, [2], n=8))
    # point1 (600000,200000): x=floor(180000/40960)=4, y=floor(150000/40960)=3
    # point2 (530000,150000): x=floor(110000/40960)=2, y=floor(200000/40960)=4
    assert got == {(2, 32, 24, 8), (2, 16, 32, 8)}
