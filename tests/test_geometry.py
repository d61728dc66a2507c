"""Geometry-kernel unit tests pinned to reference fixture behavior."""

import numpy as np

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import (
    SWISSGRID_5,
    WKT_LINE,
    WKT_POINTS,
    WKT_POLYGON,
)


def test_parse_wkt_bounds():
    assert G.parse_wkt(WKT_POINTS).bounds() == (530000, 150000, 600000, 200000)
    assert G.parse_wkt(WKT_LINE).bounds() == (530000, 150000, 600000, 200000)
    assert G.parse_wkt(WKT_POLYGON).bounds() == (530000, 150000, 600000, 200000)


def _tile_boxes(grid, zoom, coords):
    return np.array([grid.tile_extent(zoom, x, y) for x, y in coords])


def test_line_supercover_matches_reference_stored_set():
    """Reference golden (tests/test_generate.py:935-977): layer `line`, z0
    stored tiles (z, y, x) = {(0,5,6),(0,5,7),(0,6,5),(0,6,6),(0,7,4),(0,7,5)}
    == tiles whose extent intersects the segment."""
    geom = G.parse_wkt(WKT_LINE)
    coords = [(x, y) for x in range(19) for y in range(13)]
    boxes = _tile_boxes(SWISSGRID_5, 0, coords)
    hits = geom.intersects_boxes(boxes)
    got = {c for c, h in zip(coords, hits) if h}
    assert got == {(6, 5), (7, 5), (5, 6), (6, 6), (4, 7), (5, 7)}


def test_polygon_tiles_z0_golden():
    """Reference golden (tests/test_generate.py:1384-1406): polygon z0 =
    product(y in (5,6,7), x in (4,5,6,7))."""
    geom = G.parse_wkt(WKT_POLYGON)
    coords = [(x, y) for x in range(19) for y in range(13)]
    boxes = _tile_boxes(SWISSGRID_5, 0, coords)
    hits = geom.intersects_boxes(boxes)
    got = {c for c, h in zip(coords, hits) if h}
    assert got == {(x, y) for x in (4, 5, 6, 7) for y in (5, 6, 7)}


def test_points_tiles_z0_golden():
    """point_hash stored set (tests/test_generate.py:1474-1499):
    (z,y,x) {(5,7),(7,4)} -> (x,y) {(7,5),(4,7)}."""
    geom = G.parse_wkt(WKT_POINTS)
    coords = [(x, y) for x in range(19) for y in range(13)]
    boxes = _tile_boxes(SWISSGRID_5, 0, coords)
    got = {c for c, h in zip(coords, geom.intersects_boxes(boxes)) if h}
    assert got == {(7, 5), (4, 7)}


def test_clip_keeps_parts_separate():
    g = G.union(G.box_geom(0.2, 4.2, 1.8, 4.8), G.box_geom(3.2, 4.2, 3.8, 4.8))
    band = g.clip_to_box((0, 4, 8, 5))
    assert len(band.parts) == 2


def test_contains_points_polygon():
    g = G.parse_wkt(WKT_POLYGON)
    px = np.array([565000.0, 600000.0, 601000.0, 420000.0])
    py = np.array([175000.0, 200000.0, 175000.0, 30000.0])
    assert g.contains_points(px, py).tolist() == [True, True, False, False]


def test_buffer_point_square():
    g = G.parse_wkt("POINT (10 10)").buffer(2.0)
    assert g.bounds() == (8, 8, 12, 12)
    boxes = np.array([[7, 7, 7.5, 7.5], [7, 7, 8.5, 8.5]])
    assert g.intersects_boxes(boxes).tolist() == [False, True]


def test_segment_box_boundary_touch_counts():
    g = G.parse_wkt("LINESTRING (0 0, 10 0)")
    boxes = np.array([[2, 0, 3, 1], [2, -1, 3, 0], [2, 0.1, 3, 1]])
    assert g.intersects_boxes(boxes).tolist() == [True, True, False]
