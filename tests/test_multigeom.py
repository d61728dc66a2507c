"""Multigeom golden — reference test_multigeom (tests/test_generate.py:
1026-1099): 51 pinned tiles across z0-z3 for a layer whose geometry sources
override each other per zoom (polygon everywhere, point entry replacing it
where 10 <= resolution <= 20)."""

from pyspark.sql import functions as F

from tilecloud_chain_spark import geoms as GEO
from tilecloud_chain_spark.config import Grid, Layer, WKT_POINTS, WKT_POLYGON
from tilecloud_chain_spark.operators import filters as FL
from tilecloud_chain_spark.sources import enumerate as EN

MG_GRID = Grid(
    name="swissgrid_5",
    resolutions=(100.0, 50.0, 20.0, 10.0),
    bbox=(420000.0, 30000.0, 900000.0, 350000.0),
    tile_size=256,
    srs="EPSG:21781",
)

def test_multigeom_51_tiles_golden(spark):
    lay = Layer(name="pp", grid="swissgrid_5", meta=False)
    rows = [
        {"wkt": WKT_POLYGON},
        {"wkt": WKT_POINTS, "min_resolution": 10, "max_resolution": 20},
    ]
    geoms = GEO.resolve_geoms(MG_GRID, lay, rows)

    got = set()
    for z in range(4):
        g = geoms[z]
        tiles = EN.dense_tiles(spark, MG_GRID, [z], bounds=g.bounds())
        kept = FL.geom_intersect_filter(tiles, MG_GRID, {z: g})
        got |= {(r.z, r.x, r.y) for r in kept.collect()}

    # reference golden paths are (z, y, x); translate to (z, x, y)
    expected = set()
    for y in (5, 6, 7):
        for x in (4, 5, 6, 7):
            expected.add((0, x, y))
    for y in range(11, 16):
        for x in range(8, 15):
            expected.add((1, x, y))
    expected |= {(2, 35, 29), (2, 21, 39)}  # point tiles at z2
    expected |= {(3, 42, 78), (3, 70, 58)}  # point tiles at z3

    assert len(expected) == 51
    assert got == expected
