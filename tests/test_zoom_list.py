"""zoom_list stored-set golden — reference tests/test_generate.py:1347-1377:
point_hash with --zoom 0,2,3 stores exactly the 6 point tiles across the
three zooms (paths (z,y,x): (0,5,7),(0,7,4),(2,29,35),(2,39,21),
(3,58,70),(3,78,42))."""

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.checkpoint import CheckpointStore
from tilecloud_chain_spark.config import LAYERS, SWISSGRID_5, WKT_POINTS
from tilecloud_chain_spark.plans import pipeline as P


def test_zoom_list_stored_golden(spark, tmp_path):
    geom = G.parse_wkt(WKT_POINTS)
    zooms = [0, 2, 3]
    geoms = {z: geom for z in zooms}
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    job_id = P.generate_tiles(
        spark, SWISSGRID_5, LAYERS["point_hash"], geoms, store,
        zooms=zooms, meta_buffer=32,
    )
    out = store.output(job_id, "tiles")
    got = {(r.z, r.x, r.y) for r in out.select("z", "x", "y").collect()}
    # golden (z,y,x) -> (z,x,y)
    assert got == {
        (0, 7, 5), (0, 4, 7),
        (2, 35, 29), (2, 21, 39),
        (3, 70, 58), (3, 42, 78),
    }


def test_px_buffer_stored_golden(spark, tmp_path):
    """test_py_buffer (tests/test_generate.py:1319-1345): point_px_buffer
    (px_buffer=100) zooms 0-2 stores exactly the point tiles:
    (z,y,x) (0,5,7),(0,7,4),(1,11,14),(1,15,8),(2,29,35),(2,39,21)."""
    from tilecloud_chain_spark.config import Layer

    lay = Layer(name="point_px_buffer", grid="swissgrid_5", geom_wkt=WKT_POINTS,
                px_buffer=100.0)
    geoms = {z: G.parse_wkt(WKT_POINTS) for z in (0, 1, 2)}
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    job_id = P.generate_tiles(spark, SWISSGRID_5, lay, geoms, store,
                              zooms=[0, 1, 2], meta_buffer=32)
    got = {(r.z, r.x, r.y) for r in store.output(job_id, "tiles").collect()}
    assert got == {
        (0, 7, 5), (0, 4, 7),
        (1, 14, 11), (1, 8, 15),
        (2, 35, 29), (2, 21, 39),
    }


def test_zoom_identifier_first_metatile_golden(spark, tmp_path):
    """test_zoom_identifier (tests/test_generate.py:1102-1134): polygon2 on
    swissgrid_01 (res [1,0.2,0.1]) z0, first metatile only (-t 1):
    21 stored tiles = rows 585..591 x cols 429..431."""
    from pyspark.sql import functions as F

    from tilecloud_chain_spark.config import SWISSGRID_01, WKT_POLYGON
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.operators import raster as R
    from tilecloud_chain_spark.sources import enumerate as EN

    geom = G.parse_wkt(WKT_POLYGON)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_01, geoms, [0], n=8)
    metas = FL.geom_intersect_filter(metas, SWISSGRID_01, geoms,
                                     buffer_px=128, n="n")
    first = metas.orderBy("z", "y", "x").limit(1)  # the reference's -t 1
    assert [(r.x, r.y) for r in first.collect()] == [(424, 584)]
    stored = R.render_split_metatiles(
        first, SWISSGRID_01, geoms, meta_buffer=32, drop_empty_children=True
    )
    got = {(r.x, r.y) for r in stored.collect()}
    assert got == {(col, row) for col in range(429, 432) for row in range(585, 592)}
    assert len(got) == 21  # golden: 64 generated, 43 dropped, 21 stored
