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
