"""Routing (J1/P3/SE3), geoms resolution (S7), post-process (F3),
serving semantics, codecs, stale-pending requeue (ST2)."""

import time

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark import geoms as GEO
from tilecloud_chain_spark.checkpoint import CheckpointStore
from tilecloud_chain_spark.config import LAYERS, Layer, SWISSGRID_5, WKT_POLYGON
from tilecloud_chain_spark.functions import image as IMG
from tilecloud_chain_spark.operators import postprocess as PP
from tilecloud_chain_spark.operators import routing as RT
from tilecloud_chain_spark.plans import serving as SV
from tilecloud_chain_spark.sources import enumerate as EN


def test_resolve_geoms_last_applicable_entry_wins():
    """Reference semantics (tilecloud_chain/__init__.py:1803-1807): each
    applicable geom source REPLACES geoms[z] — last one wins, no union
    (pinned by the multigeom golden: polygon entry is overridden by the
    point entry at the zooms the point entry covers)."""
    lay = Layer(name="l", grid="swissgrid_5", bbox=(500000, 100000, 700000, 300000))
    rows = [
        {"wkt": "POLYGON ((600000 200000, 600000 150000, 530000 150000, 530000 200000, 600000 200000))"},
        {"wkt": "POINT (600000 200000)", "min_resolution": 10, "max_resolution": 50},
    ]
    geoms = GEO.resolve_geoms(SWISSGRID_5, lay, rows)
    # z0 (res 100): point gated out -> polygon
    assert geoms[0].parts[0][0] == "polygon"
    # z1..z3 (res 50..10): point entry REPLACES the polygon
    for z in (1, 2, 3):
        assert [p[0] for p in geoms[z].parts] == ["point"], z
    # z4 (res 5): point gated out again -> polygon
    assert geoms[4].parts[0][0] == "polygon"
    # geometry outside the extent bbox is clipped away
    rows2 = [{"wkt": "POINT (420500 30500)"}]  # outside layer bbox
    geoms2 = GEO.resolve_geoms(SWISSGRID_5, lay, rows2)
    assert geoms2[0].is_empty


def test_resolve_geoms_no_rows_gives_extent_rect():
    lay = Layer(name="l", grid="swissgrid_5")
    geoms = GEO.resolve_geoms(SWISSGRID_5, lay, [])
    assert geoms[0].bounds() == SWISSGRID_5.bbox


def test_transform_bbox_lv03_lv95():
    assert GEO.transform_bbox("EPSG:21781", "EPSG:2056", (600000, 200000, 601000, 201000)) == (
        2600000, 1200000, 2601000, 1201000,
    )
    # 21781->3857 is implemented since round 2 (crs.py); genuinely unknown
    # CRS still raise
    out = GEO.transform_bbox("EPSG:21781", "EPSG:3857", (600000, 200000, 601000, 201000))
    assert out[0] < out[2] and out[1] < out[3]
    # UTM (round 3) and Lambert-93 (round 7) are implemented; a genuinely
    # unimplemented CRS (Krovak) still raises
    with pytest.raises(NotImplementedError):
        GEO.transform_bbox("EPSG:21781", "EPSG:5514", (0, 0, 1, 1))


def test_route_broadcast_join(spark):
    tiles = EN.dense_tiles(spark, SWISSGRID_5, [0]).withColumn(
        "layer", F.when(F.col("x") % 2 == 0, "line").otherwise("polygon")
    )
    config = RT.layer_config_df(spark, LAYERS)
    routed = RT.route(tiles, config)
    assert len(routed.collect()) == tiles.count()
    assert "meta_size" in routed.columns
    # after execution AQE finalizes; routing must be a broadcast join
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "ShuffleExchange" not in plan
    # unknown layer dropped (FL7)
    bad = tiles.withColumn("layer", F.lit("nope"))
    assert RT.route(bad, config).count() == 0


def test_dimension_fanout_and_reserved_params(spark):
    tiles = EN.dense_tiles(spark, SWISSGRID_5, [0]).limit(4)
    out = RT.dimension_fanout(tiles, {"DATE": ("2005", "2010", "2012")})
    assert out.count() == 12
    df = spark.createDataFrame(
        [({"SERVICE": "WMS", "custom": "1", "bbox": "x"},)], "params map<string,string>"
    )
    kept = df.select(RT.strip_reserved_params(F.col("params")).alias("p")).collect()[0].p
    assert dict(kept) == {"custom": "1"}


def test_post_process_registry(spark):
    img = IMG.synth_pixels(3, 16, 16)
    df = spark.createDataFrame([(1, bytearray(IMG.png_encode(img)))], "id int, data binary")
    out = PP.post_process(df, "png_optimize").collect()[0]
    assert IMG.png_decode(bytes(out.data)).tolist() == img.tolist()  # lossless
    lossy = PP.post_process(df, "png_quantize").collect()[0]
    assert IMG.psnr(img, IMG.png_decode(bytes(lossy.data))) >= 40
    with pytest.raises(ValueError):
        PP.post_process(df, "rm -rf /")  # not in allow-list


def test_uniform_alpha_check():
    import numpy as np

    flat = np.zeros((8, 8, 4), dtype=np.uint8)
    ok, color = PP.uniform_alpha_check(IMG.png_encode(flat))
    assert ok and color == (0, 0, 0, 0)
    # transparent pixels normalize to (0,0,0,0) regardless of RGB
    mixed = flat.copy()
    mixed[0, 0] = (99, 99, 99, 0)
    ok, color = PP.uniform_alpha_check(IMG.png_encode(mixed))
    assert ok and color == (0, 0, 0, 0)
    painted = flat.copy()
    painted[3, 3] = (255, 0, 0, 255)
    ok, _ = PP.uniform_alpha_check(IMG.png_encode(painted))
    assert not ok


def test_queue_message_json_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, 8, 16, 8, {"layer": "line"})],
        "z int, x int, y int, n int, metadata map<string,string>",
    )
    enc = df.select(
        PP.queue_message_json(F.col("z"), F.col("x"), F.col("y"), F.col("n"),
                              F.col("metadata")).alias("msg")
    )
    dec = enc.select(PP.parse_queue_message(F.col("msg")).alias("m")).select("m.*")
    r = dec.collect()[0]
    assert (r.z, r.x, r.y, r.n, dict(r.metadata)) == (0, 8, 16, 8, {"layer": "line"})


def test_redis_frame_roundtrip():
    data, trailer = PP.redis_frame_decode(PP.redis_frame_encode(b"tilebytes", {"z": 3}))
    assert data == b"tilebytes" and trailer == {"z": 3}


def test_formats():
    assert PP.size_format(512) == "512 o"
    assert PP.size_format(2048) == "2.0 Kio"
    assert PP.duration_format(3723000) == "1:02:03"
    assert PP.duration_format(90061000) == "1 1:01:01"


def test_serving_columns(spark):
    geom = G.parse_wkt(WKT_POLYGON)
    lay = Layer(name="polygon_srv", grid="swissgrid_5", geom_wkt=WKT_POLYGON,
                min_resolution_seed=10.0, meta=False)
    geoms = {z: geom for z in range(5)}
    reqs = spark.createDataFrame(
        [(0, 5, 6), (0, 0, 0), (4, 100, 100)], "z int, x int, y int"
    )
    out = {(r.z, r.x, r.y): r for r in SV.serving_columns(reqs, SWISSGRID_5, lay, geoms).collect()}
    assert SV.max_zoom_seed(SWISSGRID_5, lay) == 3
    r = out[(0, 5, 6)]
    assert r.is_seeded and not r.geom_redirect and r.static_cache_hit
    r = out[(0, 0, 0)]  # far from the polygon -> dynamic via geometry redirect
    assert r.is_seeded and r.geom_redirect and not r.static_cache_hit
    r = out[(4, 100, 100)]  # deeper than max_zoom_seed -> dynamic path
    assert not r.is_seeded and not r.static_cache_hit


def test_host_serving_decisions_multi_tenant(spark):
    """Reference host->config routing (__init__.py:1078-1106): two hosts on
    one config share the identical decision set (computed once), a third
    host's config differs only in seed depth, an unknown-layer host is
    dropped (the 400 analog), and the hosts dimension joins as a broadcast
    (never a shuffle of the tile set)."""
    from tilecloud_chain_spark.config import LAYERS

    geom = G.parse_wkt(LAYERS["point_hash"].geom_wkt)
    geoms = {z: geom for z in range(5)}
    tiles = spark.createDataFrame(
        [(0, 5, 6), (0, 0, 0), (4, 100, 100)], "z int, x int, y int"
    )
    hosts = spark.createDataFrame(
        [("a.example.com", "point_hash"), ("b.example.com", "point_hash"),
         ("c.example.com", "point"), ("bad.example.com", "nope")],
        "host string, layer string",
    )
    out = SV.host_serving_decisions(
        tiles, hosts, SWISSGRID_5, LAYERS,
        {"point_hash": geoms, "point": geoms},
    )
    rows = out.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, set()).add(
            (r.z, r.x, r.y, r.is_seeded, r.geom_redirect, r.static_cache_hit)
        )
    assert "bad.example.com" not in by_host
    assert by_host["a.example.com"] == by_host["b.example.com"]
    # point has no min_resolution_seed -> z4 is seeded there but not on
    # the point_hash config
    a_z4 = {t for t in by_host["a.example.com"] if t[0] == 4}
    c_z4 = {t for t in by_host["c.example.com"] if t[0] == 4}
    assert all(not t[3] for t in a_z4) and all(t[3] for t in c_z4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_requeue_stale_pending(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    job_id = store.create_job("stale")
    df = spark.createDataFrame([(0, 0, 0, 1, 0)], "z int, x int, y int, n int, cell long")
    store.enqueue(job_id, df)
    # simulate a worker that claimed the stage and died
    store.set_status(job_id, "tiles", 0, "pending", started_at=time.time() - 3600)
    assert store.stage_status(job_id, "tiles", 0) == "pending"
    assert store.requeue_stale_pending(job_id, max_pending_minutes=10) == [("tiles", 0)]
    assert store.stage_status(job_id, "tiles", 0) == "created"
    # fresh pending not reclaimed
    store.set_status(job_id, "tiles", 0, "pending", started_at=time.time())
    assert store.requeue_stale_pending(job_id, max_pending_minutes=10) == []
