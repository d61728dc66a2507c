"""Cost-estimation plan tests (A2/A3). Count = true pipeline counts
(regression-pinned; see parity note in plans/cost.py)."""

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import Layer, SWISSGRID_5, WKT_LINE, WKT_POINTS
from tilecloud_chain_spark.plans import cost as C


def _geoms(wkt, zooms=range(5)):
    g = G.parse_wkt(wkt)
    return {z: g for z in zooms}


def test_cost_count_point(spark):
    lay = Layer(name="point", grid="swissgrid_5", geom_wkt=WKT_POINTS,
                min_resolution_seed=10.0)
    rows = {
        r.z: (r.n_metatiles, r.n_tiles)
        for r in C.cost_count(spark, SWISSGRID_5, lay, _geoms(WKT_POINTS)).collect()
    }
    # min_resolution_seed=10 prunes z4; exact buffered-intersect pipeline counts
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0] == (1, 6)
    assert rows[1] == (1, 6)
    assert rows[2] == (2, 8)
    assert rows[3] == (2, 8)
    # structural invariants: tiles >= metatiles; z-monotone work growth holds
    for z, (m, t) in rows.items():
        assert t >= m


def test_cost_count_line(spark):
    lay = Layer(name="line", grid="swissgrid_5", geom_wkt=WKT_LINE)
    rows = {
        r.z: (r.n_metatiles, r.n_tiles)
        for r in C.cost_count(spark, SWISSGRID_5, lay, _geoms(WKT_LINE)).collect()
    }
    assert rows[0] == (1, 11)
    assert rows[4] == (15, 192)
    # supercover grows roughly linearly with zoom for a segment
    tiles = [rows[z][1] for z in sorted(rows)]
    assert tiles == sorted(tiles)


def test_cost_area_point(spark):
    lay = Layer(name="point", grid="swissgrid_5", geom_wkt=WKT_POINTS,
                min_resolution_seed=10.0)
    rows = {r["z"]: r for r in C.cost_area(SWISSGRID_5, lay, _geoms(WKT_POINTS))}
    assert set(rows) == {0, 1, 2, 3}
    for z, r in rows.items():
        # area estimate of a buffered point set is small but positive
        assert r["n_tiles"] >= 1
        assert r["n_metatiles"] >= 1


def test_cost_area_vs_count_same_order(spark):
    """Area estimate and exact count agree within an order of magnitude for
    the polygon fixture (estimates are estimates)."""
    from tilecloud_chain_spark.config import WKT_POLYGON

    lay = Layer(name="polygon", grid="swissgrid_5", geom_wkt=WKT_POLYGON, meta=False)
    count = {
        r.z: r.n_tiles
        for r in C.cost_count(spark, SWISSGRID_5, lay, _geoms(WKT_POLYGON)).collect()
    }
    area = {r["z"]: r["n_tiles"] for r in C.cost_area(SWISSGRID_5, lay, _geoms(WKT_POLYGON))}
    for z in count:
        assert area[z] > 0
        ratio = count[z] / max(area[z], 1)
        assert 0.2 <= ratio <= 5.0, (z, count[z], area[z])


def test_cost_count_point_reference_parity(spark):
    """A2 CLOSED — the reference generate-cost count goldens
    (/root/reference/tilecloud_chain/tests/test_cost.py:80-112: point layer,
    count algo: 1/1/6/2 metatiles, 64/64/339/112 tiles) reproduce EXACTLY
    under tilecloud_parity=True. Root cause of the historical divergence:
    IntersectGeometryFilter passes the border to tilecloud's
    FreeTileGrid.extent as METERS (resolution * px_buffer,
    tilecloud_chain/__init__.py:2670) while that extent() treats border in
    PIXEL units — the effective buffer is px_buffer * resolution**2 meters
    (51.2 km at z2, 12.8 km at z3 for the 128 px buffer), which is why no
    physically-consistent semantics could fit both zooms."""
    lay = Layer(name="point", grid="swissgrid_5", geom_wkt=WKT_POINTS,
                min_resolution_seed=10.0)
    rows = {
        r.z: (r.n_metatiles, r.n_tiles)
        for r in C.cost_count(
            spark, SWISSGRID_5, lay, _geoms(WKT_POINTS), tilecloud_parity=True
        ).collect()
    }
    assert rows == {
        0: (1, 64),
        1: (1, 64),
        2: (6, 339),
        3: (2, 112),
    }


def test_generate_zoom_list_counts_reference_parity(spark):
    """The generate zoom_list count golden chain
    (tests/test_generate.py:1347-1377, point_hash layer, zooms 0,2,3:
    '9 generated metatiles / 4 dropped / 320 generated tiles') reproduces
    under the same px-units border rule: 19 dense-enumerated metatiles ->
    9 pass the geom filter -> the 4 containing no point are dropped by
    empty-metatile detection -> 5 x 64 = 320 generated tiles."""
    from pyspark.sql import functions as F

    from tilecloud_chain_spark.config import LAYERS
    from tilecloud_chain_spark.sources import enumerate as EN
    from tilecloud_chain_spark.operators import filters as FL

    lay = LAYERS["point_hash"]
    geom = G.parse_wkt(WKT_POINTS)
    geoms = {z: geom for z in (0, 2, 3)}
    enumerated = 0
    passed = None
    for z in (0, 2, 3):
        df = EN.dense_metatiles(
            spark, SWISSGRID_5, [z], n=8, bounds=geom.bounds(),
            px_buffer=lay.px_buffer,
        )
        enumerated += df.count()
        bpx = lay.filter_buffer_px() * float(SWISSGRID_5.resolutions[z])
        part = FL.geom_intersect_filter(df, SWISSGRID_5, geoms, buffer_px=bpx, n="n")
        passed = part if passed is None else passed.unionAll(part)
    passed = passed.cache()
    n_generated_meta = passed.count()
    # empty-metatile detection: a metatile whose UNBUFFERED extent contains
    # no point renders as the empty metatile and is hash-dropped
    nonempty = FL.geom_intersect_filter(passed, SWISSGRID_5, geoms, buffer_px=0.0, n="n")
    n_nonempty = nonempty.count()
    assert enumerated == 19
    assert n_generated_meta == 9
    assert n_generated_meta - n_nonempty == 4  # metatiles dropped
    assert n_nonempty * 64 == 320  # generated tiles
