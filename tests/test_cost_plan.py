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
