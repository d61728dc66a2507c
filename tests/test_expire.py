"""Expire-tiles import analog — pinned against the reference's own expected
MULTIPOLYGON coordinates (reference tests/test_expiretiles.py:38-141: six
z18 tiles in a staircase fuse into ONE ring that keeps collinear lattice
corners; the srid=21781 variant doubles as an independent PostGIS-computed
pin for the 3857->LV03 CRS chain)."""

import re

import pytest

from tilecloud_chain_spark.operators import expire as EX

TILES = [
    (18, 135900, 92720),
    (18, 135900, 92721),
    (18, 135900, 92722),
    (18, 135901, 92721),
    (18, 135901, 92722),
    (18, 135902, 92722),
]

# reference tests/test_expiretiles.py:118-141 (srid left at 3857)
GOLDEN_3857 = [
    (738534.567188568, 5862720.06865692),
    (738534.567188568, 5862567.19460037),
    (738381.693132021, 5862567.19460037),
    (738228.819075469, 5862567.19460037),
    (738075.945018921, 5862567.19460037),
    (738075.945018921, 5862720.06865692),
    (738075.945018921, 5862872.94271347),
    (738075.945018921, 5863025.81677002),
    (738228.819075469, 5863025.81677002),
    (738228.819075469, 5862872.94271347),
    (738381.693132021, 5862872.94271347),
    (738381.693132021, 5862720.06865692),
    (738534.567188568, 5862720.06865692),
]

# reference tests/test_expiretiles.py:38-52 (srid=21781, PostGIS
# ST_Transform through proj — pins our somerc+datum chain independently)
GOLDEN_21781 = [
    (538274.006497397, 151463.940954133),
    (538272.927475664, 151358.882137848),
    (538167.532395446, 151359.965536437),
    (538062.137334338, 151361.050781072),
    (537956.742292377, 151362.137871759),
    (537957.826834589, 151467.19663084),
    (537958.911357866, 151572.253567259),
    (537959.995862209, 151677.308681051),
    (538065.385383791, 151676.221647663),
    (538064.302719542, 151571.166514773),
    (538169.694100363, 151570.08130827),
    (538168.61325734, 151465.024333685),
    (538274.006497397, 151463.940954133),
]


def _parse(wkt: str):
    m = re.fullmatch(r"MULTIPOLYGON\(\(\(([0-9\.\-e ,]+)\)\)\)", wkt)
    assert m, wkt
    return [tuple(float(c) for c in p.split(" ")) for p in m.group(1).split(",")]


@pytest.fixture()
def tiles_df(spark):
    return spark.createDataFrame(TILES, "z int, x long, y long")


def test_expire_golden_3857(spark, tiles_df):
    got = _parse(EX.expire_tiles_wkt(tiles_df))
    assert len(got) == len(GOLDEN_3857)
    for (gx, gy), (ex, ey) in zip(got, GOLDEN_3857):
        assert gx == pytest.approx(ex, abs=1e-6)
        assert gy == pytest.approx(ey, abs=1e-6)


def test_expire_golden_21781_via_crs_chain(spark, tiles_df):
    """The reference's PostGIS-transformed coordinates, reproduced through
    our own 3857->WGS84->CH1903 numpy chain at the reference's own 1e-6 m
    tolerance (measured agreement: ~5e-9 m)."""
    got = _parse(EX.expire_tiles_wkt(tiles_df, srid=21781))
    assert len(got) == len(GOLDEN_21781)
    for (gx, gy), (ex, ey) in zip(got, GOLDEN_21781):
        assert gx == pytest.approx(ex, abs=1e-6)
        assert gy == pytest.approx(ey, abs=1e-6)


def test_corner_touching_tiles_stay_separate(spark):
    df = spark.createDataFrame([(3, 1, 1), (3, 2, 2)], "z int, x long, y long")
    polys = EX.expire_polygons(df)
    assert len(polys) == 2 and all(not p["holes"] for p in polys)


def test_donut_has_hole(spark):
    ring_tiles = [
        (4, x, y)
        for x in range(3)
        for y in range(3)
        if not (x == 1 and y == 1)
    ]
    df = spark.createDataFrame(ring_tiles, "z int, x long, y long")
    polys = EX.expire_polygons(df)
    assert len(polys) == 1 and len(polys[0]["holes"]) == 1
    # hole is the unit square of the missing center tile
    assert len(polys[0]["holes"][0]) == 4


def test_mixed_zoom_dyadic_union(spark):
    """A z3 tile and one of its own z4 children union to just the z3 square
    (the child is fully covered)."""
    df = spark.createDataFrame([(3, 2, 5), (4, 4, 10)], "z int, x long, y long")
    polys = EX.expire_polygons(df)
    assert len(polys) == 1 and not polys[0]["holes"]
    ext = polys[0]["exterior"]
    # z3 tile (2,5) on the z4 lattice: corners (4..6, 10..12); the square's
    # boundary keeps the collinear midpoints -> 8 vertices
    assert set(ext) == {
        (4, 10), (5, 10), (6, 10), (6, 11), (6, 12), (5, 12), (4, 12), (4, 11)
    }


def test_empty_input(spark):
    df = spark.createDataFrame([], "z int, x long, y long")
    assert EX.expire_tiles_wkt(df) == ""


def test_scattered_list_raises_boundary_cap(spark):
    """The degenerate case: a fully scattered tile list yields one 4-edge
    rectangle per tile — O(n) boundary edges, not O(perimeter). The cap must
    fail loudly instead of collecting it all to the driver."""
    import pytest
    from pyspark.sql import functions as F

    # 500 isolated tiles (stride 3 so nothing touches) = 2000 boundary edges
    scattered = spark.range(500).select(
        F.lit(14).alias("z"),
        (F.col("id") % 50 * 3).alias("x"),
        ((F.col("id") / 50).cast("long") * 3).alias("y"),
    )
    with pytest.raises(ValueError, match="too scattered"):
        EX.expire_polygons(scattered, max_boundary_edges=1000)
    # a contiguous blob of the same tile count stays under the cap
    blob = spark.range(500).select(
        F.lit(14).alias("z"),
        (F.col("id") % 25).alias("x"),
        (F.col("id") / 25).cast("long").alias("y"),
    )
    polys = EX.expire_polygons(blob, max_boundary_edges=1000)
    assert len(polys) == 1
