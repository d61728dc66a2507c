"""Property-based tests (hypothesis) for the float floor/ceil boundary risks
called out in SURVEY.md §7.3 — random bboxes/points vs straight-port oracle
formulas of the reference."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import Grid, SWISSGRID_5
from tilecloud_chain_spark.sources.enumerate import (
    dense_range,
    merge_index_intervals,
    plan_sparse_metatiles,
)

coord_x = st.floats(min_value=420000, max_value=900000, allow_nan=False)
coord_y = st.floats(min_value=30000, max_value=350000, allow_nan=False)
zoom = st.integers(min_value=0, max_value=4)


@given(zoom, coord_x, coord_y)
@settings(max_examples=200, deadline=None)
def test_tile_at_matches_reference_formula(z, x, y):
    """tile_at == floor((x-minx)/span), floor((maxy-y)/span) — the reference
    index math (tilecloud_chain/__init__.py:457-491)."""
    g = SWISSGRID_5
    span = g.resolutions[z] * g.tile_size
    tx, ty = g.tile_at(z, x, y)
    assert tx == math.floor((x - g.bbox[0]) / span)
    assert ty == math.floor((g.bbox[3] - y) / span)


@given(zoom, coord_x, coord_x, coord_y, coord_y)
@settings(max_examples=200, deadline=None)
def test_dense_range_brute_force(z, x1, x2, y1, y2):
    """dense_range == clamp(floor(corner indices)) for any bbox inside the
    grid (reference _get_default_grid_tilecoords corner-floor semantics)."""
    g = SWISSGRID_5
    b = (min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2))
    rng = dense_range(g, z, b)
    span = g.resolutions[z] * g.tile_size
    w, h = g.matrix_size(z)

    def clamp(v, hi):
        return max(0, min(hi - 1, v))

    ex0 = clamp(math.floor((b[0] - g.bbox[0]) / span), w)
    ex1 = clamp(math.floor((b[2] - g.bbox[0]) / span), w)
    ey0 = clamp(math.floor((g.bbox[3] - b[3]) / span), h)
    ey1 = clamp(math.floor((g.bbox[3] - b[1]) / span), h)
    assert rng == (ex0, ex1, ey0, ey1)


@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 100)), max_size=20))
@settings(max_examples=200, deadline=None)
def test_merge_intervals_properties(raw):
    ivs = [(min(a, b), max(a, b)) for a, b in raw]
    merged = merge_index_intervals(ivs)
    # sorted, disjoint with gaps > 1, same covered set
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        assert s2 > e1 + 1
    covered = set()
    for s, e in merged:
        covered |= set(range(s, e + 1))
    expected = set()
    for s, e in ivs:
        expected |= set(range(s, e + 1))
    assert covered == expected


@given(coord_x, coord_y, coord_x, coord_y)
@settings(max_examples=100, deadline=None)
def test_segment_supercover_contains_endpoints_and_is_connected(x1, y1, x2, y2):
    """Tiles crossed by any segment: endpoint tiles always included; the set
    forms a connected 8-neighborhood path."""
    g = SWISSGRID_5
    geom = G.Geom([("line", np.array([[x1, y1], [x2, y2]]))])
    w, h = g.matrix_size(0)
    coords = [(x, y) for x in range(w) for y in range(h)]
    boxes = np.array([g.tile_extent(0, x, y) for x, y in coords])
    hit = {c for c, m in zip(coords, geom.intersects_boxes(boxes)) if m}
    t1 = g.tile_at(0, x1, y1)
    t2 = g.tile_at(0, x2, y2)
    assert (min(t1[0], w - 1), min(t1[1], h - 1)) in hit
    assert (min(t2[0], w - 1), min(t2[1], h - 1)) in hit
    # connectivity (8-neighborhood flood from t1 reaches every hit tile)
    seen = {t1 if t1 in hit else next(iter(hit))}
    frontier = list(seen)
    while frontier:
        cx, cy = frontier.pop()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in hit and nb not in seen:
                    seen.add(nb)
                    frontier.append(nb)
    assert seen == hit


@given(
    st.integers(0, 2),
    st.floats(0.1, 7.9).map(lambda v: round(v, 3)),
    st.floats(0.1, 7.9).map(lambda v: round(v, 3)),
    st.floats(0.05, 2.0).map(lambda v: round(v, 3)),
    st.floats(0.05, 2.0).map(lambda v: round(v, 3)),
)
@settings(max_examples=100, deadline=None)
def test_sparse_covers_every_geometry_tile(z, cx, cy, wbox, hbox):
    """Sparse metatile enumeration is a superset of the metatiles containing
    any part of the geometry (no false pruning — the correctness property
    that matters; exactness per-row is pinned by the reference golden).

    Coordinates are quantized to 1e-3: at exact double-representability
    boundaries (e.g. 8 - 0.9999999999999998 == 7.0) the spec formula itself
    collapses the sliver — our engine reproduces the reference's double math
    bit-for-bit there, but a differently-associated test oracle would not
    (SURVEY.md §7.3 float-boundary caveat). The DERIVED bbox is re-quantized
    too: quantized inputs are not enough — e.g. cy=1.9, hbox=1.8 gives
    1.9 - 0.9 = 0.9999999999999998, re-creating a sub-ulp sliver that the
    engine's reference-exact double math collapses but this test's strict
    comparison would not (hypothesis found exactly that example)."""
    grid = Grid(name="u", resolutions=(1.0, 0.5, 0.25), bbox=(0, 0, 8, 8), tile_size=1)
    b = (max(0.0, round(cx - wbox / 2, 3)), max(0.0, round(cy - hbox / 2, 3)),
         min(8.0, round(cx + wbox / 2, 3)), min(8.0, round(cy + hbox / 2, 3)))
    if b[0] >= b[2] or b[1] >= b[3]:
        return
    geom = G.box_geom(*b)
    n = 2
    metas = set(plan_sparse_metatiles(grid, {z: geom}, [z], n=n))
    span = grid.resolutions[z] * grid.tile_size * n
    w, h = grid.matrix_size(z, n)
    required = set()
    for mx in range(w):
        for my in range(h):
            ext = (mx * span, 8 - (my + 1) * span, (mx + 1) * span, 8 - my * span)
            # strictly-overlapping (not just touching) metatiles must be found
            if ext[0] < b[2] and ext[2] > b[0] and ext[1] < b[3] and ext[3] > b[1]:
                required.add((z, mx * n, my * n, n))
    assert required <= metas


def test_cell_key_roundtrip_extreme_indices(spark):
    """Integer-shift unpack must be exact for x,y up to 2^29-1 — the float-
    division formulation went off-by-one past x=2^24 with y near 2^29
    (advisor finding, round 2)."""
    from pyspark.sql import functions as F

    from tilecloud_chain_spark.functions import gridmath as GM

    m = (1 << 29) - 1
    rows = [(z, x, y) for z in (0, 17, 31)
            for x in (0, 1, (1 << 24) + 1, m - 1, m)
            for y in (0, 1, m - 1, m)]
    df = spark.createDataFrame(rows, "z int, x int, y int")
    packed = df.select("z", "x", "y", GM.cell_key(F.col("z"), F.col("x"), F.col("y")))
    uz, ux, uy = GM.cell_unpack(F.col("cell"))
    back = packed.select(
        "z", "x", "y", uz.alias("z2"), ux.alias("x2"), uy.alias("y2")
    )
    bad = back.filter(
        (F.col("z") != F.col("z2")) | (F.col("x") != F.col("x2")) | (F.col("y") != F.col("y2"))
    )
    assert bad.count() == 0


def test_process_filter_matches_python_round(spark):
    """The modulo partitioner must agree with the reference's Python round()
    (banker's rounding) INCLUDING the exact-.5 cases (x+y ≡ n/2 mod n)."""
    from pyspark.sql import functions as F

    from tilecloud_chain_spark.functions import gridmath as GM

    n, nb = 8, 3
    rows = [(z, x, y) for z in range(3) for x in range(0, 24) for y in range(0, 24)]
    df = spark.createDataFrame(rows, "z int, x int, y int")
    got = {
        (r.z, r.x, r.y): r.keep
        for r in df.select(
            "z", "x", "y",
            GM.process_filter_keep(F.col("z"), F.col("x"), F.col("y"), n, nb, 1).alias("keep"),
        ).collect()
    }
    for z, x, y in rows:
        want = round(z + x / n + y / n) % nb == 1
        assert got[(z, x, y)] == want, (z, x, y, round(z + x / n + y / n))


@given(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_mercator_roundtrip_property(lon, lat):
    from tilecloud_chain_spark import crs

    x, y = crs.merc_fwd(lon, lat)
    lon2, lat2 = crs.merc_inv(x, y)
    assert math.isclose(float(lon2), lon, abs_tol=1e-9)
    assert math.isclose(float(lat2), lat, abs_tol=1e-9)


@given(
    st.floats(min_value=450000, max_value=850000, allow_nan=False),
    st.floats(min_value=50000, max_value=320000, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_swiss_roundtrip_property(e, n):
    from tilecloud_chain_spark import crs

    lon, lat = crs.transform_coords("EPSG:21781", "EPSG:4326", e, n)
    e2, n2 = crs.transform_coords("EPSG:4326", "EPSG:21781", lon, lat)
    assert math.isclose(float(e2), e, abs_tol=0.005)
    assert math.isclose(float(n2), n, abs_tol=0.005)
