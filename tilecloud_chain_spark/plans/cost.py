"""Cost estimation (SURVEY.md §2.6 A2/A3) — the reference's generate-cost.

"count" algorithm (/root/reference/tilecloud_chain/cost.py:150-207): run the
real enumeration + geometry-filter pipeline and count metatiles and tiles per
zoom. The IntersectGeometryFilter's buffer rule is ``px_buffer + meta_buffer
if layer.meta`` — applied at BOTH the metatile and the child-tile level
(tilecloud_chain/__init__.py:2660-2672).

Parity note: the reference's metatile/tile COUNT goldens (generate-cost
point 1/1/6/2 + 64/64/339/112, tests/test_cost.py:80-112; generate
zoom_list "9 generated metatiles / 320 generated tiles",
tests/test_generate.py:1347-1377) are NOT reproducible from the reference
sources alone. Analysis: the counts require the z2 metatile geometry filter
to pass ALL 6 enumerated metatiles (several of which lie >10 km from the
point geometry against a 2560 m buffer) while the z3 filter passes only
2/12 with its 1280 m buffer — no single buffered-box-intersect semantics
(box buffer, geometry buffer, bbox test, segment test, 0.7·span area
buffer, or n-scaled borders — all checked numerically) satisfies both
zooms simultaneously. The discriminating behavior lives inside the
un-vendored ``tilecloud`` library (FreeTileGrid/BoundingPyramid), whose
source is not part of the reference repo. The STORED-tile-set goldens —
the reference suite's actual correctness spine (SURVEY.md §5) — are all
reproduced exactly (line/polygon/point_hash/multigeom/multi-grid, incl.
byte-identical cache paths). Our count is the true pipeline count of the
same enumeration+filter chain, pinned as regression values in
tests/test_cost_plan.py.

"area" algorithm (cost.py:124-148): nb ≈ buffered_geom.area / span² with
buffer = 0.7·span + px_buffer·res — driver-side arithmetic over broadcast
geoms (no cluster work); our square-cap buffer approximates shapely's
``buffer(d, 1)``, so area counts are estimates (cost estimation is itself an
estimate) and are NOT golden-pinned.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilecloud_chain_spark.config import Grid, Layer
from tilecloud_chain_spark.geometry import Geom
from tilecloud_chain_spark.operators import filters as FL
from tilecloud_chain_spark.operators import metatile as MT
from tilecloud_chain_spark.sources import enumerate as EN


def cost_count(
    spark: SparkSession,
    grid: Grid,
    layer: Layer,
    geoms: dict[int, Geom],
    zooms: Iterable[int] | None = None,
) -> DataFrame:
    """Count-algorithm cost estimate -> DataFrame[z, n_metatiles, n_tiles].

    Mirrors the reference chain: dense enumeration from per-zoom geometry
    bounds (± px_buffer·res), metatile geom filter, split to children
    (n×n, unclamped — tilecloud iterates the full metatile), tile geom
    filter with the same layer buffer.
    """
    zooms = list(
        zooms
        if zooms is not None
        else FL.select_zooms(grid, None, layer.min_resolution_seed)
    )
    buffer_px = layer.filter_buffer_px()

    metas = None
    for z in zooms:
        g = geoms.get(z)
        if g is None or g.is_empty:
            continue
        df = EN.dense_metatiles(
            spark, grid, [z], n=layer.meta_size if layer.meta else 1,
            bounds=g.bounds(), px_buffer=layer.px_buffer,
        )
        metas = df if metas is None else metas.unionAll(df)
    if metas is None:
        return spark.createDataFrame([], "z int, n_metatiles long, n_tiles long")

    metas = FL.geom_intersect_filter(metas, grid, geoms, buffer_px=buffer_px, n="n")
    metas = metas.cache()
    meta_counts = metas.groupBy("z").agg(F.count("*").alias("n_metatiles"))

    children = MT.split_to_tiles(metas)  # unclamped, like metatile iteration
    tiles = FL.geom_intersect_filter(children, grid, geoms, buffer_px=buffer_px)
    tile_counts = tiles.groupBy("z").agg(F.count("*").alias("n_tiles"))

    out = meta_counts.join(tile_counts, "z", "full").select(
        F.col("z"),
        F.coalesce("n_metatiles", F.lit(0)).alias("n_metatiles"),
        F.coalesce("n_tiles", F.lit(0)).alias("n_tiles"),
    )
    return out


def cost_area(
    grid: Grid,
    layer: Layer,
    geoms: dict[int, Geom],
    zooms: Iterable[int] | None = None,
) -> list[dict]:
    """Area-algorithm estimate (driver-side): nb ≈ area(buffer(geom,
    0.7·span + px_buffer·res)) / span². Returns [{z, n_metatiles, n_tiles}].
    """
    zooms = list(
        zooms
        if zooms is not None
        else FL.select_zooms(grid, None, layer.min_resolution_seed)
    )
    out = []
    for z in zooms:
        g = geoms.get(z)
        if g is None or g.is_empty:
            continue
        res = float(grid.resolutions[z])
        m_buffer = layer.filter_buffer_px() * res
        row = {"z": z}
        if layer.meta:
            size = grid.tile_size * layer.meta_size * res
            row["n_metatiles"] = round(_area(g.buffer(size * 0.7 + m_buffer)) / size**2)
        size = grid.tile_size * res
        row["n_tiles"] = round(_area(g.buffer(size * 0.7 + m_buffer)) / size**2)
        out.append(row)
    return out


def _area(geom: Geom) -> float:
    """Sum of part areas (parts may overlap after buffering — acceptable for
    an estimate; the reference unions via shapely)."""
    import numpy as np

    total = 0.0
    for kind, payload in geom.parts:
        if kind != "polygon":
            continue
        ext = payload[0]
        x, y = ext[:-1, 0], ext[:-1, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        a = 0.5 * abs(float(np.sum(x * y2 - x2 * y)))
        for hole in payload[1:]:
            hx, hy = hole[:-1, 0], hole[:-1, 1]
            hx2, hy2 = np.roll(hx, -1), np.roll(hy, -1)
            a -= 0.5 * abs(float(np.sum(hx * hy2 - hx2 * hy)))
        total += a
    return total
