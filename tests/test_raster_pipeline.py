"""End-to-end image-path pipeline: render -> hash-drop -> split -> store.

Reproduces the reference's pinned generated/dropped/stored counts through
the ACTUAL image path (not just coordinate math): empty children are
byte-identical constant tiles eliminated by the sha2 hash dropper, exactly
like the reference's empty_tile_detection (HashDropper,
tilecloud_chain/__init__.py:2442-2493; golden counts
tests/test_generate.py:935-977,1474-1499).
"""

import pyspark.sql.functions as F
import pytest

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import LAYERS, SWISSGRID_5
from tilecloud_chain_spark.functions import image as IMG
from tilecloud_chain_spark.operators import filters as FL
from tilecloud_chain_spark.operators import raster as R
from tilecloud_chain_spark.sources import enumerate as EN
from tilecloud_chain_spark.sources.images import synth_images

TS = 256  # must equal grid.tile_size: pixel spans are world-anchored
MB = 128  # reference meta_buffer default (configuration.py:1117)


def _sha256(b: bytes) -> str:
    import hashlib

    return hashlib.sha256(b).hexdigest()


def test_line_image_pipeline_golden_counts(spark):
    """line z0: 1 metatile -> 64 generated, 58 hash-dropped, 6 stored, and
    the stored set matches the reference's pinned tile coordinates."""
    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    metas = FL.geom_intersect_filter(
        metas, SWISSGRID_5, geoms, buffer_px=LAYERS["line"].filter_buffer_px(), n="n"
    )
    rendered = R.render_metatiles(metas, SWISSGRID_5, geoms, tile_size=TS, meta_buffer=MB)
    children = R.split_metatile_images(
        rendered, tile_size=TS, meta_buffer=MB, clamp_matrix=SWISSGRID_5.matrix_size(0)
    )
    children = children.cache()
    assert children.count() == 64

    empty_hash = _sha256(R.empty_tile_bytes(TS))
    stored = FL.hash_drop(children, empty_hash)
    rows = stored.select("x", "y").collect()
    got = {(r.x, r.y) for r in rows}
    assert got == {(6, 5), (7, 5), (5, 6), (6, 6), (4, 7), (5, 7)}
    children.unpersist()


def test_point_hash_image_pipeline_golden(spark):
    """point_hash z0: 64 generated, 62 dropped, stored (x,y) {(7,5),(4,7)}."""
    geom = G.parse_wkt(LAYERS["point_hash"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    rendered = R.render_metatiles(metas, SWISSGRID_5, geoms, tile_size=TS, meta_buffer=MB)
    children = R.split_metatile_images(
        rendered, tile_size=TS, meta_buffer=MB, clamp_matrix=SWISSGRID_5.matrix_size(0)
    ).cache()
    assert children.count() == 64
    stored = FL.hash_drop(children, _sha256(R.empty_tile_bytes(TS)))
    got = {(r.x, r.y) for r in stored.collect()}
    assert got == {(7, 5), (4, 7)}
    children.unpersist()


def test_metatile_drop_before_split_ordering(spark):
    """Empty-METATILE detection must run before the split (drop-before-split
    ordering, generate.py:305-322): an all-empty metatile contributes 0
    generated children."""
    geoms = {0: G.Geom([])}  # nothing to paint -> every metatile empty
    metas = EN.dense_metatiles(spark, SWISSGRID_5, [0], n=8)
    rendered = R.render_metatiles(metas, SWISSGRID_5, geoms, tile_size=TS, meta_buffer=MB)
    meta_px = 8 * TS + 2 * MB
    empty_meta_hash = _sha256(R.empty_tile_bytes(meta_px))
    kept = FL.hash_drop(rendered, empty_meta_hash)
    assert kept.count() == 0  # all metatiles dropped -> no children generated


def test_split_slices_match_direct_render_psnr(spark):
    """meta_buffer halo correctness: each child sliced from the metatile
    interior equals a direct render of the child's extent (PSNR inf for
    png; >=40dB requirement trivially satisfied)."""
    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    rendered = R.render_metatiles(metas, SWISSGRID_5, geoms, tile_size=TS, meta_buffer=MB)
    children = R.split_metatile_images(
        rendered, tile_size=TS, meta_buffer=MB, clamp_matrix=SWISSGRID_5.matrix_size(0)
    )
    audited = R.psnr_vs_rerender(children, SWISSGRID_5, geoms, tile_size=TS)
    mins = audited.agg(F.min("psnr").alias("m")).collect()[0].m
    assert mins == 999.0  # bit-exact for lossless


def test_split_fidelity_lossy_qpng(spark):
    """Same halo check through the lossy codec: PSNR >= 40 dB per child."""
    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    rendered = R.render_metatiles(
        metas, SWISSGRID_5, geoms, tile_size=TS, meta_buffer=MB, fmt="qpng"
    )
    children = R.split_metatile_images(
        rendered, tile_size=TS, meta_buffer=MB, fmt="qpng",
        clamp_matrix=SWISSGRID_5.matrix_size(0),
    )
    audited = R.psnr_vs_rerender(children, SWISSGRID_5, geoms, tile_size=TS, fmt="qpng")
    mins = audited.agg(F.min("psnr").alias("m")).collect()[0].m
    assert mins >= 40.0, mins


def test_synth_images_table_invariants(spark):
    """Image table: schema per BASELINE input_hint; per-row invariant:
    decoded pixels match the deterministic reference synthesis exactly
    (allclose), captions equal, phash consistent."""
    df = synth_images(spark, 64, SWISSGRID_5, size=16)
    rows = df.collect()
    assert len(rows) == 64
    assert set(df.columns) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "x", "y"
    }
    import numpy as np

    for r in rows[:10]:
        i = int(r.image_id[3:])
        ref_px = IMG.synth_pixels(i, 16, 16)
        got_px = IMG.png_decode(bytes(r.bytes))
        assert np.array_equal(got_px, ref_px)  # lossless: exact
        assert r.caption == IMG.synth_caption(r.image_id, i)
        assert r.phash == IMG.phash64(ref_px)
        assert SWISSGRID_5.bbox[0] <= r.x <= SWISSGRID_5.bbox[2]
        assert SWISSGRID_5.bbox[1] <= r.y <= SWISSGRID_5.bbox[3]


def test_styled_render_fill_stroke_painter_order():
    """Mapnik-analog styled rendering: fill paints the interior, stroke the
    outline over it, later features composite over earlier, and 50%-alpha
    source-over blends exactly."""
    import numpy as np

    sq1 = G.parse_wkt("POLYGON((2 2, 14 2, 14 14, 2 14, 2 2))")
    sq2 = G.parse_wkt("POLYGON((8 8, 20 8, 20 20, 8 20, 8 8))")
    ext = (0.0, 0.0, 24.0, 24.0)
    img = R.render_extent_styled(
        [(sq1, {"fill": (0, 0, 255, 255), "stroke": (255, 255, 0, 255),
                "stroke_width_px": 1.0}),
         (sq2, {"fill": (255, 0, 0, 128)})],
        ext, 24, 24,
    )
    # pixel centers at (i+0.5): interior of sq1 away from both the outline
    # and sq2 -> pure fill
    assert tuple(img[24 - 5, 4]) == (0, 0, 255, 255)
    # sq1's outline -> stroke over fill
    assert tuple(img[24 - 3, 2]) == (255, 255, 0, 255)
    # overlap of sq2 (a=128) over sq1's fill -> exact source-over blend
    sa = 128 / 255
    expect = tuple(int(round(s * sa + d * (1 - sa)))
                   for s, d in zip((255, 0, 0, 255), (0, 0, 255, 255)))
    assert tuple(img[24 - 10, 10]) == expect
    # sq2 alone over transparent background
    expect_bg = tuple(int(round(s * sa)) for s in (255, 0, 0, 255))
    assert tuple(img[24 - 19, 19]) == expect_bg
    # outside everything stays fully transparent
    assert tuple(img[0, 23]) == (0, 0, 0, 0)


def test_styled_single_stroke_matches_render_extent():
    """A single opaque red stroke reproduces render_extent's line rasterization
    bit-for-bit (same kernels, same pixel-center predicate)."""
    import numpy as np

    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    grid = SWISSGRID_5
    res = float(grid.resolutions[0])
    span = res * grid.tile_size
    ext = (grid.bbox[0], grid.bbox[3] - 4 * span, grid.bbox[0] + 4 * span, grid.bbox[3])
    a = R.render_extent(geom, ext, 1024, 1024)
    b = R.render_extent_styled([(geom, {"stroke": (255, 20, 20, 255)})], ext, 1024, 1024)
    assert np.array_equal(a, b)


def test_render_styled_tiles_operator(spark):
    """DataFrame stage: styled tiles encode deterministically, decode back to
    the exact styled raster, and n_painted counts non-transparent pixels."""
    import numpy as np

    geom = G.parse_wkt(LAYERS["polygon"].geom_wkt)
    feats = {0: [(geom, {"fill": (10, 120, 40, 255), "stroke": (0, 0, 0, 255),
                         "stroke_width_px": 2.0})]}
    tiles = spark.createDataFrame([(0, 5, 6), (0, 0, 0)], "z int, x int, y int")
    out = {(r.z, r.x, r.y): r for r in
           R.render_styled_tiles(tiles, SWISSGRID_5, feats).collect()}
    r56 = out[(0, 5, 6)]
    assert r56.n_painted > 0
    img = IMG.decode(bytes(r56.data), "png")
    assert int((img[..., 3] > 0).sum()) == r56.n_painted
    # direct-render equivalence for the tile extent
    grid = SWISSGRID_5
    res = float(grid.resolutions[0]); span = res * grid.tile_size
    ext = (grid.bbox[0] + 5 * span, grid.bbox[3] - 7 * span,
           grid.bbox[0] + 6 * span, grid.bbox[3] - 6 * span)
    direct = R.render_extent_styled(feats[0], ext, grid.tile_size, grid.tile_size)
    assert np.array_equal(img, direct)
    # far tile renders empty
    assert out[(0, 0, 0)].n_painted == 0


def test_sparse_rasterizer_bit_identical_to_dense():
    """The sparse-aware kernels (bbox windows + block-pruned segments) must
    be BIT-IDENTICAL to dense whole-raster evaluation — the pruning skips
    only pixels that provably cannot pass (triangle inequality). Fixed-seed
    random multi-part geometries over several raster sizes."""
    import numpy as np

    from tilecloud_chain_spark.geometry import Geom

    def render_dense(geom, extent, w, h, line_width_px=2.0):
        minx, miny, maxx, maxy = extent
        res_x = (maxx - minx) / w
        res_y = (maxy - miny) / h
        cx = minx + (np.arange(w) + 0.5) * res_x
        cy = maxy - (np.arange(h) + 0.5) * res_y
        px, py = np.meshgrid(cx, cy)
        mask = np.zeros((h, w), bool)
        half = 0.5 * line_width_px * res_x
        for kind, payload in geom.parts:
            if kind == "polygon":
                mask |= Geom([(kind, payload)]).contains_points(px, py)
            elif kind == "line":
                for i in range(len(payload) - 1):
                    mask |= R._near_segment(px, py, payload[i], payload[i + 1], half)
            else:
                mask |= (np.abs(px - payload[0]) <= half * 2) & (
                    np.abs(py - payload[1]) <= half * 2
                )
        img = np.zeros((h, w, 4), np.uint8)
        img[mask] = (255, 20, 20, 255)
        return img

    rng = np.random.default_rng(7)
    grid = SWISSGRID_5
    minx, miny, maxx, maxy = grid.bbox

    def rpt():
        return (float(rng.uniform(minx - 5e4, maxx + 5e4)),
                float(rng.uniform(miny - 5e4, maxy + 5e4)))

    for trial in range(10):
        poly = [rpt() for _ in range(5)]
        ring = ", ".join(f"{x} {y}" for x, y in poly + [poly[0]])
        line = ", ".join(f"{x} {y}" for x, y in [rpt() for _ in range(4)])
        px_, py_ = rpt()
        geom = G.parse_wkt(
            f"GEOMETRYCOLLECTION(POLYGON(({ring})), LINESTRING({line}), POINT({px_} {py_}))"
        )
        w = h = int(rng.choice([64, 256, 640]))
        ext = (minx, miny,
               minx + (maxx - minx) * rng.uniform(0.3, 1.2),
               miny + (maxy - miny) * rng.uniform(0.3, 1.2))
        a = R.render_extent(geom, ext, w, h)
        b = render_dense(geom, ext, w, h)
        assert np.array_equal(a, b), f"trial {trial}: sparse != dense"


def test_split_fidelity_real_jpeg(spark):
    """The halo/fidelity check through the REAL baseline JPEG codec
    (functions/jpeg.py): metatile renders encode to JFIF, children slice
    and re-encode, and every decoded child holds the BASELINE
    PSNR >= 40 dB invariant against a direct render (alpha dropped —
    JPEG carries none, same as the reference's Mapnik jpeg path)."""
    geom = G.parse_wkt(LAYERS["line"].geom_wkt)
    geoms = {0: geom}
    metas = EN.sparse_metatiles(spark, SWISSGRID_5, geoms, [0], n=8)
    rendered = R.render_metatiles(
        metas, SWISSGRID_5, geoms, tile_size=TS, meta_buffer=MB, fmt="jpeg"
    )
    children = R.split_metatile_images(
        rendered, tile_size=TS, meta_buffer=MB, fmt="jpeg",
        clamp_matrix=SWISSGRID_5.matrix_size(0),
    )
    audited = R.psnr_vs_rerender(children, SWISSGRID_5, geoms, tile_size=TS, fmt="jpeg")
    mins = audited.agg(F.min("psnr").alias("m")).collect()[0].m
    assert mins >= 40.0, mins
