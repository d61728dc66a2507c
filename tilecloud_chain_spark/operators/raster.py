"""Raster operators: vector→raster render, metatile image split, fidelity
(SURVEY.md §2.2 F2, §2.3 P1; BASELINE.json raster↔vector + PSNR≥40dB).

The reference renders a metatile image per WMS/Mapnik request (extent +
meta_buffer halo — /root/reference/store/mapnik_.py:67-97, buffer border
``tilegrid.extent(tilecoord, border)``) then splits it into n² children by
cropping tile_size×tile_size windows offset by meta_buffer
(``MetaTileSplitterTileStore`` construction,
tilecloud_chain/__init__.py:1494-1517; driven by ``_process_metatile``
:1556-1588). Empty children equal a constant background image, which the
HashDropper eliminates (tilecloud_chain/__init__.py:2442-2493).

Here the renderer is a deterministic vector rasterizer (no MapServer):
pixels whose center falls inside/near the broadcast geometry are painted on
a constant transparent background. That preserves the reference's observable
semantics exactly:

- one decode per metatile (batched I/O amortization == the reference's
  metatiling optimization, SURVEY.md §4),
- meta_buffer halo = over-render, children sliced from the interior,
- empty child == byte-identical constant tile -> dropped by sha2 hash,
  reproducing the pinned generated/dropped/stored counts end-to-end through
  the actual image path.

All pixel work is numpy inside ``mapInPandas`` (Arrow batches; zero per-row
Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilecloud_chain_spark.config import Grid
from tilecloud_chain_spark.functions import image as IMG
from tilecloud_chain_spark.geometry import Geom


# --------------------------------------------------------------------------
# numpy kernels
# --------------------------------------------------------------------------


def render_extent(
    geom: Geom,
    extent: tuple[float, float, float, float],
    w: int,
    h: int,
    line_width_px: float = 2.0,
) -> np.ndarray:
    """Rasterize ``geom`` over ``extent`` to an (h, w, 4) RGBA uint8 image.

    Pixel (row i, col j) samples the world at its center; overlapping
    renders of aligned extents therefore agree bit-for-bit, which makes the
    metatile-slice == direct-child-render invariant exact for lossless
    formats (and ≥40 dB for the lossy codec).

    Sparse-aware: each part's predicate is evaluated only inside its
    bounding-box pixel window, and line segments additionally prune by
    coarse blocks (a block is tested exactly only when its center is within
    reach of the segment). The per-pixel predicate is UNCHANGED — skipped
    pixels are exactly those that cannot pass — so output is bit-identical
    to the dense evaluation (property-tested) while a thin feature on a
    2304² metatile costs ~100k pixel evaluations instead of 5.3M (measured
    12x on the bench metatile)."""
    mask = geom_mask(geom, extent, w, h, line_width_px)
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[mask] = (255, 20, 20, 255)
    return img


def geom_mask(
    geom: Geom,
    extent: tuple[float, float, float, float],
    w: int,
    h: int,
    line_width_px: float = 2.0,
    fill: bool = True,
    stroke: bool = True,
    marker_px: float | None = None,
) -> np.ndarray:
    """Sparse-aware pixel-center mask of ``geom`` over ``extent``. ``fill``
    paints polygon interiors; ``stroke`` paints line segments and point
    markers (and, when ``fill`` is off, polygon ring outlines as closed
    lines — the styled renderer's stroke pass). ``marker_px`` sets the point
    marker's square FULL width in pixels independently of the stroke width;
    None keeps the default coupling (marker width = 2 x line width)."""
    minx, miny, maxx, maxy = extent
    res_x = (maxx - minx) / w
    res_y = (maxy - miny) / h
    cx = minx + (np.arange(w) + 0.5) * res_x
    cy = maxy - (np.arange(h) + 0.5) * res_y
    mask = np.zeros((h, w), dtype=bool)
    half = 0.5 * line_width_px * res_x

    def window(x0, x1, y0, y1):
        """Pixel-index window certainly containing every pixel CENTER inside
        the world rect (±1 px slack; clipped to the raster)."""
        j0 = max(0, int(np.floor((x0 - minx) / res_x - 0.5)) - 1)
        j1 = min(w, int(np.ceil((x1 - minx) / res_x + 0.5)) + 1)
        i0 = max(0, int(np.floor((maxy - y1) / res_y - 0.5)) - 1)
        i1 = min(h, int(np.ceil((maxy - y0) / res_y + 0.5)) + 1)
        return i0, i1, j0, j1

    def paint_polyline(points, closed: bool = False):
        pts = list(points) + ([points[0]] if closed else [])
        for i in range(len(pts) - 1):
            a, b = pts[i], pts[i + 1]
            win = window(
                min(a[0], b[0]) - half, max(a[0], b[0]) + half,
                min(a[1], b[1]) - half, max(a[1], b[1]) + half,
            )
            _paint_segment(mask, cx, cy, win, a, b, half)

    for kind, payload in geom.parts:
        if kind == "polygon":
            if fill:
                xs = [p[0] for ring in payload for p in ring]
                ys = [p[1] for ring in payload for p in ring]
                i0, i1, j0, j1 = window(min(xs), max(xs), min(ys), max(ys))
                if i0 >= i1 or j0 >= j1:
                    continue
                px, py = np.meshgrid(cx[j0:j1], cy[i0:i1])
                sub = Geom([(kind, payload)])
                mask[i0:i1, j0:j1] |= sub.contains_points(px, py)
            elif stroke:
                for ring in payload:
                    paint_polyline(ring, closed=True)
        elif kind == "line":
            if stroke:
                paint_polyline(payload)
        else:  # point: square marker
            if not stroke:
                continue
            r = 0.5 * marker_px * res_x if marker_px is not None else half * 2
            i0, i1, j0, j1 = window(
                payload[0] - r, payload[0] + r, payload[1] - r, payload[1] + r
            )
            if i0 >= i1 or j0 >= j1:
                continue
            px, py = np.meshgrid(cx[j0:j1], cy[i0:i1])
            mask[i0:i1, j0:j1] |= (np.abs(px - payload[0]) <= r) & (
                np.abs(py - payload[1]) <= r
            )
    return mask


def _paint_segment(mask, cx, cy, win, a, b, dist, block: int = 128) -> None:
    """Exact segment-distance paint restricted to coarse candidate blocks:
    a block is evaluated per-pixel only if its center lies within
    ``dist + block circumradius`` of the segment — a diagonal segment's
    bbox window is mostly empty, and this skips it wholesale."""
    i0, i1, j0, j1 = win
    if i0 >= i1 or j0 >= j1:
        return
    ax, ay = float(a[0]), float(a[1])
    bx, by = float(b[0]), float(b[1])
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    for bi in range(i0, i1, block):
        ei = min(i1, bi + block)
        for bj in range(j0, j1, block):
            ej = min(j1, bj + block)
            bcx = (cx[bj] + cx[ej - 1]) / 2.0
            bcy = (cy[bi] + cy[ei - 1]) / 2.0
            rad = 0.5 * float(np.hypot(cx[ej - 1] - cx[bj], cy[bi] - cy[ei - 1]))
            if ln2 == 0.0:
                d = float(np.hypot(bcx - ax, bcy - ay))
            else:
                t = min(max(((bcx - ax) * dx + (bcy - ay) * dy) / ln2, 0.0), 1.0)
                d = float(np.hypot(bcx - (ax + t * dx), bcy - (ay + t * dy)))
            if d > dist + rad * 1.0000001:  # tiny slack against fp rounding
                continue
            px, py = np.meshgrid(cx[bj:ej], cy[bi:ei])
            mask[bi:ei, bj:ej] |= _near_segment(px, py, a, b, dist)


def _near_segment(px, py, a, b, dist):
    ax, ay = float(a[0]), float(a[1])
    bx, by = float(b[0]), float(b[1])
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    if ln2 == 0:
        return (np.abs(px - ax) <= dist) & (np.abs(py - ay) <= dist)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / ln2, 0.0, 1.0)
    qx = ax + t * dx
    qy = ay + t * dy
    return (px - qx) ** 2 + (py - qy) ** 2 <= dist * dist


def _composite(img: np.ndarray, mask: np.ndarray, rgba) -> None:
    """Source-over composite ``rgba`` onto ``img`` where ``mask`` (Mapnik's
    painter model: later symbolizers blend over earlier ones; opaque colors
    overwrite)."""
    r, g, b, a = (int(v) for v in rgba)
    if a >= 255:
        img[mask] = (r, g, b, 255)
        return
    dst = img[mask].astype(np.float64)
    sa = a / 255.0
    src = np.array([r, g, b, 255.0])
    out = src * sa + dst * (1.0 - sa)
    img[mask] = np.clip(np.round(out), 0, 255).astype(np.uint8)


def render_extent_styled(
    features: list[tuple[Geom, dict]],
    extent: tuple[float, float, float, float],
    w: int,
    h: int,
) -> np.ndarray:
    """Mapnik-analog styled rasterization (the reference's render backend is
    Mapnik XML styles — store/mapnik_.py:30-106; this is the engine-owned
    deterministic stand-in with the same painter model): features render in
    list order, each with a style dict:

    - ``fill``: RGBA tuple — polygon interior (source-over blended)
    - ``stroke``: RGBA tuple — polygon outlines, lines, point markers
    - ``stroke_width_px``: line/outline width (default 2.0)
    - ``marker_px``: point marker square full width in px (default: twice
      the stroke width, :func:`geom_mask`'s coupling)

    Same sparse-aware kernels as :func:`render_extent`; pixel-center
    sampling keeps the metatile-slice == direct-render invariant."""
    img = np.zeros((h, w, 4), dtype=np.uint8)
    for geom, style in features:
        fill = style.get("fill")
        stroke = style.get("stroke")
        width = float(style.get("stroke_width_px", 2.0))
        if fill is not None:
            m = geom_mask(geom, extent, w, h, width, fill=True, stroke=False)
            _composite(img, m, fill)
        if stroke is not None:
            mpx = style.get("marker_px")
            m = geom_mask(
                geom, extent, w, h, width, fill=False, stroke=True,
                marker_px=float(mpx) if mpx is not None else None,
            )
            _composite(img, m, stroke)
    return img


def render_styled_tiles(
    df: DataFrame,
    grid: Grid,
    features_by_zoom: dict[int, list[tuple[Geom, dict]]],
    tile_size: int | None = None,
    fmt: str = "png",
) -> DataFrame:
    """F2 (styled) — render tile rows [z, x, y] through the Mapnik-analog
    styled pipeline; adds ``data`` (encoded image) and ``n_painted``
    (non-transparent pixel count — the cheap emptiness/energy stat). Styles
    and geometries broadcast with the closure, one Arrow stage, no
    shuffle."""
    ts = tile_size or grid.tile_size
    feats = {int(k): v for k, v in features_by_zoom.items()}
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in _schema_of(df))
        + ", n_painted int, data binary"
    )

    def render(batches):
        for pdf in batches:
            datas, painted = [], []
            for z, x, y in zip(pdf["z"], pdf["x"], pdf["y"]):
                z, x, y = int(z), int(x), int(y)
                res = float(grid.resolutions[z])
                span = res * ts
                extent = (
                    grid.bbox[0] + x * span,
                    grid.bbox[3] - (y + 1) * span,
                    grid.bbox[0] + (x + 1) * span,
                    grid.bbox[3] - y * span,
                )
                img = render_extent_styled(feats.get(z, []), extent, ts, ts)
                painted.append(int((img[..., 3] > 0).sum()))
                datas.append(IMG.encode(img, fmt))
            pdf = pdf.copy()
            pdf["n_painted"] = pd.array(painted, dtype="int32")
            pdf["data"] = datas
            yield pdf

    return df.mapInPandas(render, out_schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    data_col: str = "data",
    fmt: str = "png",
) -> DataFrame:
    """Multimodal RESIZE stage (brief mandate: decode / feature-extract /
    resize as distributed ops): decode each image, box-resample to
    (out_w, out_h), re-encode — one Arrow batch stage, one decode per row,
    no shuffle. Adds ``src_w``/``src_h`` and replaces ``data_col``."""
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in _schema_of(df))
        + ", src_w int, src_h int"
    )

    def work(batches):
        for pdf in batches:
            datas, ws, hs = [], [], []
            for data in pdf[data_col]:
                img = IMG.decode(bytes(data), fmt)
                hs.append(int(img.shape[0]))
                ws.append(int(img.shape[1]))
                small = IMG.resize_area(img, int(out_h), int(out_w))
                datas.append(
                    IMG.encode(small, fmt)
                )
            pdf = pdf.copy()
            pdf[data_col] = datas
            pdf["src_w"] = pd.array(ws, dtype="int32")
            pdf["src_h"] = pd.array(hs, dtype="int32")
            yield pdf

    return df.mapInPandas(work, out_schema)


def empty_tile_bytes(tile_size: int, fmt: str = "png") -> bytes:
    """The constant background tile — its digest is the layer's
    ``empty_tile_detection`` fingerprint (FL2)."""
    img = np.zeros((tile_size, tile_size, 4), dtype=np.uint8)
    return IMG.encode(img, fmt)


# --------------------------------------------------------------------------
# DataFrame operators
# --------------------------------------------------------------------------


def render_metatiles(
    df: DataFrame,
    grid: Grid,
    geoms: dict[int, Geom],
    tile_size: int | None = None,
    meta_buffer: int = 0,
    fmt: str = "png",
    line_width_px: float = 2.0,
) -> DataFrame:
    """F2 — add a ``data`` column: the rendered metatile image
    (``(n*tile_size + 2*meta_buffer)²`` RGBA) for rows [z, x, y, n]."""
    ts = tile_size or grid.tile_size
    geoms_l = {int(k): v for k, v in geoms.items()}
    out_schema = ", ".join(f"{c} {t}" for c, t in _schema_of(df)) + ", data binary"

    def render(batches):
        for pdf in batches:
            datas = []
            for z, x, y, n in zip(pdf["z"], pdf["x"], pdf["y"], pdf["n"]):
                z, x, y, n = int(z), int(x), int(y), int(n)
                res = float(grid.resolutions[z])
                span = res * ts
                b = meta_buffer * res
                extent = (
                    grid.bbox[0] + x * span - b,
                    grid.bbox[3] - (y + n) * span - b,
                    grid.bbox[0] + (x + n) * span + b,
                    grid.bbox[3] - y * span + b,
                )
                px = n * ts + 2 * meta_buffer
                img = render_extent(
                    geoms_l.get(z, Geom([])), extent, px, px, line_width_px
                )
                datas.append(IMG.encode(img, fmt))
            pdf = pdf.copy()
            pdf["data"] = datas
            yield pdf

    return df.mapInPandas(render, out_schema)


def split_metatile_images(
    df: DataFrame,
    tile_size: int,
    meta_buffer: int = 0,
    fmt: str = "png",
    clamp_matrix: tuple[int, int] | None = None,
) -> DataFrame:
    """P1 — metatile rows [z, x, y, n, data] -> n² child rows
    [z, x, y, meta_x, meta_y, data]: decode ONCE per metatile, slice
    tile_size² interior windows offset by ``meta_buffer``, re-encode each.
    """

    def split(batches):
        for pdf in batches:
            out = {k: [] for k in ("z", "x", "y", "meta_x", "meta_y", "data")}
            for z, x, y, n, data in zip(pdf["z"], pdf["x"], pdf["y"], pdf["n"], pdf["data"]):
                z, x, y, n = int(z), int(x), int(y), int(n)
                img = IMG.decode(bytes(data), fmt)
                for dy in range(n):
                    for dx in range(n):
                        r0 = meta_buffer + dy * tile_size
                        c0 = meta_buffer + dx * tile_size
                        child = img[r0 : r0 + tile_size, c0 : c0 + tile_size]
                        enc = IMG.encode(np.ascontiguousarray(child), fmt)
                        out["z"].append(z)
                        out["x"].append(x + dx)
                        out["y"].append(y + dy)
                        out["meta_x"].append(x)
                        out["meta_y"].append(y)
                        out["data"].append(enc)
            yield pd.DataFrame(
                {
                    "z": pd.array(out["z"], dtype="int32"),
                    "x": pd.array(out["x"], dtype="int32"),
                    "y": pd.array(out["y"], dtype="int32"),
                    "meta_x": pd.array(out["meta_x"], dtype="int32"),
                    "meta_y": pd.array(out["meta_y"], dtype="int32"),
                    "data": out["data"],
                }
            )

    out = df.mapInPandas(
        split, "z int, x int, y int, meta_x int, meta_y int, data binary"
    )
    if clamp_matrix is not None:
        w, h = clamp_matrix
        out = out.filter((F.col("x") < w) & (F.col("y") < h))
    return out


def render_split_metatiles(
    df: DataFrame,
    grid: Grid,
    geoms: dict[int, Geom],
    tile_size: int | None = None,
    meta_buffer: int = 0,
    fmt: str = "png",
    line_width_px: float = 2.0,
    clamp_matrix: bool = True,
    drop_empty_children: bool = False,
) -> DataFrame:
    """Fused F2+P1: render each metatile and slice its children in ONE
    python stage, skipping the intermediate metatile PNG encode/decode.

    The reference cannot fuse (WMS returns encoded bytes over HTTP); we own
    the renderer, so the fusion is free and halves image-path CPU. Pixel
    output is bit-identical to render_metatiles→split_metatile_images
    (property-tested). ``drop_empty_children`` short-circuits FL2 for fully
    transparent children without encoding them (drop-before-encode — the
    encode cost of empty tiles is pure waste; their hash-drop equivalence is
    pinned by the golden tests).
    """
    ts = tile_size or grid.tile_size
    geoms_l = {int(k): v for k, v in geoms.items()}

    def render_split(batches):
        for pdf in batches:
            out = {k: [] for k in ("z", "x", "y", "meta_x", "meta_y", "data")}
            for z, x, y, n in zip(pdf["z"], pdf["x"], pdf["y"], pdf["n"]):
                z, x, y, n = int(z), int(x), int(y), int(n)
                res = float(grid.resolutions[z])
                span = res * ts
                b = meta_buffer * res
                extent = (
                    grid.bbox[0] + x * span - b,
                    grid.bbox[3] - (y + n) * span - b,
                    grid.bbox[0] + (x + n) * span + b,
                    grid.bbox[3] - y * span + b,
                )
                px = n * ts + 2 * meta_buffer
                img = render_extent(geoms_l.get(z, Geom([])), extent, px, px, line_width_px)
                if drop_empty_children and not img[..., 3].any():
                    # empty-METATILE drop before split (generate.py:305-322):
                    # skip the n² child loop entirely
                    continue
                w_m, h_m = grid.matrix_size(z)
                for dy in range(n):
                    for dx in range(n):
                        cx, cy = x + dx, y + dy
                        if clamp_matrix and (cx >= w_m or cy >= h_m):
                            continue
                        r0 = meta_buffer + dy * ts
                        c0 = meta_buffer + dx * ts
                        child = img[r0 : r0 + ts, c0 : c0 + ts]
                        if drop_empty_children and not child[..., 3].any():
                            continue
                        enc = (
                            IMG.png_encode(np.ascontiguousarray(child))
                            if fmt == "png"
                            else IMG.qpng_encode(np.ascontiguousarray(child))
                        )
                        out["z"].append(z)
                        out["x"].append(cx)
                        out["y"].append(cy)
                        out["meta_x"].append(x)
                        out["meta_y"].append(y)
                        out["data"].append(enc)
            yield pd.DataFrame(
                {
                    "z": pd.array(out["z"], dtype="int32"),
                    "x": pd.array(out["x"], dtype="int32"),
                    "y": pd.array(out["y"], dtype="int32"),
                    "meta_x": pd.array(out["meta_x"], dtype="int32"),
                    "meta_y": pd.array(out["meta_y"], dtype="int32"),
                    "data": out["data"],
                }
            )

    return df.mapInPandas(
        render_split, "z int, x int, y int, meta_x int, meta_y int, data binary"
    )


def psnr_vs_rerender(
    df: DataFrame,
    grid: Grid,
    geoms: dict[int, Geom],
    tile_size: int,
    fmt: str = "png",
    line_width_px: float = 2.0,
) -> DataFrame:
    """Fidelity audit: decode each child tile and compare against a direct
    render of its extent — adds ``psnr`` (dB, +inf -> 999.0). The
    BASELINE invariant is psnr >= 40 for lossy codecs."""
    geoms_l = {int(k): v for k, v in geoms.items()}
    out_schema = ", ".join(f"{c} {t}" for c, t in _schema_of(df)) + ", psnr double"

    def audit(batches):
        for pdf in batches:
            vals = []
            for z, x, y, data in zip(pdf["z"], pdf["x"], pdf["y"], pdf["data"]):
                z, x, y = int(z), int(x), int(y)
                res = float(grid.resolutions[z])
                span = res * tile_size
                extent = (
                    grid.bbox[0] + x * span,
                    grid.bbox[3] - (y + 1) * span,
                    grid.bbox[0] + (x + 1) * span,
                    grid.bbox[3] - y * span,
                )
                ref = render_extent(geoms_l.get(z, Geom([])), extent, tile_size, tile_size, line_width_px)
                got = IMG.decode(bytes(data), fmt)
                if got.ndim == 3 and got.shape[2] == 3 and ref.shape[2] == 4:
                    ref = ref[..., :3]  # JPEG carries no alpha plane
                p = IMG.psnr(ref, got)
                vals.append(999.0 if p == float("inf") else p)
            pdf = pdf.copy()
            pdf["psnr"] = vals
            yield pdf

    return df.mapInPandas(audit, out_schema)


def _schema_of(df: DataFrame) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def build_overviews(
    df: DataFrame,
    tile_size: int,
    data_col: str = "data",
    fmt: str = "png",
) -> DataFrame:
    """Build zoom z-1 OVERVIEW tiles by mosaicking each parent's up-to-four
    z-level children (2x2 layout) and box-downsampling 2ts -> ts — the
    inverse of the metatile split (gdal2tiles-style overview building:
    render the deepest zoom once, derive ancestors by composition instead
    of re-rendering every level).

    Input rows: (z, x, y, data). Output: (z, x, y, n_children, data) at
    z-1; quadrants with no child tile stay fully transparent.

    Scale shape: ONE shuffle — groupBy the parent key, so each parent's
    children co-locate (hash-partitioned by (z-1, x//2, y//2); uniform by
    construction since every parent has <= 4 children); decode + compose +
    area-resample + encode all happen in one Arrow stage. Iterating this
    operator z_max times builds the whole pyramid with z_max shuffles,
    each half the linear size of the previous."""
    ts = int(tile_size)
    z = F.col("z").cast("int")
    x = F.col("x").cast("int")
    y = F.col("y").cast("int")
    g = df.select(
        (z - 1).alias("z"),
        F.floor(x / 2).cast("int").alias("x"),
        F.floor(y / 2).cast("int").alias("y"),
        (x % 2).alias("qx"),
        (y % 2).alias("qy"),
        F.col(data_col).alias("data"),
    )
    grouped = g.groupBy("z", "x", "y").agg(
        F.collect_list(F.struct("qx", "qy", "data")).alias("children")
    )

    def mosaic(batches):
        for pdf in batches:
            datas, counts = [], []
            for children in pdf["children"]:
                canvas = np.zeros((2 * ts, 2 * ts, 4), dtype=np.uint8)
                for ch in children:
                    img = IMG.decode(bytes(ch["data"]), fmt)
                    if img.ndim == 2:  # grayscale -> RGB
                        img = np.stack([img] * 3, axis=-1)
                    if img.shape[2] == 3:  # RGB -> RGBA (opaque)
                        img = np.concatenate(
                            [img, np.full((*img.shape[:2], 1), 255, np.uint8)],
                            axis=2,
                        )
                    qx, qy = int(ch["qx"]), int(ch["qy"])
                    canvas[qy * ts : (qy + 1) * ts, qx * ts : (qx + 1) * ts] = img
                out = IMG.resize_area(canvas, ts, ts)
                datas.append(
                    IMG.encode(out, fmt)
                )
                counts.append(len(children))
            out_pdf = pdf[["z", "x", "y"]].copy()
            out_pdf["n_children"] = pd.array(counts, dtype="int32")
            out_pdf["data"] = datas
            yield out_pdf

    return grouped.mapInPandas(
        mosaic, "z int, x int, y int, n_children int, data binary"
    )


def build_pyramid(
    df: DataFrame,
    tile_size: int,
    z_to: int,
    data_col: str = "data",
    fmt: str = "png",
) -> DataFrame:
    """Iterate :func:`build_overviews` from the input's single zoom level
    down to ``z_to`` (inclusive) and return ALL levels unioned — the
    gdal2tiles full-overview build. Each iteration's input is a quarter the
    previous one's tile count, so the whole pyramid costs z_max
    geometrically-shrinking shuffles; every level is localCheckpoint-ed
    once (it feeds both the union and the next iteration).

    The input is normalized to a ``data`` column ONCE up front — every
    subsequent :func:`build_overviews` level emits ``data``, so a custom
    ``data_col`` only describes the source level (unforwarded, the first
    iteration would look for a missing — or worse, unrelated — ``data``
    column)."""
    cur = df.select(
        "z", "x", "y", F.col(data_col).alias("data")
    ).localCheckpoint(eager=True)
    zs = [r[0] for r in cur.select("z").distinct().collect()]
    if not zs:
        return cur.select("z", "x", "y", F.lit(0).alias("n_children"),
                          "data").limit(0)
    if len(zs) != 1:
        raise ValueError(
            f"build_pyramid input must hold exactly one zoom level, got {sorted(zs)}"
        )
    z_cur = int(zs[0])
    # source-level tiles are leaves, not composites: n_children is NULL
    out = cur.select("z", "x", "y",
                     F.lit(None).cast("int").alias("n_children"), "data")
    while z_cur > int(z_to):
        cur = build_overviews(cur, tile_size, fmt=fmt).localCheckpoint(eager=True)
        out = out.unionAll(cur)
        z_cur -= 1
    return out
