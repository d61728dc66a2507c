"""UTFGrid payload variant (SURVEY.md §2.2 F2 'grid' output format).

The reference's Mapnik grid path renders feature-ID grids and encodes them
per the public UTFGrid 1.3 spec (/root/reference/store/mapnik_.py:76-90:
``grid.encode("utf", resolution=…)``, ``drop_empty_utfgrid`` drops tiles
whose ``data`` is empty). Here the rasterizer assigns each grid cell the
topmost feature whose geometry covers the cell center, and the encoder
follows the UTFGrid spec exactly:

- cell value = key index; character = index + 32, skipping '"' (34) and
  '\\' (92);
- ``keys`` list starts with "" (no feature); ``data`` maps feature key ->
  attribute dict;
- grid resolution r => tile_size/r cells per side (Mapnik default 4).

One Arrow-batched stage; the JSON payload rides the same ``data BINARY``
column as images (content_type analog: application/utfgrid).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tilecloud_chain_spark.config import Grid
from tilecloud_chain_spark.geometry import Geom
from tilecloud_chain_spark.operators.raster import _near_segment


def encode_utfgrid(cells: np.ndarray, keys: list[str], data: dict) -> dict:
    """Encode a (rows, cols) int array of key indices per the UTFGrid spec."""
    out_rows = []
    for row in cells:
        chars = []
        for idx in row:
            c = int(idx) + 32
            if c >= 34:
                c += 1
            if c >= 92:
                c += 1
            chars.append(chr(c))
        out_rows.append("".join(chars))
    return {"grid": out_rows, "keys": keys, "data": data}


def decode_utfgrid_char(ch: str) -> int:
    """Inverse of the id->char mapping (spec §decoding)."""
    c = ord(ch)
    if c >= 93:
        c -= 1
    if c >= 35:
        c -= 1
    return c - 32


def rasterize_features(
    features: list[tuple[str, Geom, dict]],
    extent: tuple[float, float, float, float],
    tile_size: int,
    resolution: int = 4,
    line_width_px: float = 2.0,
) -> dict:
    """Rasterize (key, geom, attributes) features to one UTFGrid dict.
    Later features paint over earlier ones (topmost wins, like Mapnik layer
    order)."""
    side = tile_size // resolution
    minx, miny, maxx, maxy = extent
    res_x = (maxx - minx) / side
    res_y = (maxy - miny) / side
    cx = minx + (np.arange(side) + 0.5) * res_x
    cy = maxy - (np.arange(side) + 0.5) * res_y
    px, py = np.meshgrid(cx, cy)
    cells = np.zeros((side, side), dtype=np.int32)
    keys = [""]
    data = {}
    half = 0.5 * line_width_px * res_x
    for key, geom, attrs in features:
        mask = np.zeros((side, side), dtype=bool)
        for kind, payload in geom.parts:
            if kind == "polygon":
                mask |= Geom([(kind, payload)]).contains_points(px, py)
            elif kind == "line":
                for i in range(len(payload) - 1):
                    mask |= _near_segment(px, py, payload[i], payload[i + 1], half)
            else:
                mask |= (np.abs(px - payload[0]) <= half * 2) & (
                    np.abs(py - payload[1]) <= half * 2
                )
        if mask.any():
            keys.append(str(key))
            cells[mask] = len(keys) - 1
            data[str(key)] = attrs
    return encode_utfgrid(cells, keys, data)


def render_utfgrid_tiles(
    df: DataFrame,
    grid: Grid,
    features_by_zoom: dict[int, list[tuple[str, Geom, dict]]],
    tile_size: int | None = None,
    resolution: int = 4,
    drop_empty_utfgrid: bool = False,
    line_width_px: float = 2.0,
) -> DataFrame:
    """F2(grid) — add a ``data`` column holding the UTFGrid JSON for tile
    rows [z, x, y]. ``drop_empty_utfgrid`` removes tiles whose data dict is
    empty (store/mapnik_.py:88-89)."""
    ts = tile_size or grid.tile_size
    feats = {int(k): v for k, v in features_by_zoom.items()}

    def render(batches):
        for pdf in batches:
            keep = {"z": [], "x": [], "y": [], "data": []}
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
                enc = rasterize_features(
                    feats.get(z, []), extent, ts, resolution, line_width_px
                )
                if drop_empty_utfgrid and not enc["data"]:
                    continue
                keep["z"].append(z)
                keep["x"].append(x)
                keep["y"].append(y)
                keep["data"].append(json.dumps(enc, sort_keys=True).encode())
            yield pd.DataFrame(
                {
                    "z": pd.array(keep["z"], dtype="int32"),
                    "x": pd.array(keep["x"], dtype="int32"),
                    "y": pd.array(keep["y"], dtype="int32"),
                    "data": keep["data"],
                }
            )

    return df.select("z", "x", "y").mapInPandas(
        render, "z int, x int, y int, data binary"
    )
