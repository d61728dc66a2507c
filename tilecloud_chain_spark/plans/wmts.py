"""WMTS capabilities math (SURVEY.md §2.4 FL8, §2.10 SC8, §3.3).

``tile_matrix_limits`` ports the exact formulas of the reference's
``get_tile_matrix_limits`` (/root/reference/tilecloud_chain/__init__.py:778-835):
layer bbox (normalized; reprojection out of scope here) intersected with the
grid bbox, per-zoom half-open index ranges expanded by ``px_buffer *
resolution``, clamped to the matrix, with the reference's gating rule —
px_buffer != 0 suppresses limits unless ``force_tile_matrix_set_limits``
(pinned by tests/test_generate.py:548-649).

``capabilities_matrices`` reproduces the per-TileMatrix rows of the WMTS
GetCapabilities template (templates/wmts_get_capabilities.jinja:200-226):
identifier, ScaleDenominator = resolution/0.00028, TopLeftCorner =
(minx, maxy), matrix width/height.
"""

from __future__ import annotations

import math

from tilecloud_chain_spark.config import Grid, Layer


def normalize_bbox(b: tuple[float, float, float, float]) -> tuple[float, float, float, float]:
    """min/max normalization (reference normalize_bbox,
    tilecloud_chain/__init__.py:862-870) — handles reversed bboxes."""
    return (min(b[0], b[2]), min(b[1], b[3]), max(b[0], b[2]), max(b[1], b[3]))


def tile_matrix_limits(
    grid: Grid,
    layer: Layer,
    force: bool = False,
) -> list[dict]:
    if layer.bbox is None:
        return []
    if layer.px_buffer != 0 and not force:
        return []
    lb = normalize_bbox(layer.bbox)
    gb = grid.bbox
    min_x, min_y = max(lb[0], gb[0]), max(lb[1], gb[1])
    max_x, max_y = min(lb[2], gb[2]), min(lb[3], gb[3])
    if min_x >= max_x or min_y >= max_y:
        return []
    out = []
    for zoom, resolution in enumerate(grid.resolutions):
        span = float(resolution) * grid.tile_size
        m_buffer = layer.px_buffer * float(resolution)
        w = math.ceil((gb[2] - gb[0]) / span)
        h = math.ceil((gb[3] - gb[1]) / span)
        min_col = math.floor((min_x - m_buffer - gb[0]) / span)
        max_col = math.ceil((max_x + m_buffer - gb[0]) / span) - 1
        min_row = math.floor((gb[3] - (max_y + m_buffer)) / span)
        max_row = math.ceil((gb[3] - (min_y - m_buffer)) / span) - 1
        out.append(
            {
                "tile_matrix": _matrix_identifier(grid, zoom),
                "min_tile_row": max(0, min(h - 1, min_row)),
                "max_tile_row": max(0, min(h - 1, max_row)),
                "min_tile_col": max(0, min(w - 1, min_col)),
                "max_tile_col": max(0, min(w - 1, max_col)),
            }
        )
    return out


def _matrix_identifier(grid: Grid, zoom: int) -> str:
    """get_tile_matrix_identifier (tilecloud_chain/__init__.py:239-252)."""
    if grid.matrix_identifier == "zoom":
        return str(zoom)
    r = float(grid.resolutions[zoom])
    return str(int(r)) if r.is_integer() else str(r).replace(".", "_")


def capabilities_matrices(grid: Grid) -> list[dict]:
    out = []
    for zoom, resolution in enumerate(grid.resolutions):
        w, h = grid.matrix_size(zoom)
        out.append(
            {
                "identifier": _matrix_identifier(grid, zoom),
                "scale_denominator": float(resolution) / 0.00028,
                "top_left": (grid.bbox[0], grid.bbox[3]),
                "tile_size": grid.tile_size,
                "matrix_width": w,
                "matrix_height": h,
            }
        )
    return out
