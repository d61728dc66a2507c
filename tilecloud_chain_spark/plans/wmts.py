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


# --------------------------------------------------------------------------
# WMTS GetCapabilities document (reference server.py:498-562 renders
# templates/wmts_get_capabilities.jinja; golden in tests/test_controller.py)
# --------------------------------------------------------------------------


def _fmt_num(v: float) -> str:
    """Format like the Jinja template prints config values: integral floats
    as ints (the reference's YAML bboxes are ints -> '420000 350000')."""
    f = float(v)
    return str(int(f)) if f.is_integer() else str(f)


def get_capabilities_xml(
    grids: dict[str, Grid],
    layers: dict[str, Layer],
    base_url: str,
    base_url_postfix: str = "",
    force_limits: bool = False,
) -> str:
    """Render the WMTS 1.0.0 GetCapabilities document the reference serves
    (templates/wmts_get_capabilities.jinja:131-226 Contents section; header
    per :1-124 without the optional metadata/provider blocks). Pure driver-
    side string assembly from the same math as ``capabilities_matrices`` /
    ``tile_matrix_limits`` — pinned against the reference's own expected
    document (tests/test_controller.py CAPABILITIES golden)."""
    if not base_url.endswith("/"):
        base_url += "/"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<Capabilities version="1.0.0"',
        '    xmlns="http://www.opengis.net/wmts/1.0"',
        '    xmlns:ows="http://www.opengis.net/ows/1.1"',
        '    xmlns:xlink="http://www.w3.org/1999/xlink"',
        '    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"',
        '    xmlns:gml="http://www.opengis.net/gml"',
        '    xsi:schemaLocation="http://schemas.opengis.net/wmts/1.0/wmtsGetCapabilities_response.xsd">',
        "  <ows:OperationsMetadata>",
        '    <ows:Operation name="GetCapabilities">',
        "      <ows:DCP>",
        "        <ows:HTTP>",
        f'          <ows:Get xlink:href="{base_url}{base_url_postfix}1.0.0/WMTSCapabilities.xml">',
        '            <ows:Constraint name="GetEncoding">',
        "              <ows:AllowedValues>",
        "                <ows:Value>REST</ows:Value>",
        "              </ows:AllowedValues>",
        "            </ows:Constraint>",
        "          </ows:Get>",
        "        </ows:HTTP>",
        "      </ows:DCP>",
        "    </ows:Operation>",
        '    <ows:Operation name="GetTile">',
        "      <ows:DCP>",
        "        <ows:HTTP>",
        f'          <ows:Get xlink:href="{base_url}{base_url_postfix}">',
        '            <ows:Constraint name="GetEncoding">',
        "              <ows:AllowedValues>",
        "                <ows:Value>REST</ows:Value>",
        "              </ows:AllowedValues>",
        "            </ows:Constraint>",
        "          </ows:Get>",
        "        </ows:HTTP>",
        "      </ows:DCP>",
        "    </ows:Operation>",
        "  </ows:OperationsMetadata>",
        "  <Contents>",
    ]
    for name in sorted(layers):
        layer = layers[name]
        out += [
            "    <Layer>",
            f"      <ows:Title>{layer.title or name}</ows:Title>",
            f"      <ows:Identifier>{name}</ows:Identifier>",
            '      <Style isDefault="true">',
            f"        <ows:Identifier>{layer.wmts_style}</ows:Identifier>",
            "      </Style>",
            f"      <Format>{layer.mime_type}</Format>",
        ]
        for dim, values in layer.dimensions.items():
            default = layer.dimension_defaults.get(dim, values[0])
            out += [
                "      <Dimension>",
                f"        <ows:Identifier>{dim}</ows:Identifier>",
                f"        <Default>{default}</Default>",
            ]
            out += [f"        <Value>{v}</Value>" for v in values]
            out.append("      </Dimension>")
        dims_path = "".join("/{" + d + "}" for d in layer.dimensions)
        out.append(
            f'      <ResourceURL format="{layer.mime_type}" resourceType="tile"\n'
            f'                   template="{base_url}{base_url_postfix}1.0.0/'
            f"{name}/{layer.wmts_style}{dims_path}"
            "/{TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol}."
            f'{layer.extension}" />'
        )
        # one TileMatrixSetLink per grid — multi-grid layers list every grid
        # (reference get_grid_names, test_multi_grid.py capabilities golden)
        for gname in (layer.grids or (layer.grid,)):
            grid = grids[gname]
            out += [
                "      <TileMatrixSetLink>",
                f"        <TileMatrixSet>{gname}</TileMatrixSet>",
            ]
            limits = tile_matrix_limits(grid, layer, force=force_limits)
            if limits:
                out.append("        <TileMatrixSetLimits>")
                for lim in limits:
                    out += [
                        "          <TileMatrixLimits>",
                        f"            <TileMatrix>{lim['tile_matrix']}</TileMatrix>",
                        f"            <MinTileRow>{lim['min_tile_row']}</MinTileRow>",
                        f"            <MaxTileRow>{lim['max_tile_row']}</MaxTileRow>",
                        f"            <MinTileCol>{lim['min_tile_col']}</MinTileCol>",
                        f"            <MaxTileCol>{lim['max_tile_col']}</MaxTileCol>",
                        "          </TileMatrixLimits>",
                    ]
                out.append("        </TileMatrixSetLimits>")
            out.append("      </TileMatrixSetLink>")
        out.append("    </Layer>")
    for gname in sorted(grids):
        grid = grids[gname]
        out += [
            "    <TileMatrixSet>",
            f"      <ows:Identifier>{gname}</ows:Identifier>",
            "      <ows:SupportedCRS>urn:ogc:def:crs:"
            + grid.srs.replace(":", "::")
            + "</ows:SupportedCRS>",
        ]
        for m in capabilities_matrices(grid):
            out += [
                "      <TileMatrix>",
                f"        <ows:Identifier>{m['identifier']}</ows:Identifier>",
                f"        <ScaleDenominator>{m['scale_denominator']!r}</ScaleDenominator>",
                "        <TopLeftCorner>"
                + _fmt_num(m["top_left"][0]) + " " + _fmt_num(m["top_left"][1])
                + "</TopLeftCorner>",
                f"        <TileWidth>{m['tile_size']}</TileWidth>",
                f"        <TileHeight>{m['tile_size']}</TileHeight>",
                f"        <MatrixWidth>{m['matrix_width']}</MatrixWidth>",
                f"        <MatrixHeight>{m['matrix_height']}</MatrixHeight>",
                "      </TileMatrix>",
            ]
        out.append("    </TileMatrixSet>")
    out += ["  </Contents>", "</Capabilities>"]
    return "\n".join(out)
