"""Grid / layer configuration model.

Mirrors the reference's declarative grid config
(``/root/reference/tilecloud_chain/configuration.py:973-1051``): resolutions
(meters/pixel, descending; zoom = list index), bbox in grid-SRS meters,
tile_size (default 256, ``configuration.py:3147``), matrix_identifier
("zoom" | "resolution", ``configuration.py:1044-1051``).

Also ships the reference's test fixtures (grids + layers + geometries from
``tilecloud_chain/tests/tilegeneration/test.yaml:1-233`` and
``docker/test-db/10_init.sql:1-20``) so golden tests and the correctness
oracles run without external services.

Configs are tiny driver-side objects: the Spark analog of the reference's
mtime-cached config (``tilecloud_chain/__init__.py:1131-1143``) is "build
once, close over in the plan / broadcast".
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from fractions import Fraction


class ConfigError(ValueError):
    """Invalid grid/layer configuration (the reference fails validation with
    errors for wrong SRS/resolutions/bbox — tests/test_error.py:30-246)."""


def _prime_factors(x: int) -> list[int]:
    out, loop = [], 2
    while loop <= x:
        if x % loop == 0:
            x = round(x / loop)
            out.append(loop)
        else:
            loop += 1
    return out


def resolution_scale(resolutions: tuple[float, ...]) -> int:
    """SC9 — smallest integer scale making every resolution integral:
    prime-factor LCM of the resolutions' denominators (port of
    ``_resolution_scale``, /root/reference/tilecloud_chain/__init__.py:1293-1319).
    """
    prime_fact: dict[int, int] = {}
    for r in resolutions:
        denom = Fraction(str(r)).denominator
        factors = _prime_factors(denom)
        for f in set(factors):
            prime_fact[f] = max(prime_fact.get(f, 0), factors.count(f))
    result = 1
    for f, n in prime_fact.items():
        result *= f**n
    return result


@dataclass(frozen=True)
class Grid:
    """A WMTS TileMatrixSet.

    ``resolutions`` descending; zoom z = index. Tile span at zoom z is
    ``resolutions[z] * tile_size`` meters; metatile span multiplies by n
    (reference: ``tilecloud_chain/__init__.py:532``).
    """

    name: str
    resolutions: tuple[float, ...]
    bbox: tuple[float, float, float, float]  # minx, miny, maxx, maxy (normalized)
    tile_size: int = 256
    srs: str = "EPSG:2056"
    matrix_identifier: str = "zoom"

    def validate(self) -> "Grid":
        """Config validation (parity with the reference's schema + runtime
        checks: descending resolutions, sane bbox, integral scaled
        resolutions — tilecloud_chain/__init__.py:1244-1260 and the
        wrong_*.yaml error fixtures)."""
        if not self.resolutions:
            raise ConfigError(f"grid {self.name}: empty resolutions")
        if list(self.resolutions) != sorted(self.resolutions, reverse=True):
            raise ConfigError(
                f"grid {self.name}: resolutions must be strictly descending"
            )
        if len(set(self.resolutions)) != len(self.resolutions):
            raise ConfigError(f"grid {self.name}: duplicate resolutions")
        if self.bbox[0] >= self.bbox[2] or self.bbox[1] >= self.bbox[3]:
            raise ConfigError(f"grid {self.name}: invalid bbox {self.bbox}")
        if self.tile_size <= 0:
            raise ConfigError(f"grid {self.name}: tile_size must be positive")
        scale = resolution_scale(self.resolutions)
        for r in self.resolutions:
            if (r * scale) % 1 != 0.0:
                raise ConfigError(
                    f"grid {self.name}: resolution {r} * resolution_scale "
                    f"{scale} is not an integer"
                )
        if self.matrix_identifier not in ("zoom", "resolution"):
            raise ConfigError(
                f"grid {self.name}: matrix_identifier must be zoom|resolution"
            )
        return self

    def matrix_identifiers(self) -> tuple[str, ...]:
        """Per-zoom WMTS TileMatrix identifier strings — zoom index, or the
        resolution formatted like the reference ``get_tile_matrix_identifier``
        (tilecloud_chain/__init__.py:239-252: trailing '.0' stripped, '.'
        replaced by '_'; e.g. swissgrid_01 z4 -> '0_1')."""
        if self.matrix_identifier == "zoom":
            return tuple(str(z) for z in range(len(self.resolutions)))
        return tuple(
            str(int(r)) if float(r).is_integer() else str(r).replace(".", "_")
            for r in self.resolutions
        )

    def span(self, zoom: int, n: int = 1) -> float:
        """Tile (or metatile, n>1) edge length in grid meters at ``zoom``."""
        return float(self.resolutions[zoom]) * self.tile_size * n

    def matrix_size(self, zoom: int, n: int = 1) -> tuple[int, int]:
        """(width, height) in tiles (or metatiles) at ``zoom``.

        ``ceil((maxx-minx)/span), ceil((maxy-miny)/span)`` — reference
        ``tilecloud_chain/__init__.py:533-534`` and the WMTS capabilities
        template (``templates/wmts_get_capabilities.jinja:206-222``).
        """
        s = self.span(zoom, n)
        return (
            math.ceil((self.bbox[2] - self.bbox[0]) / s),
            math.ceil((self.bbox[3] - self.bbox[1]) / s),
        )

    def scale_denominator(self, zoom: int) -> float:
        """OGC ScaleDenominator = resolution / 0.00028 m/px
        (``templates/wmts_get_capabilities.jinja:217``)."""
        return float(self.resolutions[zoom]) / 0.00028

    def tile_extent(
        self, zoom: int, x: int, y: int, n: int = 1, border_px: float = 0.0
    ) -> tuple[float, float, float, float]:
        """Inverse map z/x/y -> bbox, optional pixel border.

        y counts DOWN from bbox maxy (top-left origin) — reference
        ``tilecloud_chain/__init__.py:457-491,821-824``; border semantics of
        ``tilegrid.extent(tilecoord, border)`` (usage
        ``tilecloud_chain/__init__.py:2670-2672``).
        """
        s = self.span(zoom)
        b = border_px * float(self.resolutions[zoom])
        minx = self.bbox[0] + x * s - b
        maxx = self.bbox[0] + (x + n) * s + b
        maxy = self.bbox[3] - y * s + b
        miny = self.bbox[3] - (y + n) * s - b
        return (minx, miny, maxx, maxy)

    def tile_at(self, zoom: int, x_m: float, y_m: float) -> tuple[int, int]:
        """Point -> (x, y) tile index (floor semantics on both axes,
        like ``tilegrid.tilecoord``; used by dense enumeration,
        ``tilecloud_chain/__init__.py:2144-2157``)."""
        s = self.span(zoom)
        return (
            int(math.floor((x_m - self.bbox[0]) / s)),
            int(math.floor((self.bbox[3] - y_m) / s)),
        )

    def bbox_to_range(
        self, zoom: int, bbox: tuple[float, float, float, float], n: int = 1
    ) -> tuple[int, int, int, int] | None:
        """bbox -> inclusive (xmin, xmax, ymin, ymax) index range, clamped.

        Half-open ``floor(min)``/``ceil(max)-1`` semantics of the reference's
        ``_bounds_to_index_range`` / ``_y_bounds_to_index_range``
        (``tilecloud_chain/__init__.py:457-491``). Returns None when empty.
        """
        s = self.span(zoom, n)
        w, h = self.matrix_size(zoom, n)
        x0 = math.floor((bbox[0] - self.bbox[0]) / s)
        x1 = math.ceil((bbox[2] - self.bbox[0]) / s) - 1
        y0 = math.floor((self.bbox[3] - bbox[3]) / s)
        y1 = math.ceil((self.bbox[3] - bbox[1]) / s) - 1
        x0, x1 = max(0, min(w - 1, x0)), max(0, min(w - 1, x1))
        y0, y1 = max(0, min(h - 1, y0)), max(0, min(h - 1, y1))
        if x0 > x1 or y0 > y1:
            return None
        return (x0, x1, y0, y1)


@dataclass(frozen=True)
class Layer:
    """Subset of the reference layer config driving enumeration/filtering
    (``tilecloud_chain/tests/tilegeneration/test.yaml:65-233``)."""

    name: str
    grid: str
    geom_wkt: str | None = None  # per-layer restriction geometry (all zooms)
    bbox: tuple[float, float, float, float] | None = None
    meta: bool = True
    meta_size: int = 8
    meta_buffer: int = 128
    px_buffer: float = 0.0
    min_resolution_seed: float | None = None
    empty_tile_hash: str | None = None  # sha256 in our engine (FL2)
    empty_metatile_hash: str | None = None
    dimensions: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # WMTS-capabilities surface (configuration.py Layer schema defaults)
    grids: tuple[str, ...] = ()  # multi-grid layers (empty -> just `grid`)
    title: str | None = None
    wmts_style: str = "default"
    mime_type: str = "image/png"
    extension: str = "png"
    dimension_defaults: dict[str, str] = field(default_factory=dict)

    def filter_buffer_px(self) -> float:
        """Pixel buffer applied to the geometry filter's tile extent. The
        reference ``IntersectGeometryFilter`` (and cost.py) zero the ENTIRE
        buffer — including px_buffer — when the layer is not metatiled
        (``tilecloud_chain/__init__.py:2660-2672``: ``(px_buffer +
        meta_buffer) if meta else 0``)."""
        return (self.px_buffer + self.meta_buffer) if self.meta else 0.0


# --------------------------------------------------------------------------
# Reference test fixtures (FIXTURES.md §2-§3)
# --------------------------------------------------------------------------

SWISS_BBOX = (420000.0, 30000.0, 900000.0, 350000.0)

SWISSGRID_5 = Grid(
    name="swissgrid_5",
    resolutions=(100.0, 50.0, 20.0, 10.0, 5.0),
    bbox=SWISS_BBOX,
    tile_size=256,
    srs="EPSG:21781",
    matrix_identifier="zoom",
)

SWISSGRID_01 = Grid(
    name="swissgrid_01",
    resolutions=(1.0, 0.2, 0.1),
    bbox=SWISS_BBOX,
    tile_size=256,
    srs="EPSG:21781",
    matrix_identifier="resolution",
)

SWISSGRID_2_5 = Grid(
    name="swissgrid_2_5",
    resolutions=(2.5,),
    bbox=SWISS_BBOX,
    tile_size=256,
    srs="EPSG:21781",
    matrix_identifier="resolution",
)

GRIDS: dict[str, Grid] = {
    g.name: g for g in (SWISSGRID_5, SWISSGRID_01, SWISSGRID_2_5)
}

# Geometries of docker/test-db/10_init.sql:15-20 (EPSG:21781).
WKT_POINTS = "MULTIPOINT ((600000 200000), (530000 150000))"
WKT_LINE = "LINESTRING (600000 200000, 530000 150000)"
WKT_POLYGON = (
    "POLYGON ((600000 200000, 600000 150000, 530000 150000,"
    " 530000 200000, 600000 200000))"
)

LAYERS: dict[str, Layer] = {
    "point": Layer(name="point", grid="swissgrid_5", geom_wkt=WKT_POINTS),
    "point_hash": Layer(
        name="point_hash",
        grid="swissgrid_5",
        geom_wkt=WKT_POINTS,
        min_resolution_seed=10.0,
    ),
    "line": Layer(name="line", grid="swissgrid_5", geom_wkt=WKT_LINE),
    "polygon": Layer(
        name="polygon", grid="swissgrid_5", geom_wkt=WKT_POLYGON, meta=False
    ),
    "all": Layer(
        name="all",
        grid="swissgrid_5",
        bbox=(550000.0, 170000.0, 560000.0, 180000.0),
        meta=False,
    ),
}
