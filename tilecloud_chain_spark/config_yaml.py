"""Reference-style YAML configuration loader.

Accepts the subset of camptocamp/tilecloud-chain's YAML schema that drives
query semantics (grids + layers — /root/reference/tilecloud_chain/
configuration.py:973-1051 grids, :1090-;  layer keys per
tests/tilegeneration/test.yaml), so an existing config file's ``grids:`` and
``layers:`` sections work here unchanged. Backend-specific keys (WMS urls,
caches, redis, sns…) are ignored with a warning list — this engine replaces
those subsystems (SURVEY.md §1.6 mapping).

Geometry restrictions: the reference's ``geoms: [{sql:…, connection:…}]``
entries require live PostGIS; here a layer may instead carry
``geom_wkt: <WKT>`` or ``geoms: [{wkt:…, min_resolution:…, max_resolution:…}]``
rows (the loaded-and-broadcast form the engine consumes — geoms.resolve_geoms).
SQL entries are surfaced in ``unsupported`` so callers can wire a JDBC read.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from tilecloud_chain_spark.config import Grid, Layer

_LAYER_KEYS = {
    "grid", "grids", "bbox", "meta", "meta_size", "meta_buffer", "px_buffer",
    "min_resolution_seed", "empty_tile_detection", "empty_metatile_detection",
    "dimensions", "geom_wkt", "geoms", "geom_filter",
}


@dataclass
class LoadedConfig:
    grids: dict[str, Grid]
    layers: dict[str, Layer]
    layer_grids: dict[str, list[str]] = field(default_factory=dict)
    geom_rows: dict[str, list[dict]] = field(default_factory=dict)
    unsupported: list[str] = field(default_factory=list)


def load_config(path: str) -> LoadedConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return parse_config(raw)


def parse_config(raw: dict) -> LoadedConfig:
    unsupported: list[str] = []
    grids: dict[str, Grid] = {}
    for name, g in (raw.get("grids") or {}).items():
        grids[name] = Grid(
            name=name,
            resolutions=tuple(float(r) for r in g["resolutions"]),
            bbox=tuple(float(v) for v in g["bbox"]),
            tile_size=int(g.get("tile_size", 256)),
            srs=g.get("srs", "EPSG:2056"),
            matrix_identifier=g.get("matrix_identifier", "zoom"),
        ).validate()

    layers: dict[str, Layer] = {}
    layer_grids: dict[str, list[str]] = {}
    geom_rows: dict[str, list[dict]] = {}
    for name, lay in (raw.get("layers") or {}).items():
        for k in lay:
            if k not in _LAYER_KEYS:
                unsupported.append(f"layers.{name}.{k}")
        gnames = lay.get("grids") or ([lay["grid"]] if "grid" in lay else list(grids))
        etd = lay.get("empty_tile_detection") or {}
        emd = lay.get("empty_metatile_detection") or {}
        dims = {}
        for d in lay.get("dimensions") or []:
            dims[d["name"]] = tuple(str(v) for v in d.get("generate", d.get("values", [])))
        rows = []
        wkt = lay.get("geom_wkt")
        for entry in lay.get("geoms") or []:
            if "wkt" in entry:
                rows.append(
                    {
                        "wkt": entry["wkt"],
                        "min_resolution": entry.get("min_resolution"),
                        "max_resolution": entry.get("max_resolution"),
                    }
                )
            else:
                unsupported.append(
                    f"layers.{name}.geoms (sql entry — wire a JDBC read and pass "
                    "rows to geoms.resolve_geoms)"
                )
        layers[name] = Layer(
            name=name,
            grid=gnames[0],
            geom_wkt=wkt,
            bbox=tuple(float(v) for v in lay["bbox"]) if "bbox" in lay else None,
            meta=bool(lay.get("meta", True)),
            meta_size=int(lay.get("meta_size", 8)),
            meta_buffer=int(lay.get("meta_buffer", 128)),
            px_buffer=float(lay.get("px_buffer", 0.0)),
            min_resolution_seed=(
                float(lay["min_resolution_seed"]) if "min_resolution_seed" in lay else None
            ),
            empty_tile_hash=etd.get("hash"),
            empty_metatile_hash=emd.get("hash"),
            dimensions=dims,
        )
        layer_grids[name] = list(gnames)
        if rows:
            geom_rows[name] = rows

    for section in ("caches", "generation", "redis", "sns", "sqs", "server",
                    "postgresql", "mapcache", "openlayers", "metadata", "provider"):
        if section in (raw or {}):
            unsupported.append(section)
    return LoadedConfig(grids=grids, layers=layers, layer_grids=layer_grids,
                        geom_rows=geom_rows, unsupported=unsupported)
