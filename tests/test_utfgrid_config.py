"""UTFGrid rendering (F2 grid output), config validation, resolution_scale."""

import json

import pytest

from tilecloud_chain_spark import geometry as G
from tilecloud_chain_spark.config import (
    ConfigError,
    Grid,
    SWISSGRID_5,
    WKT_LINE,
    WKT_POLYGON,
    resolution_scale,
)
from tilecloud_chain_spark.operators import utfgrid as U
from tilecloud_chain_spark.sources import enumerate as EN


def test_resolution_scale_reference_semantics():
    assert resolution_scale((100.0, 50.0, 20.0)) == 1
    assert resolution_scale((1.0, 0.2, 0.1)) == 10
    assert resolution_scale((2.5,)) == 2
    assert resolution_scale((0.25,)) == 4
    # scaled resolutions all integral
    for res in [(1.0, 0.2, 0.1), (2.5,), (0.25,)]:
        s = resolution_scale(res)
        assert all((r * s) % 1 == 0 for r in res)


def test_grid_validation_errors():
    ok = Grid(name="g", resolutions=(100.0, 50.0), bbox=(0, 0, 10, 10))
    assert ok.validate() is ok
    with pytest.raises(ConfigError, match="descending"):
        Grid(name="g", resolutions=(50.0, 100.0), bbox=(0, 0, 1, 1)).validate()
    with pytest.raises(ConfigError, match="duplicate"):
        Grid(name="g", resolutions=(50.0, 50.0), bbox=(0, 0, 1, 1)).validate()
    with pytest.raises(ConfigError, match="bbox"):
        Grid(name="g", resolutions=(50.0,), bbox=(10, 0, 0, 10)).validate()
    with pytest.raises(ConfigError, match="matrix_identifier"):
        Grid(name="g", resolutions=(50.0,), bbox=(0, 0, 1, 1),
             matrix_identifier="nope").validate()
    SWISSGRID_5.validate()


def test_utfgrid_char_encoding_spec():
    # spec: id 0 -> ' '(32); skip '"' and '\'
    cells = __import__("numpy").array([[0, 1, 2, 60]])
    enc = U.encode_utfgrid(cells, ["", "a", "b", "c"], {})
    row = enc["grid"][0]
    assert row[0] == " "
    assert '"' not in row and "\\" not in row
    for ch, expect in zip(row, [0, 1, 2, 60]):
        assert U.decode_utfgrid_char(ch) == expect


def test_render_utfgrid_tiles_and_drop_empty(spark):
    feats = [
        ("polygon1", G.parse_wkt(WKT_POLYGON), {"name": "polygon1"}),
        ("line1", G.parse_wkt(WKT_LINE), {"name": "line1"}),
    ]
    tiles = EN.dense_tiles(spark, SWISSGRID_5, [0])
    out = U.render_utfgrid_tiles(
        tiles, SWISSGRID_5, {0: feats}, resolution=4, drop_empty_utfgrid=True
    )
    rows = {(r.x, r.y): json.loads(bytes(r.data)) for r in out.collect()}
    # non-empty tiles == tiles intersecting either feature (polygon ∪ line
    # supercover): polygon covers x4-7,y5-7
    assert set(rows) == {(x, y) for x in (4, 5, 6, 7) for y in (5, 6, 7)}
    g = rows[(5, 6)]  # interior tile: fully polygon
    assert g["keys"][0] == "" and "polygon1" in g["keys"]
    assert g["data"]["polygon1"] == {"name": "polygon1"}
    assert len(g["grid"]) == 256 // 4 and len(g["grid"][0]) == 64
    # line paints over polygon where both present (topmost wins)
    g2 = rows[(6, 5)]  # contains the line near endpoint
    assert "line1" in g2["keys"]
    # deterministic encoding
    out2 = U.render_utfgrid_tiles(
        tiles, SWISSGRID_5, {0: feats}, resolution=4, drop_empty_utfgrid=True
    )
    rows2 = {(r.x, r.y): bytes(r.data) for r in out2.collect()}
    assert rows2[(5, 6)] == json.dumps(rows[(5, 6)], sort_keys=True).encode()


def test_utfgrid_empty_kept_when_not_dropping(spark):
    tiles = EN.dense_tiles(spark, SWISSGRID_5, [0])
    out = U.render_utfgrid_tiles(tiles, SWISSGRID_5, {0: []}, resolution=16)
    assert out.count() == 19 * 13
    one = json.loads(bytes(out.limit(1).collect()[0].data))
    assert one["keys"] == [""] and one["data"] == {}
