"""WMTS limits/capabilities parity — pinned to reference unit tests
(tests/test_generate.py:548-649)."""

from tilecloud_chain_spark.config import Grid, Layer, SWISSGRID_5
from tilecloud_chain_spark.plans import wmts as W

GRID1 = Grid(name="grid", resolutions=(100.0,), bbox=(420000.0, 30000.0, 900000.0, 350000.0),
             tile_size=256)


def test_limits_reversed_bbox_golden():
    lay = Layer(name="layer", grid="grid", bbox=(560000.0, 180000.0, 550000.0, 170000.0))
    assert W.tile_matrix_limits(GRID1, lay) == [
        {
            "tile_matrix": "0",
            "min_tile_row": 6,
            "max_tile_row": 7,
            "min_tile_col": 5,
            "max_tile_col": 5,
        }
    ]


def test_limits_px_buffer_forced_golden():
    lay = Layer(name="layer", grid="grid",
                bbox=(560000.0, 180000.0, 550000.0, 170000.0), px_buffer=100)
    assert W.tile_matrix_limits(GRID1, lay, force=True) == [
        {
            "tile_matrix": "0",
            "min_tile_row": 6,
            "max_tile_row": 7,
            "min_tile_col": 4,
            "max_tile_col": 5,
        }
    ]


def test_limits_px_buffer_no_force_suppressed_golden():
    lay = Layer(name="layer", grid="grid",
                bbox=(560000.0, 180000.0, 550000.0, 170000.0), px_buffer=100)
    assert W.tile_matrix_limits(GRID1, lay) == []


def test_limits_disjoint_bbox_empty():
    lay = Layer(name="layer", grid="grid", bbox=(0.0, 0.0, 1.0, 1.0))
    assert W.tile_matrix_limits(GRID1, lay) == []


def test_capabilities_matrices_swissgrid():
    rows = W.capabilities_matrices(SWISSGRID_5)
    assert len(rows) == 5
    assert rows[0]["identifier"] == "0"
    assert rows[0]["matrix_width"] == 19 and rows[0]["matrix_height"] == 13
    assert abs(rows[0]["scale_denominator"] - 100.0 / 0.00028) < 1e-6
    assert rows[0]["top_left"] == (420000.0, 350000.0)


def test_resolution_matrix_identifier():
    g = Grid(name="g", resolutions=(1.0, 0.2, 0.1), bbox=SWISSGRID_5.bbox,
             matrix_identifier="resolution")
    assert [W._matrix_identifier(g, z) for z in range(3)] == ["1", "0_2", "0_1"]
