

def test_marker_px_decouples_point_size_from_stroke():
    """marker_px sets the point marker's square width independently of
    stroke_width_px (default stays marker = 2 x stroke width)."""
    import numpy as np

    from tilecloud_chain_spark.geometry import Geom
    from tilecloud_chain_spark.operators.raster import render_extent_styled

    pt = Geom([("point", (32.0, 32.0))])
    ext = (0.0, 0.0, 64.0, 64.0)  # 64x64 px at res 1 -> px == world units
    base = render_extent_styled(
        [(pt, {"stroke": (255, 0, 0, 255), "stroke_width_px": 2.0})], ext, 64, 64)
    big = render_extent_styled(
        [(pt, {"stroke": (255, 0, 0, 255), "stroke_width_px": 2.0,
               "marker_px": 16.0})], ext, 64, 64)
    n_base = int((base[..., 3] > 0).sum())
    n_big = int((big[..., 3] > 0).sum())
    # default: full width 2*2=4px -> ~25 px^2; marker_px=16 -> ~289 px^2
    assert n_base < n_big
    assert abs(n_big - 17 * 17) <= 2 * 17  # square of half-width 8 at centers
