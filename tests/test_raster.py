

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


def test_build_overviews_mosaic_and_missing_quadrant(spark):
    """2x2 constant-color children mosaic into exact parent quadrants
    (box mean of a constant is bit-exact); a missing child leaves its
    quadrant fully transparent; coordinates halve."""
    import numpy as np

    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import build_overviews

    ts = 16
    colors = {(0, 0): (255, 0, 0, 255), (1, 0): (0, 255, 0, 255),
              (0, 1): (0, 0, 255, 255)}  # (2,5) quadrant (1,1) missing
    rows = []
    for (qx, qy), c in colors.items():
        img = np.zeros((ts, ts, 4), np.uint8)
        img[:] = c
        rows.append((3, 4 + qx, 10 + qy, bytearray(IMG.png_encode(img))))
    # a second, complete parent far away
    full = np.zeros((ts, ts, 4), np.uint8)
    full[:] = (9, 9, 9, 255)
    for qx in (0, 1):
        for qy in (0, 1):
            rows.append((3, 20 + qx, 30 + qy, bytearray(IMG.png_encode(full))))
    df = spark.createDataFrame(rows, "z int, x int, y int, data binary")
    got = {(r.z, r.x, r.y): r for r in build_overviews(df, ts).collect()}
    assert set(got) == {(2, 2, 5), (2, 10, 15)}
    p = got[(2, 2, 5)]
    assert p.n_children == 3
    img = IMG.png_decode(bytes(p.data))
    half = ts // 2
    assert tuple(img[0, 0]) == (255, 0, 0, 255)            # qx=0,qy=0
    assert tuple(img[0, half]) == (0, 255, 0, 255)         # qx=1,qy=0
    assert tuple(img[half, 0]) == (0, 0, 255, 255)         # qx=0,qy=1
    assert tuple(img[half, half]) == (0, 0, 0, 0)          # missing -> transparent
    q = got[(2, 10, 15)]
    assert q.n_children == 4
    img2 = IMG.png_decode(bytes(q.data))
    assert (img2 == np.array([9, 9, 9, 255], np.uint8)).all()


def test_build_overviews_deterministic(spark):
    import numpy as np

    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import build_overviews

    ts = 8
    rows = []
    for i in range(8):
        img = IMG.synth_pixels(seed=i, h=ts, w=ts)
        rows.append((5, i % 4, i // 4, bytearray(IMG.png_encode(img))))
    df = spark.createDataFrame(rows, "z int, x int, y int, data binary")
    a = sorted((r.z, r.x, r.y, bytes(r.data)) for r in build_overviews(df, ts).collect())
    b = sorted((r.z, r.x, r.y, bytes(r.data))
               for r in build_overviews(df.repartition(5), ts).collect())
    assert a == b


def test_build_overviews_jpeg_path(spark):
    """Overview building through the real JPEG codec: decoded parents keep
    quadrant colors within lossy tolerance (constant blocks are DC-exact)."""
    import numpy as np

    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import build_overviews

    ts = 16
    rows = []
    for qx in (0, 1):
        for qy in (0, 1):
            img = np.zeros((ts, ts, 3), np.uint8)
            img[:] = (40 * (1 + qx), 60 * (1 + qy), 90)
            rows.append((3, qx, qy, bytearray(IMG.jpeg_encode(img))))
    df = spark.createDataFrame(rows, "z int, x int, y int, data binary")
    got = build_overviews(df, ts, fmt="jpeg").collect()
    assert len(got) == 1 and got[0].n_children == 4
    img = IMG.decode(bytes(got[0].data), "jpeg")
    half = ts // 2
    for qx in (0, 1):
        for qy in (0, 1):
            px = img[qy * half, qx * half].astype(int)
            want = np.array([40 * (1 + qx), 60 * (1 + qy), 90])
            assert np.abs(px - want).max() <= 6, (qx, qy, px, want)


def test_build_pyramid_all_levels(spark):
    """Full overview build: 16 children at z4 -> 4 at z3 -> 1 at z2; all
    levels present, constant color preserved exactly at every level."""
    import numpy as np

    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import build_pyramid

    ts = 8
    img = np.zeros((ts, ts, 4), np.uint8)
    img[:] = (120, 50, 200, 255)
    rows = [(4, x, y, bytearray(IMG.png_encode(img)))
            for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "z int, x int, y int, data binary")
    got = build_pyramid(df, ts, z_to=2).collect()
    by_z = {}
    for r in got:
        by_z.setdefault(r.z, []).append(r)
    assert {z: len(v) for z, v in by_z.items()} == {4: 16, 3: 4, 2: 1}
    assert all(r.n_children is None for r in by_z[4])  # leaves, not composites
    assert all(r.n_children == 4 for r in by_z[3] + by_z[2])
    top = by_z[2][0]
    dec = IMG.png_decode(bytes(top.data))
    assert (dec == np.array([120, 50, 200, 255], np.uint8)).all()


def test_build_pyramid_custom_data_col(spark):
    """A non-default data_col must be normalized up front — unforwarded, the
    first build_overviews iteration failed on the missing 'data' column (or
    silently read an unrelated one)."""
    import numpy as np

    from tilecloud_chain_spark.functions import image as IMG
    from tilecloud_chain_spark.operators.raster import build_pyramid

    ts = 8
    img = np.zeros((ts, ts, 4), np.uint8)
    img[:] = (10, 220, 30, 255)
    rows = [(3, x, y, b"DECOY", bytearray(IMG.png_encode(img)))
            for x in range(2) for y in range(2)]
    df = spark.createDataFrame(rows, "z int, x int, y int, data binary, img binary")
    got = build_pyramid(df, ts, z_to=2, data_col="img").collect()
    by_z = {}
    for r in got:
        by_z.setdefault(r.z, []).append(r)
    assert {z: len(v) for z, v in by_z.items()} == {3: 4, 2: 1}
    dec = IMG.png_decode(bytes(by_z[2][0].data))
    assert (dec == np.array([10, 220, 30, 255], np.uint8)).all()
