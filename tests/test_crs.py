"""CRS transforms (SC2/SC3): exact numpy implementations cross-validated
against independent public formulations (no pyproj in this environment).

Evidence chain for correctness without pyproj to pin against:
- spherical Mercator: closed-form anchors (Snyder) are exact;
- Swiss somerc+datum chain: agrees with swisstopo's *independently derived*
  approximate polynomial formulas within their stated ~1-2 m accuracy over
  the Swiss interior, and the LV03 projection center lands on the published
  WGS84 coordinates of Bern to <1 m;
- every projection round-trips fwd∘inv to sub-mm;
- LV03<->LV95 via WGS84 agrees with the exact-by-definition translation.
"""

import numpy as np
import pytest

from tilecloud_chain_spark import crs
from tilecloud_chain_spark import geoms as GE
from tilecloud_chain_spark.config import LAYERS, SWISSGRID_5
from tilecloud_chain_spark.geometry import parse_wkt


def test_merc_anchors():
    x, y = crs.merc_fwd(180.0, 0.0)
    assert x == pytest.approx(20037508.342789244, abs=1e-6)
    assert y == 0.0
    _, y = crs.merc_fwd(0.0, 85.05112877980659)
    assert y == pytest.approx(20037508.342789244, abs=1e-3)


@pytest.mark.parametrize("srs", ["EPSG:3857", "EPSG:21781", "EPSG:2056"])
def test_roundtrip(srs):
    lons = np.linspace(5.9, 10.5, 25)
    lats = np.linspace(45.8, 47.8, 25)
    lo, la = (a.ravel() for a in np.meshgrid(lons, lats))
    px, py = crs.transform_coords("EPSG:4326", srs, lo, la)
    lo2, la2 = crs.transform_coords(srs, "EPSG:4326", px, py)
    assert np.abs(lo2 - lo).max() < 1e-7
    assert np.abs(la2 - la).max() < 1e-7


def test_swiss_exact_vs_approx_interior():
    """Two independent public formulations agree within the approximate
    formulas' stated accuracy over the Swiss interior."""
    E = np.linspace(550000, 750000, 20)
    N = np.linspace(130000, 250000, 20)
    ee, nn = (a.ravel() for a in np.meshgrid(E, N))
    lon_ex, lat_ex = crs.transform_coords("EPSG:21781", "EPSG:4326", ee, nn)
    lon_ap, lat_ap = crs.swiss_approx_lv03_to_wgs84(ee, nn)
    m_per_deg_lon = 111320 * np.cos(np.radians(46.8))
    assert (np.abs(lon_ex - lon_ap) * m_per_deg_lon).max() < 2.5
    assert (np.abs(lat_ex - lat_ap) * 111320).max() < 2.5
    e_ap, n_ap = crs.swiss_approx_wgs84_to_lv03(lon_ex, lat_ex)
    assert np.abs(e_ap - ee).max() < 0.5
    assert np.abs(n_ap - nn).max() < 0.5


def test_bern_published_anchor():
    """The LV03 false origin (600000, 200000) is Bern; its WGS84 position is
    published as ~46°57'03.9\"N 7°26'19.1\"E (46.951083, 7.438631)."""
    lon, lat = crs.transform_coords("EPSG:21781", "EPSG:4326", 600000.0, 200000.0)
    assert float(lat) == pytest.approx(46.951083, abs=1e-5)
    assert float(lon) == pytest.approx(7.438631, abs=1e-5)


def test_lv03_lv95_exact_and_consistent():
    e95, n95 = crs.transform_coords("EPSG:21781", "EPSG:2056", 600000.0, 200000.0)
    assert (float(e95), float(n95)) == (2600000.0, 1200000.0)
    # the via-WGS84 route must agree with the exact translation to <5 mm
    lon, lat = crs.transform_coords("EPSG:21781", "EPSG:4326", 601234.5, 198765.4)
    e2, n2 = crs.transform_coords("EPSG:4326", "EPSG:2056", lon, lat)
    assert float(e2) == pytest.approx(2601234.5, abs=0.005)
    assert float(n2) == pytest.approx(1198765.4, abs=0.005)


def test_transform_bbox_normalizes_reversed_input():
    """Reference test semantics (tests/test_generate.py:538-546): reversed
    bbox input, proj4-literal SRS strings, normalized output."""
    out = GE.transform_bbox(
        "+proj=longlat +datum=WGS84 +no_defs",
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +k=1 +units=m +no_defs",
        [8.0, 47.0, 7.5, 46.5],
    )
    assert out[0] < out[2] and out[1] < out[3]
    # anchors: lon 7.5/8.0 at the web-mercator scale
    assert out[0] == pytest.approx(7.5 * 20037508.342789244 / 180, rel=1e-9)
    assert out[2] == pytest.approx(8.0 * 20037508.342789244 / 180, rel=1e-9)


def test_transform_bbox_same_srs_is_normalize_only():
    assert GE.transform_bbox("EPSG:21781", "epsg:21781", (6, 2, 1, 5)) == (1, 2, 6, 5)


def test_unsupported_crs_raises():
    # Krovak (EPSG:5514) is not implemented; UTM band codes outside zones
    # 1-60 are not valid UTM either
    with pytest.raises(NotImplementedError):
        crs.transform_coords("EPSG:5514", "EPSG:4326", 1.0, 2.0)
    with pytest.raises(NotImplementedError):
        crs.transform_coords("EPSG:32699", "EPSG:4326", 1.0, 2.0)


def test_tm_epsg_guidance_note_worked_example():
    """EPSG Guidance Note 7-2's published Transverse Mercator worked example
    (OSGB36 / British National Grid, Airy 1830): lat 50°30'N lon 0°30'E ->
    E 577274.99, N 69740.50 — an independent published pin of the TM kernel
    (Snyder PP 1395 eq. 8-9..8-13)."""
    bng = crs._TransverseMercator(
        lon0_deg=-2.0, k0=0.9996012717, fe=400000.0, fn=-100000.0,
        lat0_deg=49.0, a=6377563.396, f=1 / 299.3249646,
    )
    e, n = bng.fwd(0.5, 50.5)
    assert float(e) == pytest.approx(577274.99, abs=0.02)
    assert float(n) == pytest.approx(69740.50, abs=0.02)
    lon, lat = bng.inv(577274.99, 69740.50)
    assert float(lon) == pytest.approx(0.5, abs=1e-7)
    assert float(lat) == pytest.approx(50.5, abs=1e-7)


def test_utm_proj_quickstart_golden():
    """PROJ documentation quickstart pair: `proj +proj=utm +zone=32` on
    (12E, 55N) prints 691875.63 6098907.83 — pins the UTM parameterization
    (k0 0.9996, central meridian zone*6-183, FE 500 km)."""
    x, y = crs.transform_coords("EPSG:4326", "EPSG:32632", 12.0, 55.0)
    assert float(x) == pytest.approx(691875.63, abs=0.02)
    assert float(y) == pytest.approx(6098907.83, abs=0.02)
    # southern-hemisphere false northing: same point mirrored about the
    # equator differs from FN by the symmetric northing
    xn, yn = crs.transform_coords("EPSG:4326", "EPSG:32632", 12.0, 1.0)
    xs, ys = crs.transform_coords("EPSG:4326", "EPSG:32732", 12.0, -1.0)
    assert float(xs) == pytest.approx(float(xn), abs=1e-6)
    assert float(ys) == pytest.approx(10_000_000.0 - float(yn), abs=1e-6)


def test_utm_roundtrip_within_zone():
    """fwd∘inv < 1e-9 deg everywhere inside the zone's 3° half-width and
    the UTM latitude band (84N..80S)."""
    lons = np.linspace(6.0, 12.0, 25)
    lats = np.linspace(-80.0, 84.0, 41)
    lo, la = (a.ravel() for a in np.meshgrid(lons, lats))
    for srs in ("EPSG:32632", "EPSG:32732"):
        px, py = crs.transform_coords("EPSG:4326", srs, lo, la)
        lo2, la2 = crs.transform_coords(srs, "EPSG:4326", px, py)
        assert np.abs(lo2 - lo).max() < 1e-9
        assert np.abs(la2 - la).max() < 1e-9


def test_utm_proj4_literals():
    assert crs.supported("+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs")
    assert crs.supported("+proj=utm +zone=33 +south +datum=WGS84")
    assert crs._resolve("+proj=utm +zone=7") == "EPSG:32607"
    assert crs._resolve("+proj=utm +zone=7 +south") == "EPSG:32707"
    x1, y1 = crs.transform_coords("+proj=utm +zone=32", "EPSG:4326", 691875.63, 6098907.83)
    x2, y2 = crs.transform_coords("EPSG:32632", "EPSG:4326", 691875.63, 6098907.83)
    assert (float(x1), float(y1)) == (float(x2), float(y2))


def test_reprojected_geometry_filter_golden(spark):
    """A layer geometry delivered in EPSG:4326 against the EPSG:21781 grid
    must produce the identical filtered tile set as the native-SRS geometry
    (round-trip error ~1e-8 deg ≈ 1 mm, far from any tile boundary)."""
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.sources import enumerate as EN

    grid = SWISSGRID_5
    layer = LAYERS["polygon"]
    native = parse_wkt(layer.geom_wkt)
    g4326 = GE.transform_geom("EPSG:21781", "EPSG:4326", native)
    geoms_native = GE.resolve_geoms(grid, layer, zooms=range(3))
    geoms_reproj = GE.resolve_geoms(
        grid, layer,
        geom_rows=[{"wkt": _to_wkt(g4326)}],
        zooms=range(3), layer_srs="EPSG:4326",
    )
    tiles = EN.dense_tiles(spark, grid, range(3))
    a = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_native).collect()}
    b = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_reproj).collect()}
    assert a == b and len(a) > 0


def test_reprojected_geometry_filter_utm(spark):
    """The first wall a real user used to hit: a layer geometry delivered in
    UTM (EPSG:32632 — Switzerland's zone) against the EPSG:21781 grid. Must
    produce the identical filtered tile set as the native-SRS geometry."""
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.sources import enumerate as EN

    grid = SWISSGRID_5
    layer = LAYERS["polygon"]
    native = parse_wkt(layer.geom_wkt)
    g_utm = GE.transform_geom("EPSG:21781", "EPSG:32632", native)
    geoms_native = GE.resolve_geoms(grid, layer, zooms=range(3))
    geoms_reproj = GE.resolve_geoms(
        grid, layer,
        geom_rows=[{"wkt": _to_wkt(g_utm)}],
        zooms=range(3), layer_srs="EPSG:32632",
    )
    tiles = EN.dense_tiles(spark, grid, range(3))
    a = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_native).collect()}
    b = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_reproj).collect()}
    assert a == b and len(a) > 0


def _to_wkt(geom) -> str:
    """Minimal WKT writer for test round-trips (polygon parts only)."""
    parts = []
    for kind, payload in geom.parts:
        assert kind == "polygon"
        rings = ", ".join(
            "(" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + ")" for ring in payload
        )
        parts.append(f"({rings})")
    if len(parts) == 1:
        return "POLYGON " + parts[0]
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"



# ---------------------------------------------------------------------------
# EPSG:3395 World Mercator (ellipsoidal) + ETRS89 alias (round 6)


def test_ellipsoidal_mercator_epsg_worked_example():
    """EPSG Guidance Note 7-2, Mercator variant A worked example
    (Makassar / NEIEZ on Bessel 1841, k0=0.997, lon0=110E, FE=3900000,
    FN=900000): lat 3S lon 120E -> E 5009726.58, N 569150.82. Reproducing
    the published numbers validates the ellipsoidal formulas
    independently of EPSG:3395's own parameters."""
    from tilecloud_chain_spark.crs import (
        BESSEL_A, BESSEL_F, _EllipsoidalMercator,
    )

    m = _EllipsoidalMercator(BESSEL_A, BESSEL_F, k0=0.997, lon0_deg=110.0,
                             fe=3_900_000.0, fn=900_000.0)
    x, y = m.fwd(120.0, -3.0)
    assert round(float(x), 2) == 5_009_726.58
    assert round(float(y), 2) == 569_150.82
    lon, lat = m.inv(x, y)
    assert abs(float(lon) - 120.0) < 1e-9 and abs(float(lat) + 3.0) < 1e-9


def test_world_mercator_3395_properties():
    from tilecloud_chain_spark.crs import transform_coords

    # equator is exact-linear and shared with 3857
    xs, ys = transform_coords("EPSG:4326", "EPSG:3395", [0.0, 180.0], [0.0, 0.0])
    assert xs[0] == 0.0 and ys[0] == 0.0
    assert abs(xs[1] - 20037508.342789244) < 1e-6
    # ellipsoidal y < spherical y away from the equator (flattening), and
    # antisymmetric in latitude
    (x95,), (y95,) = transform_coords("EPSG:4326", "EPSG:3395", [7.0], [46.0])
    (x57,), (y57,) = transform_coords("EPSG:4326", "EPSG:3857", [7.0], [46.0])
    assert x95 == x57
    assert 0 < y95 < y57 and (y57 - y95) > 10_000  # ~0.3% at mid-latitudes
    (_,), (yneg,) = transform_coords("EPSG:4326", "EPSG:3395", [7.0], [-46.0])
    assert abs(yneg + y95) < 1e-6
    # round-trip across the globe
    import numpy as np

    lons = np.linspace(-179.0, 179.0, 23)
    lats = np.linspace(-84.0, 84.0, 23)
    xs, ys = transform_coords("EPSG:4326", "EPSG:3395", lons, lats)
    lon2, lat2 = transform_coords("EPSG:3395", "EPSG:4326", xs, ys)
    assert np.allclose(lon2, lons, atol=1e-9)
    assert np.allclose(lat2, lats, atol=1e-9)


def test_etrs89_alias_and_merc_proj4_literals():
    from tilecloud_chain_spark.crs import supported, transform_coords

    assert supported("EPSG:4258")
    (x,), (y,) = transform_coords("EPSG:4258", "EPSG:3857", [7.0], [46.0])
    (x2,), (y2,) = transform_coords("EPSG:4326", "EPSG:3857", [7.0], [46.0])
    assert (x, y) == (x2, y2)
    # proj4 literal routing: spherical merc stays 3857, WGS84-ellipsoid
    # merc resolves to 3395
    (xs,), (_,) = transform_coords(
        "EPSG:4326", "+proj=merc +a=6378137 +b=6378137", [7.0], [46.0])
    (xe,), (ye,) = transform_coords(
        "EPSG:4326", "+proj=merc +ellps=WGS84", [7.0], [46.0])
    (x39,), (y39,) = transform_coords("EPSG:4326", "EPSG:3395", [7.0], [46.0])
    assert xs == xe == x39 and (ye, y39) == (ye, ye)
    assert ye == y39


# ---------------------------------------------------------------------------
# arbitrary +proj=tmerc literals (round 6)


def test_tmerc_literal_equals_utm_registry_path():
    from tilecloud_chain_spark.crs import transform_coords

    lit = "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=500000 +y_0=0 +ellps=WGS84"
    (x1,), (y1,) = transform_coords("EPSG:4326", lit, [12.0], [55.0])
    (x2,), (y2,) = transform_coords("EPSG:4326", "EPSG:32632", [12.0], [55.0])
    assert (x1, y1) == (x2, y2)


_OSGB = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
         "+x_0=400000 +y_0=-100000 +ellps=airy")


def test_tmerc_literal_osgb_worked_example():
    """EPSG GN7-2 TM worked example (OSGB36/BNG, Airy, lat_0=49N): OSGB36
    geodetic 50°30'N 0°30'E -> 577274.99, 69740.50 — through the LITERAL
    parsing path (nonzero lat_0/M0, named non-WGS84 ellipsoid)."""
    from tilecloud_chain_spark.crs import transform_coords

    (e,), (n,) = transform_coords("EPSG:4326", _OSGB, [0.5], [50.5])
    assert abs(float(e) - 577274.99) < 0.02
    assert abs(float(n) - 69740.50) < 0.02


def test_tmerc_literal_towgs84_three_param():
    import numpy as np

    from tilecloud_chain_spark.crs import transform_coords

    shifted = _OSGB + " +towgs84=446.448,-125.157,542.06"
    (e0,), (n0,) = transform_coords("EPSG:4326", _OSGB, [0.5], [50.5])
    (es,), (ns,) = transform_coords("EPSG:4326", shifted, [0.5], [50.5])
    # the OSGB36->WGS84 shift moves BNG coordinates by ~50-150 m
    assert 20 < abs(es - e0) < 500 and 20 < abs(ns - n0) < 500
    # explicit zero shift is the identity wrapper
    (ez,), (nz,) = transform_coords(
        "EPSG:4326", _OSGB + " +towgs84=0,0,0", [0.5], [50.5])
    assert (ez, nz) == (e0, n0)
    # shifted round-trip closes to ~mm through both datum hops
    lon, lat = transform_coords(shifted, "EPSG:4326", [es], [ns])
    assert np.allclose([lon[0], lat[0]], [0.5, 50.5], atol=1e-6)


def test_tmerc_literal_refuses_helmert_and_unknown_ellipsoid():
    import pytest as _pt

    from tilecloud_chain_spark.crs import transform_coords

    with _pt.raises(NotImplementedError, match="Helmert"):
        transform_coords(
            "EPSG:4326",
            _OSGB + " +towgs84=446.448,-125.157,542.06,-0.15,0.247,0.842,-20.489",
            [0.5], [50.5])
    with _pt.raises(NotImplementedError, match="ellipsoid"):
        transform_coords(
            "EPSG:4326", "+proj=tmerc +lon_0=9 +ellps=evrst30", [12.0], [55.0])


def test_merc_literal_makassar_worked_example_and_lat_ts():
    """Generic +proj=merc literal — the GN7-2 Makassar/NEIEZ example
    expressed AS a proj4 literal (variant A, +k), and its variant-B twin
    (+lat_ts chosen so k0 matches: the two literals must agree)."""
    import numpy as np

    from tilecloud_chain_spark.crs import transform_coords

    lit = ("+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 "
           "+ellps=bessel")
    (e,), (n,) = transform_coords("EPSG:4326", lit, [120.0], [-3.0])
    assert round(float(e), 2) == 5_009_726.58
    assert round(float(n), 2) == 569_150.82
    lon, lat = transform_coords(lit, "EPSG:4326", [e], [n])
    assert np.allclose([lon[0], lat[0]], [120.0, -3.0], atol=1e-9)
    # variant B: find lat_ts whose k0 == 0.997 on Bessel, assert agreement
    from tilecloud_chain_spark.crs import BESSEL_F, _e2

    e2 = _e2(BESSEL_F)
    # k0(phi) = cos(phi)/sqrt(1-e2 sin^2 phi); solve by bisection
    lo, hi = 0.0, 10.0
    for _ in range(60):
        mid = (lo + hi) / 2
        p = np.radians(mid)
        k = np.cos(p) / np.sqrt(1 - e2 * np.sin(p) ** 2)
        lo, hi = (mid, hi) if k > 0.997 else (lo, mid)
    lit_b = (f"+proj=merc +lon_0=110 +lat_ts={lo} +x_0=3900000 "
             "+y_0=900000 +ellps=bessel")
    (eb,), (nb,) = transform_coords("EPSG:4326", lit_b, [120.0], [-3.0])
    assert abs(eb - e) < 0.01 and abs(nb - n) < 0.01


def test_longlat_literal_with_datum_shift():
    """+proj=longlat on a non-WGS84 datum WITH +towgs84 is a real datum
    transform (the CH1903 geographic literal must agree with the Swiss
    registered chain); without +towgs84 it stays the WGS84 identity."""
    import numpy as np

    from tilecloud_chain_spark.crs import transform_coords

    ch_geo = "+proj=longlat +ellps=bessel +towgs84=674.374,15.056,405.346"
    # Bern in WGS84 -> CH1903 geodetic via the literal; projecting THOSE
    # coords with the bare somerc (no second shift) must equal the
    # registered EPSG:21781 chain from WGS84 directly
    lon_w, lat_w = 7.438632420871814, 46.95108277227297
    (lon_ch,), (lat_ch,) = transform_coords("EPSG:4326", ch_geo, [lon_w], [lat_w])
    assert abs(lon_ch - lon_w) > 1e-5 and abs(lat_ch - lat_w) > 1e-5  # real shift
    from tilecloud_chain_spark.crs import _LV03

    x_direct, y_direct = _LV03.fwd(lon_ch, lat_ch)
    (x_chain,), (y_chain,) = transform_coords(
        "EPSG:4326", "EPSG:21781", [lon_w], [lat_w])
    assert np.allclose([x_direct, y_direct], [x_chain, y_chain], atol=1e-6)
    # roundtrip closes
    (lon2,), (lat2,) = transform_coords(ch_geo, "EPSG:4326", [lon_ch], [lat_ch])
    assert np.allclose([lon2, lat2], [lon_w, lat_w], atol=1e-9)
    # no +towgs84 -> WGS84 identity (reference-literal back-compat)
    (lx,), (ly,) = transform_coords(
        "EPSG:4326", "+proj=longlat +ellps=bessel", [lon_w], [lat_w])
    assert (lx, ly) == (lon_w, lat_w)


# refuse-loudly token whitelist (round 7, ADVICE r6)


def test_unknown_proj4_tokens_refused_loudly():
    """Tokens the kernels do not honor must raise, never silently drop:
    +datum=OSGB36 (EPSG:27700's canonical literal — silently accepting it
    on WGS84 is a ~120 m error) and +units=km (1000x off)."""
    import pytest

    from tilecloud_chain_spark import crs

    osgb_datum = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                  "+x_0=400000 +y_0=-100000 +datum=OSGB36 +units=m +no_defs")
    with pytest.raises(NotImplementedError, match="datum=OSGB36"):
        crs.transform_coords("EPSG:4326", osgb_datum, [-1.0], [52.0])
    with pytest.raises(NotImplementedError, match="units=km"):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=tmerc +lon_0=9 +ellps=WGS84 +units=km", [9.0], [52.0])
    with pytest.raises(NotImplementedError, match="nadgrids"):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=merc +ellps=WGS84 +nadgrids=real.gsb", [9.0], [52.0])
    # verified no-ops still pass
    assert crs.supported(
        "+proj=merc +ellps=WGS84 +units=m +datum=WGS84 +wktext "
        "+type=crs +no_defs")


def test_bare_a_merc_is_a_sphere_not_3395():
    """PROJ semantics: '+proj=merc +a=6378137' (no +b/+ellps) is a SPHERE
    (es=0) — spherical Mercator = EPSG:3857, NOT ellipsoidal EPSG:3395
    (y diverges ~35 km at 55N). Non-standard radii are refused."""
    import numpy as np
    import pytest

    from tilecloud_chain_spark import crs

    assert crs._resolve("+proj=merc +a=6378137") == "EPSG:3857"
    (xs,), (ys,) = crs.transform_coords(
        "EPSG:4326", "+proj=merc +a=6378137", [9.0], [55.0])
    (x57,), (y57,) = crs.transform_coords("EPSG:4326", "EPSG:3857", [9.0], [55.0])
    assert np.allclose([xs, ys], [x57, y57])
    (_,), (y95,) = crs.transform_coords("EPSG:4326", "EPSG:3395", [9.0], [55.0])
    assert abs(ys - y95) > 30_000  # the aliasing bug this pins against
    with pytest.raises(NotImplementedError, match="sphere|spherical"):
        crs.transform_coords(
            "EPSG:4326", "+proj=merc +a=6300000", [9.0], [55.0])


def test_somerc_and_utm_literal_validation():
    """somerc literals must match the pinned Swiss axis; UTM literals on a
    non-WGS84 ellipsoid (a different grid, e.g. ED50) are refused."""
    import pytest

    from tilecloud_chain_spark import crs

    lv03 = ("+proj=somerc +lat_0=46.95240555555556 "
            "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 "
            "+ellps=bessel +towgs84=674.4,15.1,405.3,0,0,0,0 +units=m +no_defs")
    assert crs._resolve(lv03) == "EPSG:21781"
    lv95 = lv03.replace("+x_0=600000 +y_0=200000", "+x_0=2600000 +y_0=1200000")
    assert crs._resolve(lv95) == "EPSG:2056"
    with pytest.raises(NotImplementedError, match="Swiss"):
        crs._resolve(lv03.replace("+lat_0=46.95240555555556", "+lat_0=45"))
    with pytest.raises(NotImplementedError, match="non-CH1903"):
        crs._resolve(lv03.replace("674.4,15.1,405.3", "600,20,400"))
    with pytest.raises(NotImplementedError, match="ellps=intl"):
        crs._resolve("+proj=utm +zone=32 +ellps=intl")


# ---------------------------------------------------------------------------
# Lambert Conformal Conic (round 7): 2SP + 1SP kernels, EPSG:2154 registry,
# +proj=lcc literals, reprojected geometry-filter golden
# ---------------------------------------------------------------------------


def _dms(d, m, s=0.0):
    return d + m / 60.0 + s / 3600.0


def test_lcc_2sp_epsg_guidance_note_worked_example():
    """EPSG GN7-2 'Lambert Conic Conformal (2SP)' worked example (NAD27 /
    Texas South Central, Clarke 1866, US survey feet): the published
    intermediate constants AND the projected point reproduce exactly."""
    p = crs._LambertConformal(
        lat0_deg=_dms(27, 50), lon0_deg=-99.0,
        fe=2_000_000.0, fn=0.0,
        lat1_deg=_dms(28, 23), lat2_deg=_dms(30, 17),
        a=20_925_832.16, f=1 / 294.97870,  # Clarke 1866 in US ft
    )
    assert p.n == pytest.approx(0.48991263, abs=5e-9)
    assert p.F == pytest.approx(2.31154807, abs=5e-8)
    assert p.r0 == pytest.approx(37_807_441.20, abs=0.02)  # rF
    e, n = p.fwd(-96.0, 28.5)
    assert float(e) == pytest.approx(2_963_503.91, abs=0.01)
    assert float(n) == pytest.approx(254_759.80, abs=0.01)
    lon, lat = p.inv(2_963_503.91, 254_759.80)
    assert float(lon) == pytest.approx(-96.0, abs=1e-7)
    assert float(lat) == pytest.approx(28.5, abs=1e-7)


def test_lcc_1sp_epsg_guidance_note_worked_example():
    """EPSG GN7-2 'Lambert Conic Conformal (1SP)' worked example (Jamaica
    1969, Clarke 1866 meters, k0=1): published point reproduces exactly."""
    p = crs._LambertConformal(
        lat0_deg=18.0, lon0_deg=-77.0, fe=250_000.0, fn=150_000.0,
        k0=1.0, a=6_378_206.400, f=1 / 294.97870,
    )
    e, n = p.fwd(-_dms(76, 56, 37.26), _dms(17, 55, 55.80))
    assert float(e) == pytest.approx(255_966.58, abs=0.01)
    assert float(n) == pytest.approx(142_493.51, abs=0.01)


def test_lcc_scale_unity_on_standard_parallels():
    """The conic's DEFINING property, checked numerically (independent of
    any remembered golden): linear scale along both standard parallels is
    exactly 1; between them < 1; outside > 1."""
    a, f = crs.GRS80_A, crs.GRS80_F
    p = crs._LambertConformal(
        lat0_deg=46.5, lon0_deg=3.0, fe=0.0, fn=0.0,
        lat1_deg=49.0, lat2_deg=44.0, a=a, f=f,
    )
    e2 = (2 - f) * f

    def scale(phi_deg):
        dlon = 1e-6
        x1, y1 = p.fwd(2.0, phi_deg)
        x2, y2 = p.fwd(2.0 + dlon, phi_deg)
        dist = float(np.hypot(x2 - x1, y2 - y1))
        nu = a / np.sqrt(1 - e2 * np.sin(np.radians(phi_deg)) ** 2)
        return dist / float(np.radians(dlon) * nu * np.cos(np.radians(phi_deg)))

    assert scale(49.0) == pytest.approx(1.0, abs=1e-7)
    assert scale(44.0) == pytest.approx(1.0, abs=1e-7)
    assert scale(46.5) < 1.0 - 1e-5
    assert scale(51.0) > 1.0 + 1e-5


def test_lcc_epsg_2154_registry_and_literal():
    """EPSG:2154 (RGF93 / Lambert-93): the natural origin (3°E, 46.5°N)
    lands on the false origin EXACTLY by construction; the canonical
    +proj=lcc literal resolves to the same kernel; round-trip over the
    extent of France is machine precision."""
    e, n = crs.transform_coords("EPSG:4326", "EPSG:2154", [3.0], [46.5])
    assert float(e[0]) == pytest.approx(700_000.0, abs=1e-6)
    assert float(n[0]) == pytest.approx(6_600_000.0, abs=1e-6)

    lit = ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
           "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs")
    for lon, lat in [(2.3522, 48.8566), (5.37, 43.30), (-1.55, 47.22)]:
        xr, yr = crs.transform_coords("EPSG:4326", "EPSG:2154", [lon], [lat])
        xl, yl = crs.transform_coords("EPSG:4326", lit, [lon], [lat])
        assert float(xl[0]) == pytest.approx(float(xr[0]), abs=1e-9)
        assert float(yl[0]) == pytest.approx(float(yr[0]), abs=1e-9)
        back = crs.transform_coords("EPSG:2154", "EPSG:4326", xr, yr)
        assert float(back[0][0]) == pytest.approx(lon, abs=1e-9)
        assert float(back[1][0]) == pytest.approx(lat, abs=1e-9)
    # Paris sanity window (±2 km around the well-known Lambert-93 value)
    xp, yp = crs.transform_coords("EPSG:4326", "EPSG:2154", [2.3522], [48.8566])
    assert abs(float(xp[0]) - 652_000) < 2_000
    assert abs(float(yp[0]) - 6_862_000) < 2_000


def test_lcc_literal_validation():
    with pytest.raises(NotImplementedError, match="lat_1.*lat_0|lat_0.*lat_1"):
        crs.transform_coords("EPSG:4326", "+proj=lcc +ellps=GRS80", [1.0], [1.0])
    with pytest.raises(NotImplementedError, match="not implemented"):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +ellps=GRS80 "
            "+units=km", [1.0], [46.0],
        )
    # 3-param datum shift composes (NTF-era style shift, magnitude check):
    # shifting the datum must move the result by roughly the shift size
    base = crs.transform_coords(
        "EPSG:4326",
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +ellps=GRS80",
        [3.0], [46.5])
    shifted = crs.transform_coords(
        "EPSG:4326",
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +ellps=GRS80 "
        "+towgs84=-168,-60,320",
        [3.0], [46.5])
    d = float(np.hypot(shifted[0][0] - base[0][0], shifted[1][0] - base[1][0]))
    assert 150 < d < 600


def test_reprojected_geometry_filter_lcc(spark):
    """Layer geometry delivered in Lambert-93 against the Swiss grid must
    produce the identical filtered tile set as the native-SRS geometry
    (the same guarantee test_reprojected_geometry_filter_utm pins for UTM)."""
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.sources import enumerate as EN

    grid = SWISSGRID_5
    layer = LAYERS["polygon"]
    native = parse_wkt(layer.geom_wkt)
    g_lcc = GE.transform_geom("EPSG:21781", "EPSG:2154", native)
    geoms_native = GE.resolve_geoms(grid, layer, zooms=range(3))
    geoms_reproj = GE.resolve_geoms(
        grid, layer,
        geom_rows=[{"wkt": _to_wkt(g_lcc)}],
        zooms=range(3), layer_srs="EPSG:2154",
    )
    tiles = EN.dense_tiles(spark, grid, range(3))
    a = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_native).collect()}
    b = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_reproj).collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area (round 7): EPSG:3035 (EU grid), +proj=laea
# literals, equal-area Jacobian check, reprojected geometry-filter golden
# ---------------------------------------------------------------------------


def test_laea_epsg_guidance_note_worked_example():
    """EPSG GN7-2 'Lambert Azimuthal Equal Area' worked example
    (ETRS89-extended / LAEA Europe): 50°N 5°E reproduces the published
    easting/northing exactly, and inverts to machine precision."""
    e, n = crs.transform_coords("EPSG:4326", "EPSG:3035", [5.0], [50.0])
    assert float(e[0]) == pytest.approx(3_962_799.45, abs=0.01)
    assert float(n[0]) == pytest.approx(2_999_718.85, abs=0.01)
    lon, lat = crs.transform_coords("EPSG:3035", "EPSG:4326", e, n)
    assert float(lon[0]) == pytest.approx(5.0, abs=1e-12)
    assert float(lat[0]) == pytest.approx(50.0, abs=1e-12)
    # natural origin lands on the false origin by construction
    e0, n0 = crs.transform_coords("EPSG:4326", "EPSG:3035", [10.0], [52.0])
    assert float(e0[0]) == pytest.approx(4_321_000.0, abs=1e-6)
    assert float(n0[0]) == pytest.approx(3_210_000.0, abs=1e-6)


def test_laea_equal_area_jacobian():
    """The projection's DEFINING property, checked numerically (independent
    of any remembered golden): the Jacobian determinant of (E, N) wrt
    (lon, lat) equals the ellipsoid's area element
    a²(1-e²)cosφ/(1-e²sin²φ)² at every probe point — areal scale is 1."""
    a, f = crs.GRS80_A, crs.GRS80_F
    e2 = (2 - f) * f
    p = crs._LambertAzimuthalEqualArea(
        lat0_deg=52.0, lon0_deg=10.0, fe=0.0, fn=0.0, a=a, f=f
    )
    d = 1e-6
    for lon, lat in [(10.0, 52.0), (5.0, 50.0), (25.0, 65.0), (-8.0, 38.0)]:
        x0, y0 = p.fwd(lon, lat)
        xl, yl = p.fwd(lon + d, lat)
        xp, yp = p.fwd(lon, lat + d)
        jac = abs(
            (float(xl - x0) * float(yp - y0) - float(xp - x0) * float(yl - y0))
        ) / (d * d * crs._D2R ** 2)
        sp = np.sin(np.radians(lat))
        want = a * a * (1 - e2) * np.cos(np.radians(lat)) / (1 - e2 * sp**2) ** 2
        assert jac == pytest.approx(float(want), rel=1e-5), (lon, lat)


def test_laea_literal_and_validation():
    lit = ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80 +units=m +no_defs")
    for lon, lat in [(5.0, 50.0), (24.0, 61.0), (-3.7, 40.4)]:
        xr, yr = crs.transform_coords("EPSG:4326", "EPSG:3035", [lon], [lat])
        xl, yl = crs.transform_coords("EPSG:4326", lit, [lon], [lat])
        assert float(xl[0]) == float(xr[0]) and float(yl[0]) == float(yr[0])
    with pytest.raises(NotImplementedError, match="not implemented"):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=laea +lat_0=52 +lon_0=10 +ellps=GRS80 +units=km",
            [1.0], [46.0],
        )
    # 3-param datum shift composes: shifting the datum moves the result by
    # roughly the shift magnitude
    base = crs.transform_coords(
        "EPSG:4326", "+proj=laea +lat_0=52 +lon_0=10 +ellps=GRS80",
        [10.0], [52.0])
    shifted = crs.transform_coords(
        "EPSG:4326",
        "+proj=laea +lat_0=52 +lon_0=10 +ellps=GRS80 +towgs84=-87,-98,-121",
        [10.0], [52.0])
    dd = float(np.hypot(shifted[0][0] - base[0][0], shifted[1][0] - base[1][0]))
    assert 50 < dd < 300  # horizontal component of a ~179 m 3D shift


def test_reprojected_geometry_filter_laea(spark):
    """Layer geometry delivered in EPSG:3035 against the Swiss grid must
    produce the identical filtered tile set as the native-SRS geometry
    (same guarantee as the UTM and Lambert-93 goldens)."""
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.sources import enumerate as EN

    grid = SWISSGRID_5
    layer = LAYERS["polygon"]
    native = parse_wkt(layer.geom_wkt)
    g_laea = GE.transform_geom("EPSG:21781", "EPSG:3035", native)
    geoms_native = GE.resolve_geoms(grid, layer, zooms=range(3))
    geoms_reproj = GE.resolve_geoms(
        grid, layer,
        geom_rows=[{"wkt": _to_wkt(g_laea)}],
        zooms=range(3), layer_srs="EPSG:3035",
    )
    tiles = EN.dense_tiles(spark, grid, range(3))
    a = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_native).collect()}
    b = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(tiles, grid, geoms_reproj).collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Polar Stereographic (round 7): UPS (variant A), NSIDC sea-ice grids
# (variant B), +proj=stere polar literals
# ---------------------------------------------------------------------------


def test_ups_epsg_guidance_note_worked_example():
    """EPSG GN7-2 'Polar Stereographic variant A' worked example (WGS84 /
    UPS North, k0=0.994): 73°N 44°E reproduces the published coordinates
    exactly; the pole lands on the false origin; the south aspect mirrors."""
    e, n = crs.transform_coords("EPSG:4326", "EPSG:5041", [44.0], [73.0])
    assert float(e[0]) == pytest.approx(3_320_416.75, abs=0.01)
    assert float(n[0]) == pytest.approx(632_668.43, abs=0.01)
    lon, lat = crs.transform_coords("EPSG:5041", "EPSG:4326", e, n)
    assert float(lon[0]) == pytest.approx(44.0, abs=1e-12)
    assert float(lat[0]) == pytest.approx(73.0, abs=1e-12)
    e0, n0 = crs.transform_coords("EPSG:4326", "EPSG:5041", [17.0], [90.0])
    assert float(e0[0]) == pytest.approx(2_000_000.0, abs=1e-6)
    assert float(n0[0]) == pytest.approx(2_000_000.0, abs=1e-6)
    # south aspect: the mirrored point lands at the mirrored offset
    es, ns = crs.transform_coords("EPSG:4326", "EPSG:5042", [44.0], [-73.0])
    assert float(es[0]) == pytest.approx(float(e[0]), abs=1e-6)
    assert float(ns[0]) == pytest.approx(4_000_000.0 - float(n[0]), abs=1e-6)


def test_polar_stereographic_defining_properties():
    """Numeric checks independent of any remembered golden: the projection
    is CONFORMAL (locally isotropic scale at every probe) and variant B's
    linear scale is exactly 1 on its standard parallel."""
    a, f = crs.WGS84_A, crs.WGS84_F
    e2 = (2 - f) * f
    p = crs._PolarStereographic(False, 0.0, 0.0, lon0_deg=-45.0, lat_ts_deg=70.0)
    d = 1e-7

    def scales(lon, lat):
        x0, y0 = p.fwd(lon, lat)
        xl, yl = p.fwd(lon + d, lat)
        xp, yp = p.fwd(lon, lat + d)
        sp = np.sin(np.radians(lat))
        nu = a / np.sqrt(1 - e2 * sp**2)
        rho = a * (1 - e2) / (1 - e2 * sp**2) ** 1.5
        k_lon = float(np.hypot(xl - x0, yl - y0)) / (
            d * crs._D2R * nu * np.cos(np.radians(lat)))
        k_lat = float(np.hypot(xp - x0, yp - y0)) / (d * crs._D2R * rho)
        return k_lon, k_lat

    for lon, lat in [(0.0, 70.0), (-45.0, 85.0), (120.0, 66.0), (30.0, 75.0)]:
        k_lon, k_lat = scales(lon, lat)
        assert k_lon == pytest.approx(k_lat, rel=1e-6), (lon, lat)  # conformal
    k_lon, _ = scales(13.0, 70.0)
    # finite-difference derivative carries ~1e-8 noise at d=1e-7
    assert k_lon == pytest.approx(1.0, abs=1e-6)  # variant B standard parallel
    k_lon, _ = scales(13.0, 66.0)
    assert k_lon > 1.0 + 1e-4  # grows away from the parallel


def test_stere_literals_and_validation():
    lit_b = ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
             "+ellps=WGS84 +units=m +no_defs")
    for lon, lat in [(-30.0, 75.0), (100.0, 82.0)]:
        xr, yr = crs.transform_coords("EPSG:4326", "EPSG:3413", [lon], [lat])
        xl, yl = crs.transform_coords("EPSG:4326", lit_b, [lon], [lat])
        assert float(xl[0]) == float(xr[0]) and float(yl[0]) == float(yr[0])
    lit_a = "+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 +ellps=WGS84"
    xr, yr = crs.transform_coords("EPSG:4326", "EPSG:5041", [44.0], [73.0])
    xl, yl = crs.transform_coords("EPSG:4326", lit_a, [44.0], [73.0])
    assert float(xl[0]) == float(xr[0]) and float(yl[0]) == float(yr[0])
    # oblique stereographic is a DIFFERENT projection — refused loudly
    with pytest.raises(NotImplementedError, match="POLAR"):
        crs.transform_coords(
            "EPSG:4326", "+proj=stere +lat_0=52 +lon_0=5 +ellps=WGS84",
            [5.0], [52.0])
    # underdetermined polar literal (no k, no lat_ts) defaults to the pole
    # as its standard parallel (k0=1) — PROJ's behavior
    x1, _ = crs.transform_coords(
        "EPSG:4326", "+proj=stere +lat_0=90 +ellps=WGS84", [44.0], [73.0])
    x2, _ = crs.transform_coords(
        "EPSG:4326", "+proj=stere +lat_0=90 +lat_ts=90 +ellps=WGS84",
        [44.0], [73.0])
    assert float(x1[0]) == pytest.approx(float(x2[0]), abs=1e-9)


def test_south_polar_roundtrip():
    lons = np.linspace(-180.0, 180.0, 19)
    lats = np.linspace(-89.9, -60.0, 11)
    lo, la = (a.ravel() for a in np.meshgrid(lons, lats))
    px, py = crs.transform_coords("EPSG:4326", "EPSG:3976", lo, la)
    lo2, la2 = crs.transform_coords("EPSG:3976", "EPSG:4326", px, py)
    dl = (np.abs(lo2 - lo) + 180.0) % 360.0 - 180.0
    assert np.abs(dl).max() < 1e-9
    assert np.abs(la2 - la).max() < 1e-9


# ---------------------------------------------------------------------------
# Albers Equal Area (round 7): EPSG:5070 Conus Albers, +proj=aea literals
# ---------------------------------------------------------------------------


def test_aea_defining_properties():
    """Numeric checks independent of any remembered golden: areal scale is
    exactly 1 everywhere (Jacobian == ellipsoid area element) and linear
    scale ALONG each standard parallel is exactly 1."""
    a, f = crs.GRS80_A, crs.GRS80_F
    e2 = (2 - f) * f
    p = crs._AlbersEqualArea(
        lat0_deg=23.0, lon0_deg=-96.0, fe=0.0, fn=0.0,
        lat1_deg=29.5, lat2_deg=45.5, a=a, f=f,
    )
    d = 1e-6

    def probe(lon, lat):
        x0, y0 = p.fwd(lon, lat)
        xl, yl = p.fwd(lon + d, lat)
        xp, yp = p.fwd(lon, lat + d)
        sp = np.sin(np.radians(lat))
        nu = a / np.sqrt(1 - e2 * sp**2)
        jac = abs(
            float(xl - x0) * float(yp - y0) - float(xp - x0) * float(yl - y0)
        ) / (d * d * crs._D2R**2)
        area_el = a * a * (1 - e2) * np.cos(np.radians(lat)) / (1 - e2 * sp**2) ** 2
        k_par = float(np.hypot(xl - x0, yl - y0)) / (
            d * crs._D2R * nu * np.cos(np.radians(lat)))
        return jac / float(area_el), k_par

    for lon, lat in [(-96.0, 23.0), (-120.0, 40.0), (-75.0, 45.0), (-96.0, 37.5)]:
        ratio, _ = probe(lon, lat)
        assert ratio == pytest.approx(1.0, rel=1e-5), (lon, lat)
    for lat in (29.5, 45.5):
        _, k = probe(-96.0, lat)
        assert k == pytest.approx(1.0, abs=1e-6), lat
    _, k_mid = probe(-96.0, 37.5)
    assert k_mid < 1.0 - 1e-4  # compressed between the parallels


def test_aea_epsg_5070_registry_literal_and_roundtrip():
    e, n = crs.transform_coords("EPSG:4326", "EPSG:5070", [-96.0], [23.0])
    assert float(e[0]) == pytest.approx(0.0, abs=1e-9)
    assert float(n[0]) == pytest.approx(0.0, abs=1e-9)
    lit = ("+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
           "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs")
    lons = np.linspace(-124.0, -67.0, 12)
    lats = np.linspace(25.0, 49.0, 9)
    lo, la = (v.ravel() for v in np.meshgrid(lons, lats))
    xr, yr = crs.transform_coords("EPSG:4326", "EPSG:5070", lo, la)
    xl, yl = crs.transform_coords("EPSG:4326", lit, lo, la)
    assert np.array_equal(xr, xl) and np.array_equal(yr, yl)
    lo2, la2 = crs.transform_coords("EPSG:5070", "EPSG:4326", xr, yr)
    assert np.abs(lo2 - lo).max() < 1e-11
    assert np.abs(la2 - la).max() < 1e-11
    with pytest.raises(NotImplementedError, match="lat_1"):
        crs.transform_coords("EPSG:4326", "+proj=aea +ellps=GRS80", [1.0], [1.0])


def test_lcc_aea_equatorial_parallel_refused():
    """Cone constant n = sin(0) = 0 degenerates the conic to a cylinder;
    the kernel must refuse loudly instead of registering inf/nan math
    (r7 ADVICE — the silent numpy divide-by-zero path)."""
    # LCC 1SP with the standard parallel at the equator
    with pytest.raises(NotImplementedError, match="[nN]=0|equator|cylind"):
        crs.transform_coords(
            "EPSG:4326", "+proj=lcc +lat_0=0 +lon_0=0 +ellps=GRS80",
            [1.0], [1.0])
    # LCC 2SP with parallels symmetric about the equator (log-ratio n=0)
    with pytest.raises(NotImplementedError):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=lcc +lat_1=10 +lat_2=-10 +lat_0=0 +lon_0=0 +ellps=GRS80",
            [1.0], [1.0])
    # Albers with both parallels at the equator
    with pytest.raises(NotImplementedError):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=aea +lat_1=0 +lat_2=0 +lat_0=0 +lon_0=0 +ellps=GRS80",
            [1.0], [1.0])
    # Albers symmetric about the equator
    with pytest.raises(NotImplementedError):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=aea +lat_1=20 +lat_2=-20 +lat_0=0 +lon_0=0 +ellps=GRS80",
            [1.0], [1.0])


# ---------------------------------------------------------------------------
# Hotine Oblique Mercator (round 8): EPSG method 9812 (variant A) + 9815
# (variant B / RSO), EPSG:29873 registry pin, +proj=omerc literals
# ---------------------------------------------------------------------------

_RSO_LIT = ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
            "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
            "+y_0=442857.65 +ellps=evrstSS")
_RSO_PT = (115.0 + 48.0 / 60.0 + 19.8196 / 3600.0,
           5.0 + 23.0 / 60.0 + 14.1129 / 3600.0)


def test_omerc_epsg_guidance_note_worked_example():
    """EPSG GN7-2 'Hotine Oblique Mercator (variant B)' worked example —
    Timbalai 1948 / RSO Borneo (m): the test point at 5d23'14.1129N,
    115d48'19.8196E must land on E 679245.73, N 596562.78 (published to
    cm). Implemented first, golden checked by reproduction (r7 memory
    protocol); the intermediate constants B=1.003303209 and
    A=6376278.686 reproduce too."""
    from tilecloud_chain_spark.crs import _HotineObliqueMercator

    hom = _HotineObliqueMercator(
        latc_deg=4.0, lonc_deg=115.0,
        alpha_deg=53.0 + 18.0 / 60.0 + 56.9537 / 3600.0,
        gamma_deg=53.0 + 7.0 / 60.0 + 48.3685 / 3600.0,
        kc=0.99984, fe=590476.87, fn=442857.65,
        variant_b=True, a=6377298.556, f=1.0 / 300.8017)
    assert hom.B == pytest.approx(1.003303209, abs=1e-9)
    assert hom.A == pytest.approx(6376278.686, abs=1e-3)
    e, n = hom.fwd([_RSO_PT[0]], [_RSO_PT[1]])
    assert e[0] == pytest.approx(679245.73, abs=0.02)
    assert n[0] == pytest.approx(596562.78, abs=0.02)
    # the projection centre maps exactly to (Ec, Nc) in variant B
    ec, nc = hom.fwd([115.0], [4.0])
    assert ec[0] == pytest.approx(590476.87, abs=1e-6)
    assert nc[0] == pytest.approx(442857.65, abs=1e-6)
    # literal arm reproduces the same kernel
    x, y = crs.transform_coords("EPSG:4326", _RSO_LIT,
                                [_RSO_PT[0]], [_RSO_PT[1]])
    assert x[0] == pytest.approx(e[0], abs=1e-6)
    assert y[0] == pytest.approx(n[0], abs=1e-6)


def test_omerc_defining_properties():
    """Numeric checks of the math, not remembered numbers: conformality
    (isotropic local scale at every probe), local scale == kc exactly AT
    the projection centre, fwd-inv round-trip to machine precision, and
    the variant A/B relation (a rigid |uc| shift along the rotated u
    axis)."""
    import math

    from tilecloud_chain_spark.crs import _HotineObliqueMercator

    kw = dict(latc_deg=4.0, lonc_deg=115.0,
              alpha_deg=53.0 + 18.0 / 60.0 + 56.9537 / 3600.0,
              gamma_deg=53.0 + 7.0 / 60.0 + 48.3685 / 3600.0,
              kc=0.99984, a=6377298.556, f=1.0 / 300.8017)
    hom = _HotineObliqueMercator(fe=0.0, fn=0.0, variant_b=True, **kw)
    e2 = hom.e2
    d = 1e-6
    for lon, lat in [(115.0, 4.0), (116.2, 5.1), (113.5, 2.3), (117.0, 6.5)]:
        x0, y0 = hom.fwd([lon], [lat])
        xe, ye = hom.fwd([lon + d], [lat])
        xn, yn = hom.fwd([lon], [lat + d])
        p = math.radians(lat)
        nrad = kw["a"] / math.sqrt(1 - e2 * math.sin(p) ** 2)
        mrad = kw["a"] * (1 - e2) / (1 - e2 * math.sin(p) ** 2) ** 1.5
        ge = math.hypot(xe[0] - x0[0], ye[0] - y0[0]) / (
            math.radians(d) * nrad * math.cos(p))
        gn = math.hypot(xn[0] - x0[0], yn[0] - y0[0]) / (
            math.radians(d) * mrad)
        assert ge == pytest.approx(gn, rel=1e-5), (lon, lat)  # conformal
        if (lon, lat) == (115.0, 4.0):
            assert ge == pytest.approx(0.99984, rel=1e-5)  # scale == kc
        # round-trip
        lo, la = hom.inv(x0, y0)
        assert lo[0] == pytest.approx(lon, abs=1e-9)
        assert la[0] == pytest.approx(lat, abs=1e-9)
    # variant A = variant B shifted by |uc| along the rotated u axis
    hom_a = _HotineObliqueMercator(fe=0.0, fn=0.0, variant_b=False, **kw)
    xb, yb = hom.fwd([116.0], [5.0])
    xa, ya = hom_a.fwd([116.0], [5.0])
    uc = abs(hom.uc)
    assert xa[0] - xb[0] == pytest.approx(uc * math.sin(hom.gammac), abs=1e-6)
    assert ya[0] - yb[0] == pytest.approx(uc * math.cos(hom.gammac), abs=1e-6)
    # +no_off literal selects variant A
    xl, yl = crs.transform_coords(
        "EPSG:4326",
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
        "+gamma=53.13010236111111 +k=0.99984 +ellps=evrstSS +no_off",
        [116.0], [5.0])
    assert xl[0] == pytest.approx(xa[0], abs=1e-6)
    assert yl[0] == pytest.approx(ya[0], abs=1e-6)


def test_omerc_epsg_29873_registry_and_refusals():
    """EPSG:29873 (Timbalai RSO Borneo) is registered with the 3-param
    datum shift and round-trips; degenerate/unimplemented omerc forms are
    refused loudly."""
    e, n = crs.transform_coords("EPSG:4326", "EPSG:29873", [115.5], [5.0])
    lo, la = crs.transform_coords("EPSG:29873", "EPSG:4326", e, n)
    assert lo[0] == pytest.approx(115.5, abs=1e-7)
    assert la[0] == pytest.approx(5.0, abs=1e-7)
    # the datum shift is live: ~ hundreds of meters vs the shiftless kernel
    e0, n0 = crs.transform_coords("EPSG:4326", _RSO_LIT, [115.5], [5.0])
    assert 100 < abs(e[0] - e0[0]) + abs(n[0] - n0[0]) < 2000
    with pytest.raises(NotImplementedError, match="two-point"):
        crs.transform_coords(
            "EPSG:4326",
            "+proj=omerc +lat_1=1 +lon_1=110 +lat_2=5 +lon_2=116 +ellps=WGS84",
            [1.0], [1.0])
    with pytest.raises(NotImplementedError, match="alpha"):
        crs.transform_coords(
            "EPSG:4326", "+proj=omerc +lat_0=47 +lonc=19 +alpha=90 +ellps=WGS84",
            [1.0], [1.0])
    with pytest.raises(NotImplementedError, match="equator|pole"):
        crs.transform_coords(
            "EPSG:4326", "+proj=omerc +lat_0=0 +lonc=115 +alpha=53 +ellps=WGS84",
            [1.0], [1.0])


def test_reprojected_geometry_filter_omerc(spark):
    """Layer geometry delivered in RSO Borneo grid coordinates against the
    Swiss grid must produce the identical filtered tile set as the
    native-SRS geometry (same guarantee as the LCC/LAEA/UTM goldens)."""
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.sources import enumerate as EN

    grid = SWISSGRID_5
    layer = LAYERS["polygon"]
    native = parse_wkt(layer.geom_wkt)
    g_rso = GE.transform_geom("EPSG:21781", "EPSG:29873", native)
    geoms_native = GE.resolve_geoms(grid, layer, zooms=range(3))
    geoms_reproj = GE.resolve_geoms(
        grid, layer,
        geom_rows=[{"wkt": _to_wkt(g_rso)}],
        zooms=range(3), layer_srs="EPSG:29873",
    )
    tiles = EN.dense_tiles(spark, grid, range(3))
    a = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(
        tiles, grid, geoms_native).collect()}
    b = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(
        tiles, grid, geoms_reproj).collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# Oblique ("double") Stereographic (round 8): EPSG method 9809,
# EPSG:28992 Netherlands RD New, +proj=sterea literals
# ---------------------------------------------------------------------------

_RD_LIT = ("+proj=sterea +lat_0=52.156160555555556 +lon_0=5.387638888888889 "
           "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")


def test_sterea_epsg_guidance_note_worked_example():
    """EPSG GN7-2 'Oblique Stereographic' worked example — Amersfoort /
    RD New: 53N 6E must land on E 196105.283, N 557057.739 (published to
    mm; reproduced to sub-mm). Implemented first, golden checked by
    reproduction (r7 memory protocol)."""
    from tilecloud_chain_spark.crs import _ObliqueStereographic

    st = _ObliqueStereographic(
        lat0_deg=52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
        lon0_deg=5.0 + 23.0 / 60.0 + 15.500 / 3600.0,
        k0=0.9999079, fe=155000.0, fn=463000.0,
        a=6377397.155, f=1.0 / 299.15281)
    e, n = st.fwd([6.0], [53.0])
    assert e[0] == pytest.approx(196105.283, abs=2e-3)
    assert n[0] == pytest.approx(557057.739, abs=2e-3)
    # origin maps exactly to (FE, FN)
    oe, on = st.fwd([5.0 + 23.0 / 60.0 + 15.5 / 3600.0],
                    [52.0 + 9.0 / 60.0 + 22.178 / 3600.0])
    assert oe[0] == pytest.approx(155000.0, abs=1e-6)
    assert on[0] == pytest.approx(463000.0, abs=1e-6)
    # literal arm reproduces the same kernel
    x, y = crs.transform_coords("EPSG:4326", _RD_LIT, [6.0], [53.0])
    assert x[0] == pytest.approx(e[0], abs=1e-6)
    assert y[0] == pytest.approx(n[0], abs=1e-6)


def test_sterea_defining_properties():
    """Numeric checks, not remembered numbers: conformality (isotropic
    local scale at every probe), scale == k0 at the origin, round-trip to
    machine precision; the polar +proj=stere arm still refuses the
    oblique aspect and points at sterea."""
    import math

    from tilecloud_chain_spark.crs import _ObliqueStereographic

    st = _ObliqueStereographic(
        lat0_deg=52.156160556, lon0_deg=5.387638889,
        k0=0.9999079, fe=0.0, fn=0.0,
        a=6377397.155, f=1.0 / 299.15281)
    e2 = st.e2
    d = 1e-6
    for lon, lat in [(5.387638889, 52.156160556), (6.0, 53.0),
                     (4.2, 51.2), (7.1, 53.6)]:
        x0, y0 = st.fwd([lon], [lat])
        xe, ye = st.fwd([lon + d], [lat])
        xn, yn = st.fwd([lon], [lat + d])
        p = math.radians(lat)
        nrad = st.a / math.sqrt(1 - e2 * math.sin(p) ** 2)
        mrad = st.a * (1 - e2) / (1 - e2 * math.sin(p) ** 2) ** 1.5
        ge = math.hypot(xe[0] - x0[0], ye[0] - y0[0]) / (
            math.radians(d) * nrad * math.cos(p))
        gn = math.hypot(xn[0] - x0[0], yn[0] - y0[0]) / (
            math.radians(d) * mrad)
        assert ge == pytest.approx(gn, rel=1e-5), (lon, lat)  # conformal
        if lat == 52.156160556:
            assert ge == pytest.approx(0.9999079, rel=1e-6)
        lo, la = st.inv(x0, y0)
        assert lo[0] == pytest.approx(lon, abs=1e-9)
        assert la[0] == pytest.approx(lat, abs=1e-9)
    # registry round-trips through the datum shift
    e, n = crs.transform_coords("EPSG:4326", "EPSG:28992", [5.5], [52.2])
    lo, la = crs.transform_coords("EPSG:28992", "EPSG:4326", e, n)
    assert lo[0] == pytest.approx(5.5, abs=1e-7)
    assert la[0] == pytest.approx(52.2, abs=1e-7)
    # the shift is live (~100+ m vs the shiftless literal kernel)
    e0, n0 = crs.transform_coords("EPSG:4326", _RD_LIT, [5.5], [52.2])
    assert 50 < abs(e[0] - e0[0]) + abs(n[0] - n0[0]) < 500
    with pytest.raises(NotImplementedError, match="sterea"):
        crs.transform_coords(
            "EPSG:4326", "+proj=stere +lat_0=52 +lon_0=5 +ellps=bessel",
            [5.0], [52.0])
    with pytest.raises(NotImplementedError, match="polar"):
        crs.transform_coords(
            "EPSG:4326", "+proj=sterea +lat_0=90 +lon_0=0 +ellps=WGS84",
            [5.0], [80.0])


def test_reprojected_geometry_filter_sterea(spark):
    """Layer geometry delivered in RD New grid coordinates against the
    Swiss grid must produce the identical filtered tile set as the
    native-SRS geometry."""
    from tilecloud_chain_spark.operators import filters as FL
    from tilecloud_chain_spark.sources import enumerate as EN

    grid = SWISSGRID_5
    layer = LAYERS["polygon"]
    native = parse_wkt(layer.geom_wkt)
    g_rd = GE.transform_geom("EPSG:21781", "EPSG:28992", native)
    geoms_native = GE.resolve_geoms(grid, layer, zooms=range(3))
    geoms_reproj = GE.resolve_geoms(
        grid, layer,
        geom_rows=[{"wkt": _to_wkt(g_rd)}],
        zooms=range(3), layer_srs="EPSG:28992",
    )
    tiles = EN.dense_tiles(spark, grid, range(3))
    a = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(
        tiles, grid, geoms_native).collect()}
    b = {(r.z, r.x, r.y) for r in FL.geom_intersect_filter(
        tiles, grid, geoms_reproj).collect()}
    assert a == b and len(a) > 0
