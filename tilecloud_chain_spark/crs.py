"""General CRS transforms without pyproj — pure numpy, public formulas.

The reference reprojects geometries/bboxes from any layer SRS to the grid CRS
(``transform_bbox``, /root/reference/tilecloud_chain/__init__.py:874-904, and
``get_geoms`` reprojection :1887-1903) through pyproj. This environment ships
no pyproj, so the CRS pairs the reference's fixtures and tests actually use
are implemented from their published definitions:

- **EPSG:4326 <-> EPSG:3857** (and the ``+proj=merc +a=6378137 +b=6378137``
  literal from the reference's own test_transform_bbox): spherical web
  Mercator — Snyder, "Map Projections: A Working Manual" (USGS PP 1395),
  eq. 7-1/7-2.
- **EPSG:21781 (CH1903/LV03) and EPSG:2056 (CH1903+/LV95) <-> WGS84**: the
  Swiss Oblique Mercator cylindrical ("double projection" through an
  intermediate sphere) from the swisstopo publication *"Formulas and
  constants for the calculation of the Swiss conformal cylindrical
  projection and for the transformation between coordinate systems"*
  (public), plus the EPSG-registered 3-parameter geocentric translation
  CH1903 -> WGS84 (674.374, 15.056, 405.346 m).

Accuracy evidence (no pyproj in this environment): (a) the reference's OWN
pinned PostGIS ``ST_Transform(…, 21781)`` coordinates (proj-computed,
tests/test_expiretiles.py:38-52) are reproduced through this chain to
~5e-9 m (tests/test_expire.py); (b) the exact chain agrees with swisstopo's
*independently published* approximate polynomial formulas within their
stated ~1-2 m accuracy over the Swiss interior; (c) every projection
round-trips fwd∘inv to <1e-9; (d) the LV03 origin lands on Bern's published
WGS84 position. All functions are vectorized numpy (scalars or arrays),
so geometry rings reproject in one call, driver-side, before broadcast —
reprojection never touches the distributed plan.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# ellipsoids + datum
# --------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
BESSEL_A = 6377397.155
BESSEL_F = 1.0 / 299.1528128
# EPSG:1766 — CH1903 to WGS 84 geocentric translation (meters)
_CH_SHIFT = np.array([674.374, 15.056, 405.346])

_D2R = np.pi / 180.0
_R2D = 180.0 / np.pi


def _e2(f: float) -> float:
    return f * (2.0 - f)


def _geodetic_to_xyz(lon_deg, lat_deg, a: float, f: float):
    """Geodetic (deg, h=0) -> geocentric cartesian."""
    lon = np.asarray(lon_deg, dtype=np.float64) * _D2R
    lat = np.asarray(lat_deg, dtype=np.float64) * _D2R
    e2 = _e2(f)
    n = a / np.sqrt(1.0 - e2 * np.sin(lat) ** 2)
    x = n * np.cos(lat) * np.cos(lon)
    y = n * np.cos(lat) * np.sin(lon)
    z = n * (1.0 - e2) * np.sin(lat)
    return x, y, z


def _xyz_to_geodetic(x, y, z, a: float, f: float):
    """Geocentric cartesian -> geodetic (deg); fixed-point iteration on the
    latitude (converges to <1e-12 rad in a handful of rounds at h≈0)."""
    e2 = _e2(f)
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1.0 - e2))
    for _ in range(8):
        n = a / np.sqrt(1.0 - e2 * np.sin(lat) ** 2)
        h = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - e2 * n / (n + h)))
    return np.arctan2(y, x) * _R2D, lat * _R2D


def _shift_datum(lon, lat, a_src, f_src, a_dst, f_dst, delta):
    x, y, z = _geodetic_to_xyz(lon, lat, a_src, f_src)
    return _xyz_to_geodetic(x + delta[0], y + delta[1], z + delta[2], a_dst, f_dst)


# --------------------------------------------------------------------------
# spherical web Mercator (EPSG:3857)
# --------------------------------------------------------------------------

_MERC_R = 6378137.0


def merc_fwd(lon_deg, lat_deg):
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.clip(np.asarray(lat_deg, dtype=np.float64), -89.9999999, 89.9999999)
    x = _MERC_R * lon * _D2R
    y = _MERC_R * np.log(np.tan(np.pi / 4.0 + lat * _D2R / 2.0))
    return x, y


def merc_inv(x, y):
    lon = np.asarray(x, dtype=np.float64) / _MERC_R * _R2D
    lat = (2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _MERC_R)) - np.pi / 2.0) * _R2D
    return lon, lat


# --------------------------------------------------------------------------
# Swiss Oblique Mercator (somerc) on Bessel 1841 — swisstopo exact formulas
# --------------------------------------------------------------------------


class _Somerc:
    """Sphere double-projection: ellipsoid -> conformal sphere -> rotated
    (pseudo-equator through the projection center) -> Mercator."""

    def __init__(self, lat0_deg: float, lon0_deg: float, x0: float, y0: float,
                 a: float = BESSEL_A, f: float = BESSEL_F, k0: float = 1.0):
        self.a, self.x0, self.y0 = a, x0, y0
        self.lon0 = lon0_deg * _D2R
        phi0 = lat0_deg * _D2R
        es = _e2(f)
        self.e = np.sqrt(es)
        cp2 = np.cos(phi0) ** 2
        self.alpha = np.sqrt(1.0 + es * cp2 * cp2 / (1.0 - es))
        sinp0 = np.sin(phi0) / self.alpha
        self.b0 = np.arcsin(sinp0)
        self.K = (
            np.log(np.tan(np.pi / 4.0 + self.b0 / 2.0))
            - self.alpha * np.log(np.tan(np.pi / 4.0 + phi0 / 2.0))
            + self.alpha * self.e / 2.0
            * np.log((1.0 + self.e * np.sin(phi0)) / (1.0 - self.e * np.sin(phi0)))
        )
        self.R = k0 * a * np.sqrt(1.0 - es) / (1.0 - es * np.sin(phi0) ** 2)

    def fwd(self, lon_deg, lat_deg):
        """Geodetic on the Bessel/CH1903 datum (deg) -> E, N."""
        phi = np.asarray(lat_deg, dtype=np.float64) * _D2R
        lam = np.asarray(lon_deg, dtype=np.float64) * _D2R - self.lon0
        sp = self.e * np.sin(phi)
        # ellipsoid -> conformal sphere latitude b, longitude l
        s = (
            self.alpha * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
            - self.alpha * self.e / 2.0 * np.log((1.0 + sp) / (1.0 - sp))
            + self.K
        )
        b = 2.0 * (np.arctan(np.exp(s)) - np.pi / 4.0)
        el = self.alpha * lam
        # rotate so the projection center becomes the equator point
        bb = np.arcsin(np.clip(
            np.cos(self.b0) * np.sin(b) - np.sin(self.b0) * np.cos(b) * np.cos(el),
            -1.0, 1.0))
        ll = np.arctan2(np.sin(el) * np.cos(b),
                        np.cos(self.b0) * np.cos(el) * np.cos(b)
                        + np.sin(self.b0) * np.sin(b))
        e_ = self.x0 + self.R * ll
        n_ = self.y0 + self.R * np.log(np.tan(np.pi / 4.0 + bb / 2.0))
        return e_, n_

    def inv(self, e_, n_):
        """E, N -> geodetic on the Bessel/CH1903 datum (deg)."""
        ll = (np.asarray(e_, dtype=np.float64) - self.x0) / self.R
        bb = 2.0 * (np.arctan(np.exp((np.asarray(n_, dtype=np.float64) - self.y0) / self.R))
                    - np.pi / 4.0)
        b = np.arcsin(np.clip(
            np.cos(self.b0) * np.sin(bb) + np.sin(self.b0) * np.cos(bb) * np.cos(ll),
            -1.0, 1.0))
        el = np.arctan2(np.sin(ll) * np.cos(bb),
                        np.cos(self.b0) * np.cos(ll) * np.cos(bb)
                        - np.sin(self.b0) * np.sin(bb))
        # conformal sphere -> ellipsoid latitude (fixed-point, <1e-12 rad)
        s = (np.log(np.tan(np.pi / 4.0 + b / 2.0)) - self.K) / self.alpha
        phi = b
        for _ in range(10):
            sp = self.e * np.sin(phi)
            phi = 2.0 * (np.arctan(np.exp(s + self.e / 2.0 * np.log((1.0 + sp) / (1.0 - sp))))
                         - np.pi / 4.0)
        lam = el / self.alpha + self.lon0
        return lam * _R2D, phi * _R2D


# Bern: 46°57'08.66" N, 7°26'22.50" E
_CH_LAT0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
_CH_LON0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0
_LV03 = _Somerc(_CH_LAT0, _CH_LON0, 600000.0, 200000.0)
_LV95 = _Somerc(_CH_LAT0, _CH_LON0, 2600000.0, 1200000.0)


def _swiss_fwd(proj: _Somerc):
    def fwd(lon, lat):
        # WGS84 geodetic -> CH1903 geodetic (inverse 3-param shift) -> somerc
        lon_ch, lat_ch = _shift_datum(lon, lat, WGS84_A, WGS84_F,
                                      BESSEL_A, BESSEL_F, -_CH_SHIFT)
        return proj.fwd(lon_ch, lat_ch)
    return fwd


def _swiss_inv(proj: _Somerc):
    def inv(x, y):
        lon_ch, lat_ch = proj.inv(x, y)
        return _shift_datum(lon_ch, lat_ch, BESSEL_A, BESSEL_F,
                            WGS84_A, WGS84_F, _CH_SHIFT)
    return inv


# --------------------------------------------------------------------------
# swisstopo approximate polynomial formulas — INDEPENDENT cross-check only
# --------------------------------------------------------------------------


def swiss_approx_lv03_to_wgs84(e_, n_):
    """swisstopo 'Approximate formulas for the transformation CH1903<->WGS84'
    (public; stated accuracy ~1 m). Used by tests to cross-validate the
    exact chain — NOT by the engine."""
    yp = (np.asarray(e_, dtype=np.float64) - 600000.0) / 1e6
    xp = (np.asarray(n_, dtype=np.float64) - 200000.0) / 1e6
    lam = (2.6779094 + 4.728982 * yp + 0.791484 * yp * xp
           + 0.1306 * yp * xp ** 2 - 0.0436 * yp ** 3)
    phi = (16.9023892 + 3.238272 * xp - 0.270978 * yp ** 2
           - 0.002528 * xp ** 2 - 0.0447 * yp ** 2 * xp - 0.0140 * xp ** 3)
    return lam * 100.0 / 36.0, phi * 100.0 / 36.0


def swiss_approx_wgs84_to_lv03(lon, lat):
    lp = (np.asarray(lon, dtype=np.float64) * 3600.0 - 26782.5) / 10000.0
    pp = (np.asarray(lat, dtype=np.float64) * 3600.0 - 169028.66) / 10000.0
    e_ = (600072.37 + 211455.93 * lp - 10938.51 * lp * pp
          - 0.36 * lp * pp ** 2 - 44.54 * lp ** 3)
    n_ = (200147.07 + 308807.95 * pp + 3745.25 * lp ** 2
          + 76.63 * pp ** 2 - 194.56 * lp ** 2 * pp + 119.79 * pp ** 3)
    return e_, n_


# --------------------------------------------------------------------------
# registry + public API
# --------------------------------------------------------------------------

_IDENT = (lambda lon, lat: (np.asarray(lon, np.float64), np.asarray(lat, np.float64)))

# name -> (fwd: wgs84 lonlat -> projected, inv: projected -> wgs84 lonlat)
_REGISTRY = {
    "EPSG:4326": (_IDENT, _IDENT),
    "EPSG:3857": (merc_fwd, merc_inv),
    "EPSG:900913": (merc_fwd, merc_inv),
    "EPSG:21781": (_swiss_fwd(_LV03), _swiss_inv(_LV03)),
    "EPSG:2056": (_swiss_fwd(_LV95), _swiss_inv(_LV95)),
}


def _parse_proj4(literal: str) -> str | None:
    """Map the proj4 literals the reference's configs/tests use onto the
    registry (``transform_bbox`` takes proj4 literals in the reference —
    tests/test_generate.py:538-546)."""
    toks = dict(
        t.lstrip("+").split("=", 1) if "=" in t else (t.lstrip("+"), "")
        for t in literal.split()
    )
    proj = toks.get("proj")
    if proj == "longlat":
        return "EPSG:4326"
    if proj == "merc" and toks.get("a") == toks.get("b") == "6378137":
        return "EPSG:3857"
    if proj == "somerc":
        return "EPSG:2056" if toks.get("x_0", "600000").startswith("26") else "EPSG:21781"
    return None


def _resolve(srs: str) -> str:
    key = srs.strip()
    if key.startswith("+"):
        mapped = _parse_proj4(key)
        if mapped is None:
            raise NotImplementedError(f"unsupported proj4 literal: {srs}")
        return mapped
    return key.upper().replace("EPSG: ", "EPSG:")


def supported(srs: str) -> bool:
    try:
        return _resolve(srs) in _REGISTRY
    except NotImplementedError:
        return False


def transform_coords(src_srs: str, dst_srs: str, xs, ys):
    """Vectorized coordinate transform src -> dst (routes through WGS84).
    The LV03<->LV95 pair short-circuits to the exact-by-definition
    translation (same datum, same projection, shifted false origin)."""
    src, dst = _resolve(src_srs), _resolve(dst_srs)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if src == dst:
        return xs, ys
    if (src, dst) == ("EPSG:21781", "EPSG:2056"):
        return xs + 2_000_000.0, ys + 1_000_000.0
    if (src, dst) == ("EPSG:2056", "EPSG:21781"):
        return xs - 2_000_000.0, ys - 1_000_000.0
    if src not in _REGISTRY or dst not in _REGISTRY:
        missing = src if src not in _REGISTRY else dst
        raise NotImplementedError(
            f"CRS {missing} not implemented (supported: {sorted(_REGISTRY)}; "
            "arbitrary CRS would need pyproj, unavailable in this environment)"
        )
    lon, lat = _REGISTRY[src][1](xs, ys)
    return _REGISTRY[dst][0](lon, lat)


def transform_bbox(
    src_srs: str, dst_srs: str, bbox, densify: int = 21
) -> tuple[float, float, float, float]:
    """Reprojected envelope of a bbox — normalizes a reversed input bbox
    first (reference ``normalize_bbox`` + ``transform_bbox``,
    tilecloud_chain/__init__.py:862-904), densifies each edge with
    ``densify`` samples (same idea as pyproj's ``transform_bounds``) so a
    curved edge image can't clip the envelope, and normalizes the output."""
    minx, maxx = sorted((float(bbox[0]), float(bbox[2])))
    miny, maxy = sorted((float(bbox[1]), float(bbox[3])))
    if _resolve(src_srs) == _resolve(dst_srs):
        return (minx, miny, maxx, maxy)
    t = np.linspace(0.0, 1.0, max(2, densify))
    xs = np.concatenate([
        minx + (maxx - minx) * t, np.full_like(t, maxx),
        maxx + (minx - maxx) * t, np.full_like(t, minx),
    ])
    ys = np.concatenate([
        np.full_like(t, miny), miny + (maxy - miny) * t,
        np.full_like(t, maxy), maxy + (miny - maxy) * t,
    ])
    tx, ty = transform_coords(src_srs, dst_srs, xs, ys)
    return (float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max()))
