"""Vectorized planar geometry kernel (pure numpy — no shapely in this env).

Implements exactly the predicates the reference uses through shapely:

- ``box.intersects(geom)`` for the per-zoom geometry-restriction filter
  (``IntersectGeometryFilter``, /root/reference/tilecloud_chain/__init__.py:2637-2697),
  vectorized over arrays of boxes so it runs inside Arrow-batched pandas UDFs;
- ``geom.intersection(box)`` restricted to what sparse enumeration needs:
  per-leaf clipped parts and their x-bounds
  (``SparseMetaTileBoundingPyramid``, tilecloud_chain/__init__.py:438-626);
- ``geom.bounds`` and a square-cap ``buffer`` approximation (reference uses
  ``shapely.buffer(d, 1)`` only to pad enumeration windows; our box-Minkowski
  buffer is a superset for points/lines and exact for axis-aligned use —
  enumeration stays correct because the geometry *filter* re-tests exactly).

Geometry model: a ``Geom`` is a flat list of leaf parts —
``("point", (2,) array)``, ``("line", (M,2) array)``,
``("polygon", [rings])`` with ring 0 the exterior, later rings holes.
Leaf iteration mirrors ``_iter_leaf_geometries``
(tilecloud_chain/__init__.py:516-523).
"""

from __future__ import annotations

import re

import numpy as np

Part = tuple  # ("point"|"line"|"polygon", payload)


class Geom:
    """A multi-part planar geometry (flat leaf list)."""

    def __init__(self, parts: list[Part]) -> None:
        self.parts = parts

    def __repr__(self) -> str:  # pragma: no cover
        return f"Geom({[p[0] for p in self.parts]})"

    @property
    def is_empty(self) -> bool:
        return not self.parts

    def bounds(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy) over all parts."""
        xs: list[np.ndarray] = []
        ys: list[np.ndarray] = []
        for kind, payload in self.parts:
            if kind == "point":
                xs.append(payload[0:1])
                ys.append(payload[1:2])
            elif kind == "line":
                xs.append(payload[:, 0])
                ys.append(payload[:, 1])
            else:
                for ring in payload:
                    xs.append(ring[:, 0])
                    ys.append(ring[:, 1])
        ax = np.concatenate(xs)
        ay = np.concatenate(ys)
        return (float(ax.min()), float(ay.min()), float(ax.max()), float(ay.max()))

    # -- predicates ---------------------------------------------------------

    def intersects_boxes(self, boxes: np.ndarray) -> np.ndarray:
        """Vectorized ``box.intersects(self)`` for boxes ``(N, 4)``
        [minx, miny, maxx, maxy]. Boundary contact counts as intersecting
        (shapely ``intersects`` semantics)."""
        boxes = np.asarray(boxes, dtype=np.float64)
        out = np.zeros(len(boxes), dtype=bool)
        for kind, payload in self.parts:
            rem = ~out
            if not rem.any():
                break
            b = boxes[rem]
            if kind == "point":
                hit = (
                    (b[:, 0] <= payload[0])
                    & (payload[0] <= b[:, 2])
                    & (b[:, 1] <= payload[1])
                    & (payload[1] <= b[:, 3])
                )
            elif kind == "line":
                hit = _segments_intersect_boxes(payload, b)
            else:
                hit = _polygon_intersects_boxes(payload, b)
            out[np.flatnonzero(rem)[hit]] = True
        return out

    def contains_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized point-in-geometry (polygons only contribute interior+
        boundary; points/lines contribute exact hits)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.zeros(px.shape, dtype=bool)
        for kind, payload in self.parts:
            if kind == "polygon":
                inside = _points_in_ring(payload[0], px, py)
                for hole in payload[1:]:
                    inside &= ~_points_in_ring(hole, px, py, holes=True)
                out |= inside
            elif kind == "point":
                out |= (px == payload[0]) & (py == payload[1])
        return out

    # -- constructive -------------------------------------------------------

    def clip_to_box(self, box: tuple[float, float, float, float]) -> "Geom":
        """Intersection with an axis-aligned box, keeping parts separate.

        Sparse enumeration needs the *per-leaf* x-bounds of
        ``geom ∩ row_band`` (tilecloud_chain/__init__.py:549-588) — a merged
        bound would wrongly bridge disjoint parts (pinned by the reference's
        row-split unit test, tests/test_generate.py:252-276).
        """
        minx, miny, maxx, maxy = box
        parts: list[Part] = []
        for kind, payload in self.parts:
            if kind == "point":
                if minx <= payload[0] <= maxx and miny <= payload[1] <= maxy:
                    parts.append((kind, payload))
            elif kind == "line":
                for seg in _clip_polyline(payload, box):
                    parts.append(("line", seg))
            else:
                rings = [_clip_ring_sh(payload[0], box)]
                if rings[0] is None or len(rings[0]) < 3:
                    continue
                for hole in payload[1:]:
                    ch = _clip_ring_sh(hole, box)
                    if ch is not None and len(ch) >= 3:
                        rings.append(ch)
                parts.append(("polygon", rings))
        return Geom(parts)

    def buffer(self, d: float) -> "Geom":
        """Square-cap (Chebyshev) buffer by distance ``d >= 0``.

        Conservative superset of shapely's round buffer for points/lines
        (the reference only uses buffer to *widen* enumeration windows,
        tilecloud_chain/__init__.py:536-541); polygons are buffered via their
        expanded convex pieces' boxes only when d>0 — kept simple because the
        exact geometry filter re-tests each candidate tile.
        """
        if d == 0:
            return self
        parts: list[Part] = []
        for kind, payload in self.parts:
            if kind == "point":
                x, y = float(payload[0]), float(payload[1])
                parts.append(("polygon", [_box_ring(x - d, y - d, x + d, y + d)]))
            elif kind == "line":
                for i in range(len(payload) - 1):
                    parts.append(
                        ("polygon", [_segment_buffer_ring(payload[i], payload[i + 1], d)])
                    )
            else:
                # Exterior ring dilated per-edge; union approximated by
                # keeping the edge quads + original polygon as parts.
                parts.append((kind, payload))
                ring = payload[0]
                for i in range(len(ring) - 1):
                    parts.append(
                        ("polygon", [_segment_buffer_ring(ring[i], ring[i + 1], d)])
                    )
        return Geom(parts)


# --------------------------------------------------------------------------
# low-level vectorized kernels
# --------------------------------------------------------------------------


def _segments_intersect_boxes(line: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """For each box, does ANY segment of ``line`` ((M,2)) touch it?
    Liang-Barsky clip test, vectorized over (segments × boxes)."""
    p0 = line[:-1]  # (S,2)
    p1 = line[1:]
    s = len(p0)
    n = len(boxes)
    if s == 0 or n == 0:
        return np.zeros(n, dtype=bool)
    x0 = p0[:, 0][:, None]
    y0 = p0[:, 1][:, None]
    dx = (p1[:, 0] - p0[:, 0])[:, None]
    dy = (p1[:, 1] - p0[:, 1])[:, None]
    bminx = boxes[:, 0][None, :]
    bminy = boxes[:, 1][None, :]
    bmaxx = boxes[:, 2][None, :]
    bmaxy = boxes[:, 3][None, :]

    t0 = np.zeros((s, n))
    t1 = np.ones((s, n))
    ok = np.ones((s, n), dtype=bool)
    for p, q in (
        (-dx, x0 - bminx),
        (dx, bmaxx - x0),
        (-dy, y0 - bminy),
        (dy, bmaxy - y0),
    ):
        p = np.broadcast_to(p, (s, n))
        q = np.broadcast_to(q, (s, n))
        zero = p == 0
        ok &= ~(zero & (q < 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(zero, 0.0, q / np.where(zero, 1.0, p))
        ent = (p < 0)
        t0 = np.where(ent, np.maximum(t0, r), t0)
        t1 = np.where(p > 0, np.minimum(t1, r), t1)
    hit = ok & (t0 <= t1)
    return hit.any(axis=0)


def _points_in_ring(
    ring: np.ndarray, px: np.ndarray, py: np.ndarray, holes: bool = False
) -> np.ndarray:
    """Ray-cast point-in-ring, boundary-inclusive (unless ``holes``:
    a point ON a hole boundary stays inside the polygon, so hole test is
    boundary-exclusive)."""
    x0 = ring[:-1, 0][:, None]
    y0 = ring[:-1, 1][:, None]
    x1 = ring[1:, 0][:, None]
    y1 = ring[1:, 1][:, None]
    fx = px.ravel()[None, :]
    fy = py.ravel()[None, :]
    # crossing number
    cond = ((y0 <= fy) & (y1 > fy)) | ((y1 <= fy) & (y0 > fy))
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (fy - y0) * (x1 - x0) / np.where(y1 == y0, 1.0, (y1 - y0))
    crossings = (cond & (fx < xint)).sum(axis=0)
    inside = (crossings % 2) == 1
    # boundary test
    on = _points_on_segments(ring, fx.ravel(), fy.ravel())
    res = inside | on if not holes else inside & ~on
    return res.reshape(px.shape)


def _points_on_segments(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    x0 = ring[:-1, 0][:, None]
    y0 = ring[:-1, 1][:, None]
    x1 = ring[1:, 0][:, None]
    y1 = ring[1:, 1][:, None]
    fx = px[None, :]
    fy = py[None, :]
    cross = (x1 - x0) * (fy - y0) - (y1 - y0) * (fx - x0)
    within = (
        (np.minimum(x0, x1) <= fx)
        & (fx <= np.maximum(x0, x1))
        & (np.minimum(y0, y1) <= fy)
        & (fy <= np.maximum(y0, y1))
    )
    eps = 1e-9 * np.maximum(np.abs(x1 - x0) + np.abs(y1 - y0), 1.0)
    return ((np.abs(cross) <= eps) & within).any(axis=0)


def _polygon_intersects_boxes(rings: list[np.ndarray], boxes: np.ndarray) -> np.ndarray:
    ext = rings[0]
    # 1. bbox reject
    gminx, gminy = ext.min(axis=0)
    gmaxx, gmaxy = ext.max(axis=0)
    cand = ~(
        (boxes[:, 2] < gminx)
        | (boxes[:, 0] > gmaxx)
        | (boxes[:, 3] < gminy)
        | (boxes[:, 1] > gmaxy)
    )
    out = np.zeros(len(boxes), dtype=bool)
    if not cand.any():
        return out
    b = boxes[cand]
    # 2. polygon boundary crosses box
    hit = _segments_intersect_boxes(ext, b)
    for hole in rings[1:]:
        hit |= _segments_intersect_boxes(hole, b)
    # 3. box fully inside polygon (no boundary crossing): test one corner
    corner_in = _points_in_ring(ext, b[:, 0], b[:, 1])
    for hole in rings[1:]:
        corner_in &= ~_points_in_ring(hole, b[:, 0], b[:, 1], holes=True)
    # 4. polygon fully inside box: test one polygon vertex
    vx, vy = ext[0, 0], ext[0, 1]
    poly_in = (b[:, 0] <= vx) & (vx <= b[:, 2]) & (b[:, 1] <= vy) & (vy <= b[:, 3])
    out[np.flatnonzero(cand)] = hit | corner_in | poly_in
    return out


def _clip_polyline(line: np.ndarray, box: tuple[float, float, float, float]) -> list[np.ndarray]:
    """Clip a polyline to a box; returns clipped sub-segments (each (2,2))."""
    minx, miny, maxx, maxy = box
    out: list[np.ndarray] = []
    for i in range(len(line) - 1):
        x0, y0 = line[i]
        x1, y1 = line[i + 1]
        dx, dy = x1 - x0, y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in (
            (-dx, x0 - minx),
            (dx, maxx - x0),
            (-dy, y0 - miny),
            (dy, maxy - y0),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
                continue
            r = q / p
            if p < 0:
                if r > t1:
                    ok = False
                    break
                t0 = max(t0, r)
            else:
                if r < t0:
                    ok = False
                    break
                t1 = min(t1, r)
        if ok and t0 <= t1:
            out.append(
                np.array(
                    [[x0 + t0 * dx, y0 + t0 * dy], [x0 + t1 * dx, y0 + t1 * dy]],
                    dtype=np.float64,
                )
            )
    return out


def _clip_ring_sh(ring: np.ndarray, box: tuple[float, float, float, float]) -> np.ndarray | None:
    """Sutherland–Hodgman clip of a (closed) ring against an AA box."""
    minx, miny, maxx, maxy = box
    pts = [tuple(p) for p in ring[:-1]]  # drop closing point

    def clip_edge(points, inside, intersect):
        if not points:
            return points
        res = []
        prev = points[-1]
        prev_in = inside(prev)
        for cur in points:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    res.append(intersect(prev, cur))
                res.append(cur)
            elif prev_in:
                res.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return res

    def ix(axis_val, axis, a, b):
        (x0, y0), (x1, y1) = a, b
        if axis == 0:
            t = (axis_val - x0) / (x1 - x0)
            return (axis_val, y0 + t * (y1 - y0))
        t = (axis_val - y0) / (y1 - y0)
        return (x0 + t * (x1 - x0), axis_val)

    pts = clip_edge(pts, lambda p: p[0] >= minx, lambda a, b: ix(minx, 0, a, b))
    pts = clip_edge(pts, lambda p: p[0] <= maxx, lambda a, b: ix(maxx, 0, a, b))
    pts = clip_edge(pts, lambda p: p[1] >= miny, lambda a, b: ix(miny, 1, a, b))
    pts = clip_edge(pts, lambda p: p[1] <= maxy, lambda a, b: ix(maxy, 1, a, b))
    if len(pts) < 3:
        return None
    arr = np.array(pts + [pts[0]], dtype=np.float64)
    # degenerate (zero-area) results still carry bounds info; keep them
    return arr


def _box_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=np.float64,
    )


def _segment_buffer_ring(p0: np.ndarray, p1: np.ndarray, d: float) -> np.ndarray:
    """Oriented rectangle around a segment, widened by d (square caps)."""
    v = np.asarray(p1, dtype=np.float64) - np.asarray(p0, dtype=np.float64)
    ln = float(np.hypot(*v))
    if ln == 0:
        x, y = float(p0[0]), float(p0[1])
        return _box_ring(x - d, y - d, x + d, y + d)
    u = v / ln
    nrm = np.array([-u[1], u[0]])
    a = np.asarray(p0) - u * d
    b = np.asarray(p1) + u * d
    ring = np.array(
        [a + nrm * d, b + nrm * d, b - nrm * d, a - nrm * d, a + nrm * d],
        dtype=np.float64,
    )
    return ring


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        nums = re.findall(_NUM, pair)
        pts.append((float(nums[0]), float(nums[1])))
    return np.array(pts, dtype=np.float64)


def _split_top_level(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _strip_parens(s: str) -> str:
    s = s.strip()
    assert s.startswith("(") and s.endswith(")"), s
    return s[1:-1]


def parse_wkt(wkt: str) -> Geom:
    """Parse the WKT subset the fixtures use (POINT, MULTIPOINT, LINESTRING,
    MULTILINESTRING, POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION)."""
    wkt = wkt.strip()
    m = re.match(r"(\w+)\s*(.*)$", wkt, re.S)
    assert m, wkt
    kind = m.group(1).upper()
    body = m.group(2).strip()
    parts: list[Part] = []
    if kind == "POINT":
        parts.append(("point", _parse_coords(_strip_parens(body))[0]))
    elif kind == "MULTIPOINT":
        inner = _strip_parens(body)
        for piece in _split_top_level(inner):
            piece = piece.strip()
            if piece.startswith("("):
                piece = _strip_parens(piece)
            parts.append(("point", _parse_coords(piece)[0]))
    elif kind == "LINESTRING":
        parts.append(("line", _parse_coords(_strip_parens(body))))
    elif kind == "MULTILINESTRING":
        for piece in _split_top_level(_strip_parens(body)):
            parts.append(("line", _parse_coords(_strip_parens(piece))))
    elif kind == "POLYGON":
        rings = [_parse_coords(_strip_parens(r)) for r in _split_top_level(_strip_parens(body))]
        parts.append(("polygon", rings))
    elif kind == "MULTIPOLYGON":
        for piece in _split_top_level(_strip_parens(body)):
            rings = [
                _parse_coords(_strip_parens(r)) for r in _split_top_level(_strip_parens(piece))
            ]
            parts.append(("polygon", rings))
    elif kind == "GEOMETRYCOLLECTION":
        for piece in _split_top_level(_strip_parens(body)):
            parts.extend(parse_wkt(piece).parts)
    else:  # pragma: no cover
        raise ValueError(f"unsupported WKT type {kind}")
    return Geom(parts)


def box_geom(minx: float, miny: float, maxx: float, maxy: float) -> Geom:
    """Axis-aligned rectangle as a Geom (shapely ``box`` analog)."""
    return Geom([("polygon", [_box_ring(minx, miny, maxx, maxy)])])


def union(*geoms: Geom) -> Geom:
    """Multi-part union (parts kept separate — sufficient for interval
    planning and predicate tests, which OR over parts; matches how the
    reference iterates leaf geometries)."""
    parts: list[Part] = []
    for g in geoms:
        parts.extend(g.parts)
    return Geom(parts)
