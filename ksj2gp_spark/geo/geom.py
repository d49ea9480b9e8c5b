"""Vectorized planar geometry kernels (numpy; no external geo libs).

These are the exact-refinement primitives the spatial join uses inside
``applyInPandas``/``mapInPandas`` after the cell-keyed candidate join:
point-in-polygon (boundary-inclusive "covers" semantics, matching what
Shapely's ``covers`` would give), point→polygon distance for kNN, and
bbox/centroid/area helpers used for covering columns (the reference's
GeoParquet bbox covering, geoparquet_writer.rs:34-38, generalized).

All kernels are vectorized over the *points* axis; polygon ring counts
are typically tiny (admin boundaries), so per-ring loops are cheap and
the per-point work stays in numpy.
"""

from __future__ import annotations

import numpy as np

from .wkb import Geometry, loads


def ring_contains(
    xs: np.ndarray, ys: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Boundary-inclusive point-in-ring test, vectorized over points.

    Crossing-number (ray cast to +x) with an explicit on-edge check so
    that boundary points count as inside (covers semantics).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]

    # Edge test: point on segment [p0, p1]?
    # cross == 0 and within the segment's bbox.
    px = xs[:, None]
    py = ys[:, None]
    dx, dy = x1 - x0, y1 - y0
    cross = (px - x0) * dy - (py - y0) * dx
    on_line = np.abs(cross) <= 1e-12 * np.maximum(
        1.0, np.abs(dx) + np.abs(dy)
    )
    in_box = (
        (px >= np.minimum(x0, x1) - 1e-15)
        & (px <= np.maximum(x0, x1) + 1e-15)
        & (py >= np.minimum(y0, y1) - 1e-15)
        & (py <= np.maximum(y0, y1) + 1e-15)
    )
    on_edge = (on_line & in_box).any(axis=1)

    # Crossing number: half-open vertical rule avoids double-counting
    # vertices.
    cond = (y0 <= py) != (y1 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x0 + (py - y0) * dx / dy
    crossings = (cond & (px < x_at)).sum(axis=1)
    return on_edge | (crossings % 2 == 1)


def polygon_contains(
    xs: np.ndarray, ys: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """covers() for a polygon with holes: inside exterior, outside holes
    (points on a hole boundary still count as covered)."""
    if not rings:
        return np.zeros(len(np.atleast_1d(xs)), dtype=bool)
    inside = ring_contains(xs, ys, rings[0])
    for hole in rings[1:]:
        in_hole = ring_contains(xs, ys, hole)
        on_hole_edge = _on_ring_edge(xs, ys, hole)
        inside &= ~in_hole | on_hole_edge
    return inside


def _on_ring_edge(xs, ys, ring) -> np.ndarray:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px, py = np.asarray(xs)[:, None], np.asarray(ys)[:, None]
    dx, dy = x1 - x0, y1 - y0
    cross = (px - x0) * dy - (py - y0) * dx
    on_line = np.abs(cross) <= 1e-12 * np.maximum(1.0, np.abs(dx) + np.abs(dy))
    in_box = (
        (px >= np.minimum(x0, x1) - 1e-15)
        & (px <= np.maximum(x0, x1) + 1e-15)
        & (py >= np.minimum(y0, y1) - 1e-15)
        & (py <= np.maximum(y0, y1) + 1e-15)
    )
    return (on_line & in_box).any(axis=1)


def geometry_contains(xs, ys, geom: Geometry) -> np.ndarray:
    """covers() for Polygon or MultiPolygon geometries."""
    from . import wkb as _wkb

    if geom.kind == _wkb.POLYGON:
        return polygon_contains(xs, ys, geom.coords)
    if geom.kind == _wkb.MULTIPOLYGON:
        out = np.zeros(len(np.atleast_1d(xs)), dtype=bool)
        for rings in geom.coords:
            out |= polygon_contains(xs, ys, rings)
        return out
    raise ValueError(f"contains on {geom.name}")


def wkb_contains(xs, ys, wkb_bytes: bytes) -> np.ndarray:
    return geometry_contains(xs, ys, loads(wkb_bytes))


def dist_to_segments(
    xs: np.ndarray, ys: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Min distance from each point to any segment of ``ring``."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px, py = np.asarray(xs)[:, None], np.asarray(ys)[:, None]
    dx, dy = x1 - x0, y1 - y0
    seg_len2 = dx * dx + dy * dy
    seg_len2 = np.where(seg_len2 == 0, 1.0, seg_len2)
    t = ((px - x0) * dx + (py - y0) * dy) / seg_len2
    t = np.clip(t, 0.0, 1.0)
    cx = x0 + t * dx
    cy = y0 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return np.sqrt(d2.min(axis=1))


def distance_to_geometry(xs, ys, geom: Geometry) -> np.ndarray:
    """Distance from points to a Polygon/MultiPolygon (0 if covered)."""
    xs = np.atleast_1d(np.asarray(xs, dtype=np.float64))
    ys = np.atleast_1d(np.asarray(ys, dtype=np.float64))
    inside = geometry_contains(xs, ys, geom)
    d = np.full(len(xs), np.inf)
    for ring in geom.rings():
        d = np.minimum(d, dist_to_segments(xs, ys, ring))
    d[inside] = 0.0
    return d


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def geometry_area(geom: Geometry) -> float:
    from . import wkb as _wkb

    if geom.kind == _wkb.POLYGON:
        polys = [geom.coords]
    elif geom.kind == _wkb.MULTIPOLYGON:
        polys = geom.coords
    else:
        return 0.0
    total = 0.0
    for rings in polys:
        total += abs(ring_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area(hole))
    return total


def centroid(geom: Geometry) -> tuple[float, float]:
    """Area-weighted centroid of a Polygon/MultiPolygon."""
    from . import wkb as _wkb

    if geom.kind == _wkb.POINT:
        return float(geom.coords[0]), float(geom.coords[1])
    if geom.kind not in (_wkb.POLYGON, _wkb.MULTIPOLYGON):
        c = geom.all_coords()
        return float(c[:, 0].mean()), float(c[:, 1].mean())
    polys = [geom.coords] if geom.kind == _wkb.POLYGON else geom.coords
    ax = ay = aa = 0.0
    for rings in polys:
        for i, ring in enumerate(rings):
            x, y = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            cr = x * y1 - x1 * y
            a = cr.sum() / 2.0
            if i > 0:
                a = -abs(a)  # holes subtract
            else:
                a = abs(a)
            if a == 0:
                continue
            sign = 1.0 if ring_area(ring) >= 0 else -1.0
            cx = float(((x + x1) * cr).sum() / (6.0 * (cr.sum() / 2.0)))
            cy = float(((y + y1) * cr).sum() / (6.0 * (cr.sum() / 2.0)))
            ax += cx * a
            ay += cy * a
            aa += a
            del sign
    if aa == 0:
        c = geom.all_coords()
        return float(c[:, 0].mean()), float(c[:, 1].mean())
    return ax / aa, ay / aa


# --- Douglas-Peucker simplification ----------------------------------
#
# KSJ coastline/admin polygons carry survey-resolution vertex counts
# (10^3-10^5 per ring); the broadcast side of the spatial join ships
# every vertex to every executor. Simplification at a tolerance below
# the cell size shrinks that broadcast without changing any point
# classification farther than `tol` from the boundary (every removed
# vertex lies within `tol` of the simplified chain — the DP guarantee).


def simplify_chain(coords: np.ndarray, tol: float) -> np.ndarray:
    """Iterative (stack-based) Douglas-Peucker over an open chain.
    Endpoints always survive; the result is a subsequence of the
    input with max perpendicular deviation <= tol."""
    n = len(coords)
    if n <= 2 or tol <= 0.0:
        return coords.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    x, y = coords[:, 0], coords[:, 1]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        # vectorized point-to-segment distance for coords[i+1:j]
        px, py = x[i + 1 : j], y[i + 1 : j]
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / seg2, 0.0, 1.0)
            d2 = (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2
        k = int(np.argmax(d2))
        if d2[k] > tol * tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return coords[keep].copy()


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray | None:
    """Simplify a CLOSED ring (first == last). Returns None if the
    ring collapses below a valid triangle (caller drops the hole /
    keeps a collapsed exterior as its bbox-degenerate original)."""
    out = simplify_chain(ring, tol)
    if len(out) < 4:  # 3 distinct vertices + closure
        return None
    return out


def simplify_geometry(geom: Geometry, tol: float) -> Geometry:
    """DP-simplify Polygon/MultiPolygon rings (holes that collapse are
    dropped; an exterior that collapses keeps its original ring —
    never silently deletes a feature). Other kinds pass through
    unchanged (LineString chains are simplified)."""
    from . import wkb as _wkb

    # Z survives: DP deviation is measured in XY, but kept vertices
    # carry their full rows, so (n, 3) inputs stay (k, 3) with has_z
    # preserved (dropping the flag while keeping 3-wide rows would
    # serialize corrupt WKB).
    if geom.kind == _wkb.LINESTRING:
        return Geometry(
            _wkb.LINESTRING, simplify_chain(geom.coords, tol), geom.has_z
        )
    if geom.kind == _wkb.POLYGON:
        polys = [geom.coords]
    elif geom.kind == _wkb.MULTIPOLYGON:
        polys = geom.coords
    else:
        return geom
    new_polys = []
    for rings in polys:
        ext = simplify_ring(rings[0], tol)
        new_rings = [rings[0].copy() if ext is None else ext]
        for hole in rings[1:]:
            h = simplify_ring(hole, tol)
            if h is not None:
                new_rings.append(h)
        new_polys.append(new_rings)
    if geom.kind == _wkb.POLYGON:
        return Geometry(_wkb.POLYGON, new_polys[0], geom.has_z)
    return Geometry(_wkb.MULTIPOLYGON, new_polys, geom.has_z)


# --- polygon-polygon intersection ------------------------------------
#
# Exact boundary-inclusive intersects() for Polygon/MultiPolygon pairs:
# two polygons intersect iff a vertex of one is covered by the other
# (handles containment and boundary touch) or some boundary segments
# cross (handles edge crossings with no vertex inside). Segment tests
# are vectorized n×m with a mutual-bbox prefilter, so cell-localized
# candidate pairs (the overlap join's unit of work) stay cheap even on
# survey-resolution rings.


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def segments_cross_any(r1: np.ndarray, r2: np.ndarray) -> bool:
    """True if any segment of ring/chain r1 intersects any of r2
    (inclusive: shared endpoints and collinear overlap count)."""
    p = r1[:-1]
    q = r1[1:]
    r = r2[:-1]
    s = r2[1:]
    # mutual bbox prefilter per segment pair
    p_min = np.minimum(p, q)
    p_max = np.maximum(p, q)
    r_min = np.minimum(r, s)
    r_max = np.maximum(r, s)
    ok = (
        (p_min[:, None, 0] <= r_max[None, :, 0])
        & (p_max[:, None, 0] >= r_min[None, :, 0])
        & (p_min[:, None, 1] <= r_max[None, :, 1])
        & (p_max[:, None, 1] >= r_min[None, :, 1])
    )
    if not ok.any():
        return False
    i, j = np.nonzero(ok)
    px, py = p[i, 0], p[i, 1]
    qx, qy = q[i, 0], q[i, 1]
    rx, ry = r[j, 0], r[j, 1]
    sx, sy = s[j, 0], s[j, 1]
    d1 = _cross(rx, ry, sx, sy, px, py)
    d2 = _cross(rx, ry, sx, sy, qx, qy)
    d3 = _cross(px, py, qx, qy, rx, ry)
    d4 = _cross(px, py, qx, qy, sx, sy)
    proper = (
        ((d1 > 0) != (d2 > 0))
        & ((d3 > 0) != (d4 > 0))
        & (d1 != 0)
        & (d2 != 0)
        & (d3 != 0)
        & (d4 != 0)
    )
    if proper.any():
        return True
    # collinear / endpoint-touch: a zero cross with the point inside the
    # other segment's bbox (the prefilter already guarantees bbox overlap
    # of the segment pair, but the *point* must be re-checked)
    def on_seg(d, x, y, ax, ay, bx, by):
        return (
            (d == 0)
            & (x >= np.minimum(ax, bx))
            & (x <= np.maximum(ax, bx))
            & (y >= np.minimum(ay, by))
            & (y <= np.maximum(ay, by))
        )

    touch = (
        on_seg(d1, px, py, rx, ry, sx, sy)
        | on_seg(d2, qx, qy, rx, ry, sx, sy)
        | on_seg(d3, rx, ry, px, py, qx, qy)
        | on_seg(d4, sx, sy, px, py, qx, qy)
    )
    return bool(touch.any())


def geometry_intersects(ga: Geometry, gb: Geometry) -> bool:
    """Boundary-inclusive intersects() for Polygon/MultiPolygon pairs."""
    ca = ga.all_coords()
    cb = gb.all_coords()
    if (
        ca[:, 0].max() < cb[:, 0].min()
        or cb[:, 0].max() < ca[:, 0].min()
        or ca[:, 1].max() < cb[:, 1].min()
        or cb[:, 1].max() < ca[:, 1].min()
    ):
        return False
    # vertex containment either way (covers containment + touch)
    if geometry_contains(ca[:, 0], ca[:, 1], gb).any():
        return True
    if geometry_contains(cb[:, 0], cb[:, 1], ga).any():
        return True
    # boundary crossings with no vertex inside
    for ra in ga.rings():
        for rb in gb.rings():
            if segments_cross_any(ra, rb):
                return True
    return False


# --- polygon intersection area (overlay) ------------------------------
#
# Sutherland-Hodgman clipping: the SUBJECT polygon (may be concave, may
# have holes via signed-area accounting) is clipped against each edge
# of a CONVEX clip polygon. Intersection area then follows from the
# shoelace sum over clipped rings: exterior rings add, holes subtract.
# The convex-clip restriction is explicit (`ConvexClipError`) — the
# overlay join validates its clip side up front rather than silently
# returning wrong areas for concave clips.


class ConvexClipError(ValueError):
    """Clip polygon is not convex (Sutherland-Hodgman precondition)."""


def _is_convex_ring(ring: np.ndarray) -> bool:
    """True if the closed ring is convex (no sign change in the edge
    cross products; collinear runs allowed)."""
    p = ring[:-1]
    n = len(p)
    if n < 3:
        return False
    a = p
    b = p[(np.arange(n) + 1) % n]
    c = p[(np.arange(n) + 2) % n]
    cr = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    return bool((cr >= -1e-18).all() or (cr <= 1e-18).all())


def clip_ring_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip a closed subject ring by a closed
    CONVEX clip ring. Returns the clipped CLOSED ring (possibly empty,
    shape (0, 2)). Orientation of the result follows the subject."""
    # orient clip CCW so "inside" is a consistent left-of-edge test
    if ring_area(clip) < 0:
        clip = clip[::-1]
    out = subject[:-1]
    for k in range(len(clip) - 1):
        if len(out) == 0:
            break
        ax, ay = clip[k]
        bx, by = clip[k + 1]
        x, y = out[:, 0], out[:, 1]
        # signed side of each subject vertex vs clip edge (>=0 inside)
        side = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        inside = side >= -1e-18
        nxt = np.roll(np.arange(len(out)), -1)
        res: list[np.ndarray] = []
        for i in range(len(out)):
            j = nxt[i]
            if inside[i]:
                res.append(out[i])
                if not inside[j]:
                    res.append(_edge_intersect(out[i], out[j], (ax, ay), (bx, by)))
            elif inside[j]:
                res.append(_edge_intersect(out[i], out[j], (ax, ay), (bx, by)))
        out = np.array(res) if res else np.empty((0, 2))
    if len(out) == 0:
        return np.empty((0, 2))
    return np.vstack([out, out[:1]])


def _edge_intersect(p, q, a, b):
    """Intersection of segment pq with the infinite line ab."""
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    sp = dx * (p[1] - ay) - dy * (p[0] - ax)
    sq = dx * (q[1] - ay) - dy * (q[0] - ax)
    t = sp / (sp - sq)
    return np.array([p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])])


def intersection_area_convex_clip(subject: Geometry, clip: Geometry) -> float:
    """Area of subject ∩ clip, where ``clip`` is a convex Polygon
    (single ring). Subject may be Polygon/MultiPolygon with holes:
    each ring is clipped separately and signed areas combine (exterior
    adds |area|, holes subtract — valid because clipping a convex
    region cannot split one ring into multiple parts... it CAN for a
    concave subject ring; Sutherland-Hodgman then returns the parts
    connected by zero-width bridges along the clip boundary, whose
    shoelace area is still exactly the intersection area)."""
    from . import wkb as _wkb

    if clip.kind != _wkb.POLYGON or len(clip.coords) != 1:
        raise ConvexClipError("clip must be a single-ring Polygon")
    clip_ring = clip.coords[0]
    if not _is_convex_ring(clip_ring):
        raise ConvexClipError("clip polygon is not convex")
    if subject.kind == _wkb.POLYGON:
        polys = [subject.coords]
    elif subject.kind == _wkb.MULTIPOLYGON:
        polys = subject.coords
    else:
        raise ValueError(f"intersection_area on {subject.name}")
    total = 0.0
    for rings in polys:
        for idx, ring in enumerate(rings):
            clipped = clip_ring_convex(ring, clip_ring)
            if len(clipped) < 4:
                continue
            a = abs(ring_area(clipped))
            total += a if idx == 0 else -a
    return total
