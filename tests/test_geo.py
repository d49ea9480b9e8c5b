"""Geometry kernel tests: WKB round-trips, PIP/distance correctness
against brute-force oracles, Helmert transform round-trips, and cell
scheme invariants (determinism, parent containment, covering)."""

import numpy as np
import pytest

from ksj2gp_spark.geo import geom, grid, hexgrid, s2, transform, wkb

rng = np.random.default_rng(42)


def _square(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


class TestWkb:
    def test_point_roundtrip(self):
        buf = wkb.point(139.5, 35.5)
        g = wkb.loads(buf)
        assert g.kind == wkb.POINT
        assert g.coords[0] == 139.5 and g.coords[1] == 35.5
        assert wkb.dumps(g) == buf

    def test_polygon_roundtrip(self):
        buf = wkb.polygon(_square(0, 0, 2, 1), _square(0.2, 0.2, 0.4, 0.4))
        g = wkb.loads(buf)
        assert g.kind == wkb.POLYGON
        assert len(g.coords) == 2
        assert len(g.coords[0]) == 5  # auto-closed
        assert g.bounds() == (0.0, 0.0, 2.0, 1.0)
        assert wkb.loads(wkb.dumps(g)).bounds() == g.bounds()

    def test_multipolygon(self):
        buf = wkb.multipolygon(
            [[_square(0, 0, 1, 1)], [_square(2, 2, 3, 3)]]
        )
        g = wkb.loads(buf)
        assert g.kind == wkb.MULTIPOLYGON
        assert len(g.exterior_rings()) == 2
        assert g.bounds() == (0.0, 0.0, 3.0, 3.0)

    def test_z_point(self):
        buf = wkb.point(1.0, 2.0, 3.0)
        g = wkb.loads(buf)
        assert g.has_z and g.coords[2] == 3.0

    def test_big_endian_read(self):
        import struct

        buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 5.0, 6.0)
        g = wkb.loads(buf)
        assert g.coords[0] == 5.0 and g.coords[1] == 6.0

    def test_errors(self):
        with pytest.raises(wkb.WkbError):
            wkb.loads(b"")
        with pytest.raises(wkb.WkbError):
            wkb.loads(b"\x01\x63\x00\x00\x00")  # unknown type 99


class TestPip:
    def test_square_inside_outside_boundary(self):
        rings = [np.array(_square(0, 0, 2, 2) + [(0, 0)], dtype=float)]
        xs = np.array([1.0, 3.0, 0.0, 2.0, 1.0, -0.001])
        ys = np.array([1.0, 1.0, 0.0, 2.0, 0.0, 1.0])
        got = geom.polygon_contains(xs, ys, rings)
        # boundary points covered (covers semantics)
        assert got.tolist() == [True, False, True, True, True, False]

    def test_hole(self):
        rings = [
            np.array(_square(0, 0, 4, 4) + [(0, 0)], dtype=float),
            np.array(_square(1, 1, 2, 2) + [(1, 1)], dtype=float),
        ]
        xs = np.array([0.5, 1.5, 1.0, 3.5])
        ys = np.array([0.5, 1.5, 1.0, 3.5])
        got = geom.polygon_contains(xs, ys, rings)
        # in hole → not covered; on hole boundary → covered
        assert got.tolist() == [True, False, True, True]

    def test_concave_matches_matplotlib_free_oracle(self):
        # L-shaped polygon; oracle = per-point slow ray cast
        ring = np.array(
            [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3), (0, 0)],
            dtype=float,
        )
        pts = rng.uniform(-0.5, 3.5, size=(500, 2))
        got = geom.polygon_contains(pts[:, 0], pts[:, 1], [ring])

        def slow(px, py):
            inside = False
            for k in range(len(ring) - 1):
                x0, y0 = ring[k]
                x1, y1 = ring[k + 1]
                if (y0 <= py) != (y1 <= py):
                    if px < x0 + (py - y0) * (x1 - x0) / (y1 - y0):
                        inside = not inside
            return inside

        exp = np.array([slow(px, py) for px, py in pts])
        assert (got == exp).all()

    def test_multipolygon_contains(self):
        buf = wkb.multipolygon([[_square(0, 0, 1, 1)], [_square(2, 2, 3, 3)]])
        g = wkb.loads(buf)
        got = geom.geometry_contains(
            np.array([0.5, 2.5, 1.5]), np.array([0.5, 2.5, 1.5]), g
        )
        assert got.tolist() == [True, True, False]

    def test_distance(self):
        g = wkb.loads(wkb.polygon(_square(0, 0, 2, 2)))
        d = geom.distance_to_geometry(
            np.array([1.0, 3.0, 0.0, 5.0]), np.array([1.0, 1.0, -1.0, 2.0]), g
        )
        np.testing.assert_allclose(d, [0.0, 1.0, 1.0, 3.0], atol=1e-12)

    def test_area_centroid(self):
        g = wkb.loads(
            wkb.polygon(_square(0, 0, 4, 4), _square(1, 1, 2, 2))
        )
        assert geom.geometry_area(g) == pytest.approx(15.0)
        cx, cy = geom.centroid(wkb.loads(wkb.polygon(_square(0, 0, 2, 4))))
        assert (cx, cy) == pytest.approx((1.0, 2.0))


class TestTransform:
    def test_tokyo_roundtrip(self):
        lon = rng.uniform(128, 146, 200)
        lat = rng.uniform(30, 45, 200)
        tlon, tlat, _ = transform.wgs84_to_tokyo(lon, lat)
        blon, blat, _ = transform.tokyo_to_wgs84(tlon, tlat)
        np.testing.assert_allclose(blon, lon, atol=1e-9)
        np.testing.assert_allclose(blat, lat, atol=1e-9)

    def test_tokyo_shift_magnitude(self):
        # The Tokyo→WGS84 datum shift around Japan is famously ~400-500 m
        # (roughly +12" lat, -12" lon near Tokyo).
        lon, lat, _ = transform.tokyo_to_wgs84(
            np.array([139.7]), np.array([35.7])
        )
        dlon = (lon[0] - 139.7) * 3600
        dlat = (lat[0] - 35.7) * 3600
        assert -13 < dlon < -9  # arc-seconds west
        assert 10 < dlat < 13  # arc-seconds north

    def test_identity_for_jgd(self):
        lon, lat = transform.to_wgs84(
            np.array([139.0]), np.array([35.0]), "JGD2011"
        )
        assert lon[0] == 139.0 and lat[0] == 35.0


class TestGridCells:
    def test_deterministic_and_stable(self):
        lons = rng.uniform(-180, 180, 1000)
        lats = rng.uniform(-90, 90, 1000)
        a = grid.latlng_to_cell(lons, lats, 12)
        b = grid.latlng_to_cell(lons, lats, 12)
        assert (a == b).all()

    def test_parent_contains(self):
        lons = rng.uniform(135, 145, 500)
        lats = rng.uniform(30, 40, 500)
        c12 = grid.latlng_to_cell(lons, lats, 12)
        c10 = grid.latlng_to_cell(lons, lats, 10)
        assert (grid.cell_to_parent(c12, 10) == c10).all()

    def test_center_roundtrip(self):
        lons = rng.uniform(-179, 179, 300)
        lats = rng.uniform(-89, 89, 300)
        c = grid.latlng_to_cell(lons, lats, 14)
        cx, cy = grid.cell_center(c)
        assert (grid.latlng_to_cell(cx, cy, 14) == c).all()

    def test_cover_geometry_is_superset(self):
        g = wkb.loads(wkb.polygon(_square(139.0, 35.0, 139.6, 35.4)))
        cells = set(grid.cover_geometry(g, 10).tolist())
        pts = rng.uniform(0, 1, size=(2000, 2))
        px = 139.0 + pts[:, 0] * 0.6
        py = 35.0 + pts[:, 1] * 0.4
        pc = grid.latlng_to_cell(px, py, 10)
        assert set(pc.tolist()) <= cells

    def test_oracle_sql_expr_matches(self):
        import duckdb

        lons = rng.uniform(-180, 180, 500)
        lats = rng.uniform(-90, 90, 500)
        ours = grid.latlng_to_cell(lons, lats, 11)
        con = duckdb.connect()
        con.register(
            "pts",
            __import__("pandas").DataFrame({"lon": lons, "lat": lats}),
        )
        expr = grid.oracle_sql_expr("lon", "lat", 11)
        theirs = con.sql(f"select {expr} as c from pts").df()["c"].to_numpy()
        assert (ours == theirs).all()


class TestHexCells:
    def test_resolution_scale(self):
        # res 8 edge ≈ 460 m in degrees (~0.0042°), aperture-7 halving
        assert hexgrid.edge_length(8) == pytest.approx(10.0 / 7**4)
        assert hexgrid.edge_length(10) / hexgrid.edge_length(8) == (
            pytest.approx(1 / 7)
        )

    def test_center_in_own_cell(self):
        lons = rng.uniform(128, 146, 1000)
        lats = rng.uniform(30, 45, 1000)
        c = hexgrid.latlng_to_cell(lons, lats, 8)
        cx, cy = hexgrid.cell_to_latlng(c)
        assert (hexgrid.latlng_to_cell(cx, cy, 8) == c).all()

    def test_partition_no_gaps(self):
        # every point maps to exactly one hex whose center is within
        # circumradius (edge) of the point
        lons = rng.uniform(139, 140, 2000)
        lats = rng.uniform(35, 36, 2000)
        c = hexgrid.latlng_to_cell(lons, lats, 7)
        cx, cy = hexgrid.cell_to_latlng(c)
        d = np.hypot(lons - cx, lats - cy)
        assert (d <= hexgrid.edge_length(7) + 1e-9).all()

    def test_grid_disk(self):
        c = int(hexgrid.latlng_to_cell(np.array([139.7]), np.array([35.7]), 8)[0])
        disk1 = hexgrid.grid_disk(c, 1)
        assert len(disk1) == 7 and c in disk1.tolist()
        assert len(hexgrid.grid_disk(c, 2)) == 19

    def test_cover_geometry_is_superset(self):
        g = wkb.loads(wkb.polygon(_square(139.0, 35.0, 139.5, 35.3)))
        cells = set(hexgrid.cover_geometry(g, 6).tolist())
        pts = rng.uniform(0, 1, size=(2000, 2))
        px = 139.0 + pts[:, 0] * 0.5
        py = 35.0 + pts[:, 1] * 0.3
        pc = hexgrid.latlng_to_cell(px, py, 6)
        assert set(pc.tolist()) <= cells


class TestS2:
    def test_id_structure(self):
        lons = rng.uniform(-180, 180, 500)
        lats = rng.uniform(-89, 89, 500)
        c = s2.latlng_to_cell(lons, lats, 30)
        assert (c & 1).all()  # sentinel bit
        faces = (c >> 61) & 7
        assert faces.max() <= 5

    def test_faces_of_axes(self):
        # +x axis → face 0, +y → 1, north pole → 2, -x → 3, -y → 4, south → 5
        lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        c = s2.latlng_to_cell(lons, lats, 10)
        assert (((c >> 61) & 7) == np.array([0, 1, 2, 3, 4, 5])).all()

    def test_parent_prefix_containment(self):
        lons = rng.uniform(128, 146, 1000)
        lats = rng.uniform(30, 45, 1000)
        c14 = s2.latlng_to_cell(lons, lats, 14)
        c10 = s2.latlng_to_cell(lons, lats, 10)
        assert (s2.parent(c14, 10) == c10).all()
        assert (s2.level_of(c14) == 14).all()
        assert (s2.level_of(c10) == 10).all()

    def test_center_roundtrip(self):
        lons = rng.uniform(-170, 170, 500)
        lats = rng.uniform(-80, 80, 500)
        for level in (10, 14, 20):
            c = s2.latlng_to_cell(lons, lats, level)
            cx, cy = s2.cell_to_latlng(c)
            assert (s2.latlng_to_cell(cx, cy, level) == c).all()

    def test_neighbors_differ(self):
        # distinct well-separated points at high level → distinct cells
        lons = np.linspace(139, 140, 100)
        lats = np.full(100, 35.5)
        c = s2.latlng_to_cell(lons, lats, 20)
        assert len(np.unique(c)) == 100

    def test_token(self):
        c = int(s2.latlng_to_cell(np.array([139.7]), np.array([35.7]), 12)[0])
        t = s2.token(c)
        assert 1 <= len(t) <= 16
        assert int(t.ljust(16, "0"), 16) == np.uint64(c)

    def test_cover_geometry_is_superset(self):
        g = wkb.loads(wkb.polygon(_square(139.0, 35.0, 139.5, 35.3)))
        cells = set(s2.cover_geometry(g, 11).tolist())
        pts = rng.uniform(0, 1, size=(2000, 2))
        px = 139.0 + pts[:, 0] * 0.5
        py = 35.0 + pts[:, 1] * 0.3
        pc = s2.latlng_to_cell(px, py, 11)
        assert set(pc.tolist()) <= cells


class TestSimplify:
    """Douglas-Peucker invariants: subsequence, bounded deviation,
    collinear removal, ring validity, hole collapse."""

    def _noisy_chain(self, n=400, amp=0.05, seed=7):
        r = np.random.default_rng(seed)
        x = np.linspace(0.0, 10.0, n)
        y = np.sin(x) + r.uniform(-amp, amp, n)
        return np.column_stack([x, y])

    def test_is_subsequence_and_endpoints(self):
        c = self._noisy_chain()
        out = geom.simplify_chain(c, 0.1)
        assert (out[0] == c[0]).all() and (out[-1] == c[-1]).all()
        # every kept vertex appears in order in the original
        i = 0
        for p in out:
            while not (c[i] == p).all():
                i += 1
        assert len(out) < len(c)

    def test_deviation_bounded(self):
        c = self._noisy_chain()
        tol = 0.08
        out = geom.simplify_chain(c, tol)
        # every original vertex lies within tol of the simplified chain
        d = np.full(len(c), np.inf)
        for a, b in zip(out[:-1], out[1:]):
            seg = np.array([a, b])
            d = np.minimum(d, geom.dist_to_segments(c[:, 0], c[:, 1], seg))
        assert d.max() <= tol + 1e-12

    def test_collinear_removed_exactly(self):
        # square with redundant on-edge vertices → 5-point ring
        ring = np.array(
            [(0, 0), (0.25, 0), (0.5, 0), (1, 0), (1, 0.5), (1, 1),
             (0.7, 1), (0, 1), (0, 0.2), (0, 0)],
            dtype=np.float64,
        )
        out = geom.simplify_ring(ring, 1e-9)
        assert out is not None and len(out) == 5
        g0 = wkb.loads(wkb.polygon([tuple(p) for p in ring[:-1]]))
        g1 = geom.simplify_geometry(g0, 1e-9)
        assert abs(geom.geometry_area(g1) - 1.0) < 1e-12

    def test_tol_zero_identity(self):
        c = self._noisy_chain(50)
        assert (geom.simplify_chain(c, 0.0) == c).all()

    def test_hole_collapse_dropped_exterior_kept(self):
        outer = _square(0, 0, 4, 4)
        tiny = _square(2.0, 2.0, 2.001, 2.001)
        g = wkb.loads(wkb.polygon(outer, tiny))
        s = geom.simplify_geometry(g, 0.01)
        assert len(s.coords) == 1  # hole gone
        assert abs(geom.geometry_area(s) - 16.0) < 1e-9
        # an exterior that would collapse keeps its original ring
        small = wkb.loads(wkb.polygon(_square(0, 0, 0.001, 0.001)))
        kept = geom.simplify_geometry(small, 0.01)
        assert len(kept.coords[0]) == len(small.coords[0])

    def test_multipolygon_and_linestring(self):
        mp = wkb.loads(
            wkb.multipolygon(
                [[_square(0, 0, 1, 1)], [_square(2, 2, 3, 3)]]
            )
        )
        s = geom.simplify_geometry(mp, 1e-6)
        assert s.kind == wkb.MULTIPOLYGON and len(s.coords) == 2
        c = self._noisy_chain(100)
        ls = wkb.Geometry(wkb.LINESTRING, c)
        out = geom.simplify_geometry(ls, 0.2)
        assert out.kind == wkb.LINESTRING and len(out.coords) < 100

    def test_classification_unchanged_away_from_boundary(self):
        # points farther than tol from the boundary keep their PIP result
        r = np.random.default_rng(3)
        n = 64
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        rad = 1.0 + 0.02 * np.sin(7 * ang)
        ring = [(float(np.cos(a) * s), float(np.sin(a) * s))
                for a, s in zip(ang, rad)]
        g = wkb.loads(wkb.polygon(ring))
        tol = 0.05
        s = geom.simplify_geometry(g, tol)
        px = r.uniform(-1.5, 1.5, 4000)
        py = r.uniform(-1.5, 1.5, 4000)
        before = geom.geometry_contains(px, py, g)
        after = geom.geometry_contains(px, py, s)
        dist = geom.distance_to_geometry(px, py, g)
        # distance_to_geometry is 0 inside; measure distance to boundary
        bdist = np.full(len(px), np.inf)
        for rr in g.rings():
            bdist = np.minimum(bdist, geom.dist_to_segments(px, py, rr))
        far = bdist > tol
        assert (before[far] == after[far]).all()
        del dist


class TestTokyoGeometryReproject:
    """Structure-preserving Tokyo→WGS84 (a flattened MultiPolygon would
    turn part-2 exteriors into holes under the even-odd PIP rule)."""

    def _tokyo_multipoly(self):
        parts_wgs = [
            _square(139.0, 35.0, 139.5, 35.5),
            _square(140.0, 36.0, 140.5, 36.5),
        ]
        tok_parts = []
        for sqr in parts_wgs:
            arr = np.array(sqr + [sqr[0]], dtype=np.float64)
            lo, la, _ = transform.wgs84_to_tokyo(arr[:, 0], arr[:, 1])
            tok_parts.append([np.column_stack([lo, la])])
        return wkb.Geometry(wkb.MULTIPOLYGON, tok_parts)

    def test_multipolygon_parts_survive(self):
        g = transform.tokyo_geometry_to_wgs84(self._tokyo_multipoly())
        assert g.kind == wkb.MULTIPOLYGON and len(g.coords) == 2
        # a point inside EACH part must be covered after reprojection
        for x, y in ((139.25, 35.25), (140.25, 36.25)):
            assert bool(
                geom.geometry_contains(np.array([x]), np.array([y]), g)[0]
            ), (x, y)

    def test_normalize_polygons_preserves_parts(self):
        import pandas as pd

        from ksj2gp_spark.operators import cells

        pdf = pd.DataFrame(
            {
                "polygon_id": ["mp"],
                "geometry": [wkb.dumps(self._tokyo_multipoly())],
                "crs": ["Tokyo"],
            }
        )
        out = cells.normalize_polygons(pdf)
        g = wkb.loads(out["geometry"].iloc[0])
        assert g.kind == wkb.MULTIPOLYGON
        assert bool(
            geom.geometry_contains(
                np.array([140.25]), np.array([36.25]), g
            )[0]
        )

    def test_point_and_linestring_reproject(self):
        lon, lat = 139.741357, 35.658099
        lo_t, la_t, _ = transform.wgs84_to_tokyo(
            np.array([lon]), np.array([lat])
        )
        p = wkb.Geometry(wkb.POINT, np.array([lo_t[0], la_t[0]]))
        p2 = transform.tokyo_geometry_to_wgs84(p)
        assert abs(p2.coords[0] - lon) < 1e-6  # Helmert round-trip ~4mm
        assert abs(p2.coords[1] - lat) < 1e-6
        ls = wkb.Geometry(
            wkb.LINESTRING,
            np.column_stack([lo_t, la_t]),
        )
        ls2 = transform.tokyo_geometry_to_wgs84(ls)
        assert ls2.kind == wkb.LINESTRING
        assert abs(ls2.coords[0, 0] - lon) < 1e-6


class TestOverlayKernel:
    """Sutherland-Hodgman intersection area: exact on analytic cases."""

    def _sq(self, x0, y0, x1, y1):
        return np.array(
            [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=float
        )

    def _poly(self, *rings):
        return wkb.loads(
            wkb.polygon(*[[tuple(p) for p in r[:-1]] for r in rings])
        )

    def test_rect_cases(self):
        a = self._poly(self._sq(0, 0, 2, 2))
        assert (
            abs(
                geom.intersection_area_convex_clip(
                    a, self._poly(self._sq(1, 1, 3, 3))
                )
                - 1.0
            )
            < 1e-12
        )
        assert (
            geom.intersection_area_convex_clip(
                a, self._poly(self._sq(5, 5, 6, 6))
            )
            == 0.0
        )

    def test_hole_and_concave_subject(self):
        donut = self._poly(self._sq(0, 0, 4, 4), self._sq(1, 1, 3, 3))
        half = self._poly(self._sq(0, 0, 2, 4))
        assert abs(geom.intersection_area_convex_clip(donut, half) - 6.0) < 1e-12
        U = wkb.loads(
            wkb.polygon(
                [(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3)]
            )
        )
        band = self._poly(self._sq(0, 2, 3, 3))  # cuts off both prongs
        assert abs(geom.intersection_area_convex_clip(U, band) - 2.0) < 1e-12

    def test_triangle_clip_and_convexity_guard(self):
        tri = wkb.loads(wkb.polygon([(0, 0), (4, 0), (0, 4)]))
        sq44 = self._poly(self._sq(0, 0, 4, 4))
        assert abs(geom.intersection_area_convex_clip(sq44, tri) - 8.0) < 1e-12
        L = wkb.loads(
            wkb.polygon([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)])
        )
        with pytest.raises(geom.ConvexClipError):
            geom.intersection_area_convex_clip(sq44, L)

    def test_clip_orientation_independent(self):
        a = self._poly(self._sq(0, 0, 2, 2))
        cw = self._poly(self._sq(1, 1, 3, 3))
        cw.coords[0] = cw.coords[0][::-1].copy()  # reverse to CW
        assert abs(geom.intersection_area_convex_clip(a, cw) - 1.0) < 1e-12

    def test_matches_raster_estimate_random(self):
        r = np.random.default_rng(11)
        for _ in range(5):
            x0, y0 = r.uniform(0, 2, 2)
            subj = self._poly(self._sq(x0, y0, x0 + r.uniform(1, 3), y0 + r.uniform(1, 3)))
            c0, c1 = r.uniform(0, 2, 2)
            clip = self._poly(self._sq(c0, c1, c0 + r.uniform(1, 3), c1 + r.uniform(1, 3)))
            got = geom.intersection_area_convex_clip(subj, clip)
            # analytic rectangle overlap
            sb, cb = subj.bounds(), clip.bounds()
            w = max(0.0, min(sb[2], cb[2]) - max(sb[0], cb[0]))
            h = max(0.0, min(sb[3], cb[3]) - max(sb[1], cb[1]))
            assert abs(got - w * h) < 1e-10
