"""WKT serializer/parser (geo/wkt.py): roundtrips, grammar forms,
fixture-layer parity, and typed errors."""

import numpy as np
import pytest

from ksj2gp_spark import fixtures
from ksj2gp_spark.geo import wkb, wkt


def _rt(g: wkb.Geometry) -> bool:
    return wkb.dumps(wkt.loads(wkt.dumps(g))) == wkb.dumps(g)


def test_roundtrip_all_types():
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    geoms = [
        wkb.Geometry(wkb.POINT, np.array([1.5, -2.25])),
        wkb.Geometry(wkb.MULTIPOINT, np.array([[0.0, 0.0], [3.5, 4.5]])),
        wkb.Geometry(wkb.LINESTRING, np.array([[0, 0], [2, 3.0]])),
        wkb.Geometry(
            wkb.MULTILINESTRING,
            [np.array([[0.0, 0], [1, 1]]), np.array([[2.0, 2], [3, 3]])],
        ),
        wkb.Geometry(
            wkb.POLYGON,
            [np.array(sq), np.array(sq) * 0.25 + 0.25],
        ),
        wkb.Geometry(
            wkb.MULTIPOLYGON,
            [[np.array(sq)], [np.array(sq) + 5.0]],
        ),
    ]
    for g in geoms:
        assert _rt(g), g.name


def test_fixture_layer_parity():
    for _, row in fixtures.polygon_layer().iterrows():
        g = wkb.loads(bytes(row["geometry"]))
        assert _rt(g), row["polygon_id"]


def test_shortest_repr_roundtrips_exact_doubles():
    v = 139.123456789012345  # not representable exactly; repr shortest
    g = wkb.Geometry(wkb.POINT, np.array([v, -v / 3.0]))
    g2 = wkt.loads(wkt.dumps(g))
    assert g2.coords[0] == g.coords[0] and g2.coords[1] == g.coords[1]


def test_multipoint_both_grammar_forms():
    a = wkt.loads("MULTIPOINT (1 2, 3 4)")
    b = wkt.loads("MULTIPOINT ((1 2), (3 4))")
    assert wkb.dumps(a) == wkb.dumps(b)


def test_third_ordinate_dropped():
    g = wkt.loads("LINESTRING (0 0 7, 1 1 7)")
    assert g.coords.shape == (2, 2)


def test_malformed_raises_typed():
    for bad in [
        "", "POINT", "POINT (1)", "TRIANGLE ((0 0, 1 1, 0 1))",
        "POLYGON ((0 0, 1 1", "POINT EMPTY",
    ]:
        with pytest.raises(wkt.WktError):
            wkt.loads(bad)
