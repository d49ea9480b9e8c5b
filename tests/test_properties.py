"""Property-based tests (hypothesis) for the geometry kernels — the
invariants the distributed join relies on, under arbitrary inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ksj2gp_spark.geo import geom, grid, hexgrid, s2, transform, wkb

lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
jp_lon = st.floats(min_value=122.0, max_value=154.0, allow_nan=False)
jp_lat = st.floats(min_value=20.0, max_value=46.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=4, max_value=12))
def test_hex_point_in_own_cell(lon, lat, res):
    c = hexgrid.latlng_to_cell(np.array([lon]), np.array([lat]), res)
    cx, cy = hexgrid.cell_to_latlng(c)
    # the cell's center is within one circumradius of the point
    assert np.hypot(lon - cx[0], lat - cy[0]) <= hexgrid.edge_length(res) + 1e-9
    # center maps back to the same cell
    assert hexgrid.latlng_to_cell(cx, cy, res)[0] == c[0]


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st,
       lvl=st.integers(min_value=1, max_value=28),
       dlvl=st.integers(min_value=1, max_value=4))
def test_s2_parent_prefix(lon, lat, lvl, dlvl):
    parent_lvl = max(0, lvl - dlvl)
    c = s2.latlng_to_cell(np.array([lon]), np.array([lat]), lvl)
    p = s2.latlng_to_cell(np.array([lon]), np.array([lat]), parent_lvl)
    assert s2.parent(c, parent_lvl)[0] == p[0]
    assert int(s2.level_of(c)[0]) == lvl


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=1, max_value=20))
def test_grid_parent_contains(lon, lat, res):
    parent_res = max(0, res - 3)
    c = grid.latlng_to_cell(np.array([lon]), np.array([lat]), res)
    p = grid.latlng_to_cell(np.array([lon]), np.array([lat]), parent_res)
    assert grid.cell_to_parent(c, parent_res)[0] == p[0]


@settings(max_examples=100, deadline=None)
@given(lon=jp_lon, lat=jp_lat)
def test_helmert_roundtrip(lon, lat):
    # 2D round-trip drops the intermediate ellipsoidal height (the
    # datum offset puts the surface ~20m off the other ellipsoid), which
    # costs up to ~2mm horizontally — identical to proj's 2D pipeline.
    tl, tb, _ = transform.wgs84_to_tokyo(np.array([lon]), np.array([lat]))
    bl, bb, _ = transform.tokyo_to_wgs84(tl, tb)
    assert abs(bl[0] - lon) < 5e-7 and abs(bb[0] - lat) < 5e-7
    # threading h through is exact
    tl, tb, th = transform.wgs84_to_tokyo(np.array([lon]), np.array([lat]))
    bl, bb, _ = transform.tokyo_to_wgs84(tl, tb, th)
    assert abs(bl[0] - lon) < 1e-12 and abs(bb[0] - lat) < 1e-12


@settings(max_examples=100, deadline=None)
@given(
    coords=st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
        unique=True,
    )
)
def test_wkb_roundtrip_polygon(coords):
    buf = wkb.polygon(coords)
    g = wkb.loads(buf)
    assert g.kind == wkb.POLYGON
    assert wkb.loads(wkb.dumps(g)).bounds() == g.bounds()


@settings(max_examples=100, deadline=None)
@given(
    px=st.floats(min_value=-3, max_value=7, allow_nan=False),
    py=st.floats(min_value=-3, max_value=7, allow_nan=False),
)
def test_pip_distance_consistency(px, py):
    """covers(p) ⇔ distance(p)==0 for a fixed concave polygon."""
    ring = np.array(
        [(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4), (0, 0)], dtype=float
    )
    g = wkb.Geometry(wkb.POLYGON, [ring])
    inside = bool(geom.polygon_contains(np.array([px]), np.array([py]), [ring])[0])
    d = float(geom.distance_to_geometry(np.array([px]), np.array([py]), g)[0])
    if inside:
        assert d == 0.0
    else:
        assert d > 0.0


@settings(max_examples=50, deadline=None)
@given(
    x0=st.floats(min_value=130, max_value=140, allow_nan=False),
    y0=st.floats(min_value=30, max_value=40, allow_nan=False),
    w=st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
    h=st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_covers_are_supersets(x0, y0, w, h, seed):
    """Any point inside a random rectangle maps to a cell in the
    rectangle's cover — the invariant the candidate join depends on."""
    g = wkb.loads(wkb.polygon([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]))
    rng = np.random.default_rng(seed)
    px = x0 + rng.uniform(0, 1, 50) * w
    py = y0 + rng.uniform(0, 1, 50) * h
    for mod, res in ((hexgrid, 6), (s2, 10), (grid, 8)):
        cover = set(mod.cover_geometry(g, res).tolist())
        cells = mod.latlng_to_cell(px, py, res)
        assert set(cells.tolist()) <= cover, mod.__name__


@given(
    st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_polygonize_signed_areas_equal_cell_count(cells_set):
    """Any cell set: traced rings' signed areas sum to the cell count,
    and every ring is simple (no repeated vertex except closure)."""
    import numpy as np

    from ksj2gp_spark.operators import raster

    ii = np.array([c[0] for c in cells_set])
    jj = np.array([c[1] for c in cells_set])
    rings = raster.trace_rings(*raster.boundary_edges(ii, jj))
    total = sum(raster._shoelace(r) for r in rings)
    assert total == len(cells_set)
    for r in rings:
        body = [tuple(v) for v in r[:-1]]
        assert len(set(body)) == len(body)


# --- cross-engine hash parity (the dedup oracle's foundation) ---

# Surrogates (category Cs) are excluded: Spark strings arrive via
# Arrow from valid UTF-8, where lone surrogates cannot occur. NUL is
# excluded because it is the internal batch separator.
_SHINGLE_TEXT = st.text(
    alphabet=st.characters(
        blacklist_characters="\x00",
        blacklist_categories=("Cs",),
        max_codepoint=0x2FFFF,
    ),
    max_size=30,
)


@given(
    st.lists(st.one_of(_SHINGLE_TEXT, st.none()), min_size=0, max_size=20),
    st.sampled_from([2, 3, 5]),
)
@settings(max_examples=80, deadline=None)
def test_batch_shingle_hashes_match_per_doc_path(texts, n_shingle):
    """The index-arithmetic batch shingler (no per-shingle strings)
    must be bit-identical to the straightforward _shingles +
    _poly_hashes composition for ANY input — that identity is what the
    golden signatures and DuckDB minhash oracles rest on."""
    import pandas as pd

    from ksj2gp_spark.operators.dedup import (
        _batch_shingle_hashes,
        _poly_hashes,
        _shingles,
    )

    per_doc = [_shingles(t or "", n_shingle) for t in texts]
    offsets = np.cumsum([0] + [len(s) for s in per_doc])[:-1]
    r1, r2 = _poly_hashes([s for doc in per_doc for s in doc])
    g1, g2, go = _batch_shingle_hashes(
        pd.Series(texts, dtype=object), n_shingle
    )
    assert np.array_equal(go, np.asarray(offsets))
    assert np.array_equal(g1, r1)
    assert np.array_equal(g2, r2)


@given(st.lists(_SHINGLE_TEXT, min_size=1, max_size=15))
@settings(max_examples=60, deadline=None)
def test_poly_hash_matches_duckdb(shingles):
    """The vectorized numpy polynomial hash (operators/dedup.py) must
    equal DuckDB's list_reduce-over-codepoints expression for ANY
    unicode input — this identity is what makes the minhash/simhash
    contract queries oracle-checkable."""
    import duckdb

    import __spark_entry__ as entry

    from ksj2gp_spark.operators.dedup import _poly_hashes

    h1, h2 = _poly_hashes(shingles)
    con = duckdb.connect()
    e1 = entry._poly_hash_sql("s", 131)
    e2 = entry._poly_hash_sql("s", 137)
    for s, a, b in zip(shingles, h1, h2):
        got1, got2 = con.execute(
            f"SELECT {e1}, {e2} FROM (SELECT ? AS s)", [s]
        ).fetchone()
        assert got1 == int(a), (s, got1, int(a))
        assert got2 == int(b), (s, got2, int(b))


# --- parser robustness: corrupt bytes → typed errors, never crashes ---

@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_zip_parse_never_crashes(data):
    """parse_zip_bytes must quarantine ANY input in the error lane."""
    from ksj2gp_spark.operators.ingest import parse_zip_bytes

    pdf = parse_zip_bytes("N03-20240101_13_GML.zip", data)
    assert len(pdf) >= 1
    assert pdf.iloc[0]["error"] is not None


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_dbf_reader_raises_typed_error_only(data):
    from ksj2gp_spark.formats import dbf as dbf_mod

    try:
        dbf_mod.read_dbf(data)
    except dbf_mod.DbfError:
        pass  # typed rejection is the contract


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_shp_reader_raises_typed_error_only(data):
    from ksj2gp_spark.formats import shp as shp_mod

    try:
        shp_mod.read_shp(data)
    except shp_mod.ShpError:
        pass


def _valid_dbf() -> bytes:
    from ksj2gp_spark.formats import dbf as dbf_mod

    fields = [
        dbf_mod.DbfField("NAME", "C", 8),
        dbf_mod.DbfField("NUM", "N", 6, 2),
        dbf_mod.DbfField("FLAG", "L", 1),
    ]
    rows = [["abc", 1.25, True], ["def", -3.5, False], [None, None, None]]
    return dbf_mod.write_dbf(fields, rows)


@given(st.integers(0, 10**9), st.integers(1, 16))
@settings(max_examples=120, deadline=None)
def test_dbf_mutated_bytes_no_foreign_exceptions(seed, n_flips):
    """Bit-flipped valid files exercise the DEEP decode paths: outcome
    must be a successful parse or a typed DbfError — never a raw
    struct.error / IndexError / UnicodeDecodeError escape."""
    from ksj2gp_spark.formats import dbf as dbf_mod

    buf = bytearray(_valid_dbf())
    rng = np.random.default_rng(seed)
    for pos in rng.integers(0, len(buf), n_flips):
        buf[pos] ^= int(rng.integers(1, 256))
    try:
        dbf_mod.read_dbf(bytes(buf))
    except dbf_mod.DbfError:
        pass


@given(st.integers(0, 10**9), st.integers(1, 16), st.booleans())
@settings(max_examples=120, deadline=None)
def test_shp_mutated_bytes_no_foreign_exceptions(seed, n_flips, m_typed):
    """Bit-flipped valid files (base AND M-typed, whose records carry
    the optional trailing measure block) must parse or raise ShpError —
    never a raw struct/numpy/index error."""
    from ksj2gp_spark.formats import shp as shp_mod
    from ksj2gp_spark.geo import wkb as W

    if m_typed:
        ring = np.array(
            [[0.0, 0.0, 1.0], [1.0, 0.0, 2.0], [1.0, 1.0, 3.0],
             [0.0, 0.0, 1.0]]
        )
        geoms = [W.Geometry(W.POLYGON, [ring], False, True)]
    else:
        geoms = [W.loads(W.polygon([(0, 0), (1, 0), (1, 1), (0, 0)]))]
    shp_buf, _ = shp_mod.write_shp(geoms)
    buf = bytearray(shp_buf)
    rng = np.random.default_rng(seed)
    for pos in rng.integers(0, len(buf), n_flips):
        buf[pos] ^= int(rng.integers(1, 256))
    try:
        shp_mod.read_shp(bytes(buf))
    except shp_mod.ShpError:
        pass


def _valid_gml() -> bytes:
    """A KSJ-shaped GML doc (Curve → Surface → xlink'd feature)."""
    sq = "35 139 35 139.1 35.1 139.1 35.1 139 35 139"
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<ksj:Dataset gml:id="DS0"'
        ' xmlns:gml="http://www.opengis.net/gml/3.2"'
        ' xmlns:xlink="http://www.w3.org/1999/xlink"'
        ' xmlns:ksj="http://nlftp.mlit.go.jp/ksj/schemas/ksj-app">'
        '<gml:Curve gml:id="c0" srsName="fguuid:jgd2011.bl"><gml:segments>'
        f"<gml:LineStringSegment><gml:posList>{sq}</gml:posList>"
        "</gml:LineStringSegment></gml:segments></gml:Curve>"
        '<gml:Surface gml:id="s0"><gml:patches><gml:PolygonPatch>'
        '<gml:exterior><gml:Ring><gml:curveMember xlink:href="#c0"/>'
        "</gml:Ring></gml:exterior></gml:PolygonPatch></gml:patches>"
        "</gml:Surface>"
        '<ksj:AdministrativeBoundary gml:id="a0">'
        '<ksj:bounds xlink:href="#s0"/>'
        '<ksj:administrativeAreaCode codeSpace="AdminAreaCd.xml">13101'
        "</ksj:administrativeAreaCode></ksj:AdministrativeBoundary>"
        "</ksj:Dataset>"
    ).encode()


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_gml_reader_raises_typed_error_only(data):
    from ksj2gp_spark.formats import gml as gml_mod

    try:
        gml_mod.read_gml(data)
    except gml_mod.GmlError:
        pass  # typed rejection is the contract


@given(st.integers(0, 10**9), st.integers(1, 16))
@settings(max_examples=120, deadline=None)
def test_gml_mutated_bytes_no_foreign_exceptions(seed, n_flips):
    """Bit-flipped valid GML exercises the deep paths (xlink deref,
    ring assembly, posList numerics): outcome must be a successful
    parse or a typed GmlError — never a raw ValueError/KeyError/
    ParseError escape."""
    from ksj2gp_spark.formats import gml as gml_mod

    buf = bytearray(_valid_gml())
    rng = np.random.default_rng(seed)
    for pos in rng.integers(0, len(buf), n_flips):
        buf[pos] ^= int(rng.integers(1, 256))
    try:
        gml_mod.read_gml(bytes(buf))
    except gml_mod.GmlError:
        pass
