"""KSJ JPGIS-GML member reader (from scratch, stdlib ElementTree).

The reference converts only the shapefile members of a KSJ ZIP
(`/root/reference/rust/src/lib.rs:23-35` lists ``.shp`` members only),
but the bundles it ingests are named ``*_GML.zip`` and carry the same
features as JPGIS GML, and BASELINE.json's north_star names
"Shapefile/GML" ingest. This module adds the GML lane as new
capability, shaped to land in the exact same ingest schema as the
shapefile lane so downstream operators cannot tell them apart.

Structure of a KSJ GML document (JPGIS 2.1 / GML 3.2):

* geometry elements (``gml:Point`` / ``gml:Curve`` / ``gml:Surface``)
  are direct children of the dataset root, each carrying a ``gml:id``;
* feature elements live in the dataset's application namespace (e.g.
  ``ksj:AdministrativeBoundary``) and reference their geometry via an
  ``xlink:href="#id"`` child (``ksj:bounds``, ``ksj:position``, ...);
* coded attribute values carry ``codeSpace="AdminAreaCd.xml"`` — the
  basename names the same codelist the shapefile lane resolves through
  the translation registry (``ksj/codelists.py``), so value
  translation is shared, not re-implemented.

Coordinates: KSJ GML ``posList``/``pos`` text is "latitude longitude"
per the JGD geographic CRS axis order; we emit (x=lon, y=lat) to match
the shapefile lane's convention.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np

from ..geo import wkb

GML_NS = "http://www.opengis.net/gml"
XLINK_HREF = "{http://www.w3.org/1999/xlink}href"


class GmlError(ValueError):
    pass


_LOCAL_CACHE: dict[str, str] = {}


def _local(tag: str) -> str:
    # Memoized: a document has ~a dozen distinct tag strings but this
    # runs per element per feature (the parse profile's hottest call);
    # ET interns tag strings so the cache stays tiny.
    name = _LOCAL_CACHE.get(tag)
    if name is None:
        name = _LOCAL_CACHE[tag] = tag.rsplit("}", 1)[-1]
    return name


def _is_gml(tag: str) -> bool:
    return tag.startswith("{" + GML_NS)


_GML32_ID = "{http://www.opengis.net/gml/3.2}id"


def _gml_id(el: ET.Element) -> str | None:
    # Fast path: JPGIS documents are GML 3.2, so the id attribute key
    # is almost always the 3.2-namespaced one (this runs once per
    # element during indexing); other GML versions fall back to the
    # localname scan (key-only iteration — the scan runs on every
    # element of the document, so skip attribute-less elements and
    # avoid items() tuple allocations).
    attrib = el.attrib
    v = attrib.get(_GML32_ID)
    if v is not None or not attrib:
        return v
    for k in attrib:
        if k.endswith("}id") or k == "id":
            return attrib[k]
    return None


def _parse_poslist(text: str, dim: int = 2) -> np.ndarray:
    """posList "lat lon [h] lat lon [h] ..." → (n, 2) array of
    (x=lon, y=lat). ``dim`` is the srsDimension in force for the
    element (JPGIS allows 3 — ellipsoidal height — which is dropped,
    matching the 2-D output contract of every sink). Any other
    dimension is a hard GmlError rather than a silent mis-reshape."""
    try:
        vals = np.array(text.split(), dtype=np.float64)
    except ValueError as e:
        raise GmlError(f"non-numeric coordinate in posList: {e}") from e
    if dim == 2:
        if vals.size % 2 != 0:
            raise GmlError(
                f"coordinate count {vals.size} not divisible by "
                f"srsDimension=2 in posList"
            )
        latlon = vals.reshape(-1, 2)
    elif dim == 3:
        if vals.size % 3 != 0:
            raise GmlError(
                f"coordinate count {vals.size} not divisible by "
                f"srsDimension=3 in posList"
            )
        latlon = vals.reshape(-1, 3)[:, :2]  # drop ellipsoidal height
    else:
        raise GmlError(f"unsupported srsDimension={dim} in posList")
    return latlon[:, ::-1].copy()  # (lat, lon) -> (x=lon, y=lat)


def _dim_of(el: ET.Element, default: int) -> int:
    """srsDimension in force for a pos/posList element: its own
    attribute wins, else the document-level default."""
    raw = el.attrib.get("srsDimension")
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError as e:
        raise GmlError(f"non-integer srsDimension {raw!r}") from e


def _secure_parse(buf: bytes) -> ET.Element:
    """ET.fromstring with DTDs rejected.

    stdlib ElementTree expands nested internal entities ("billion
    laughs"): a <1 KB hostile member inflates to unbounded text and
    takes the executor with it (verified on this interpreter: a 6-level
    nest expands 3×10⁵× in 30 ms; three more levels is 3×10⁸×). Real
    KSJ GML carries no DTD, so any DOCTYPE is rejected outright at the
    expat level — before a single entity is declared — and the member
    quarantines to the error lane like every other hostile input."""
    parser = ET.XMLParser()
    expat = getattr(parser, "parser", None)
    if expat is not None:  # CPython's expat-backed XMLParser

        def _forbid(*_a):
            raise GmlError("DOCTYPE in GML member rejected "
                           "(entity-expansion hardening)")

        expat.StartDoctypeDeclHandler = _forbid
        expat.EntityDeclHandler = _forbid
    elif b"<!DOCTYPE" in buf[:4096]:  # non-expat fallback: prolog scan
        raise GmlError("DOCTYPE in GML member rejected "
                       "(entity-expansion hardening)")
    try:
        parser.feed(buf)
        return parser.close()
    except ET.ParseError as e:
        raise GmlError(f"XML parse failure: {e}") from e
    except (LookupError, ValueError, OverflowError) as e:
        # expat surfaces some malformed prologs as raw codec/value
        # errors (e.g. encoding="UTh-8" → LookupError) — same
        # quarantine lane as any other unparseable member
        raise GmlError(f"XML parse failure: {e}") from e


_SRS_DATUM = re.compile(r"\b(JGD2011|JGD2000|TD)\b")
_SRS_NAMES = {"JGD2011": "JGD2011", "JGD2000": "JGD2000", "TD": "Tokyo"}


class _GeometryIndex:
    """gml:id → element index with memoized geometry resolution."""

    def __init__(self, root: ET.Element):
        self.by_id: dict[str, ET.Element] = {}
        self.srs_name: str | None = None
        # Document-level srsDimension: only the root element or its
        # boundedBy/Envelope sets the default — an element-level
        # attribute on one curve must not leak onto unrelated posLists
        # (those read their own attribute via _dim_of).
        self.default_dim = _dim_of(root, 2)
        for child in root:
            if _local(child.tag) in ("boundedBy", "Envelope"):
                for el in child.iter():
                    if "srsDimension" in el.attrib:
                        self.default_dim = _dim_of(el, self.default_dim)
                        break
        # Hot loop: runs once per element of the document. Elements
        # without attributes (posList, patches, exterior, ...) carry
        # neither a gml:id nor an srsName — skip them outright; for the
        # rest, try the GML-3.2 id key inline before the generic
        # fallback (one dict.get instead of a function call in the
        # overwhelmingly common case).
        by_id = self.by_id
        for el in root.iter():
            attrib = el.attrib
            if not attrib:
                continue
            gid = attrib.get(_GML32_ID)
            if gid is None:
                gid = _gml_id(el)
            if gid is not None:
                by_id[gid] = el
            if self.srs_name is None:
                srs = attrib.get("srsName")
                if srs:
                    self.srs_name = srs
        self._memo: dict[str, wkb.Geometry] = {}

    # -- reference resolution ------------------------------------------
    def _deref(self, el: ET.Element) -> ET.Element:
        href = el.attrib.get(XLINK_HREF)
        if href is None:
            return el
        target = self.by_id.get(href.lstrip("#"))
        if target is None:
            raise GmlError(f"dangling xlink:href {href!r}")
        return target

    def resolve(self, gid: str) -> wkb.Geometry:
        if gid in self._memo:
            return self._memo[gid]
        el = self.by_id.get(gid)
        if el is None:
            raise GmlError(f"dangling reference: no geometry element with gml:id {gid!r}")
        geom = self.geometry_of(el)
        self._memo[gid] = geom
        return geom

    # -- per-kind builders ---------------------------------------------
    def geometry_of(self, el: ET.Element) -> wkb.Geometry:
        kind = _local(el.tag)
        if kind == "Point":
            return self._point(el)
        if kind in ("Curve", "LineString"):
            return wkb.Geometry(wkb.LINESTRING, self._curve_coords(el))
        if kind == "Surface":
            polys = self._surface_polys(el)
            if len(polys) == 1:
                return wkb.Geometry(wkb.POLYGON, polys[0])
            return wkb.Geometry(wkb.MULTIPOLYGON, polys)
        if kind == "MultiSurface":
            polys = []
            for m in el.iter():
                if _local(m.tag) == "surfaceMember":
                    polys.extend(self._surface_polys(self._deref(m)))
            return wkb.Geometry(wkb.MULTIPOLYGON, polys)
        raise GmlError(f"unsupported GML geometry element <{kind}>")

    def _point(self, el: ET.Element) -> wkb.Geometry:
        for c in el:
            if _local(c.tag) == "pos" and c.text:
                xy = _parse_poslist(c.text, _dim_of(c, self.default_dim))
                if len(xy) != 1:
                    raise GmlError("gml:pos with more than one coordinate")
                return wkb.Geometry(wkb.POINT, xy[0])
        raise GmlError("gml:Point without gml:pos")

    def _curve_coords(self, el: ET.Element) -> np.ndarray:
        """Concatenate every posList under a Curve/LineString, dropping
        the duplicated join vertex between consecutive segments."""
        parts: list[np.ndarray] = []
        for pl in el.iter():
            if _local(pl.tag) == "posList" and pl.text:
                parts.append(
                    _parse_poslist(pl.text, _dim_of(pl, self.default_dim))
                )
        if not parts:
            raise GmlError(f"<{_local(el.tag)}> contains no posList")
        out = [parts[0]]
        for seg in parts[1:]:
            if len(out[-1]) and np.array_equal(out[-1][-1], seg[0]):
                seg = seg[1:]
            out.append(seg)
        return np.concatenate(out)

    def _ring_coords(self, ring_el: ET.Element) -> np.ndarray:
        """gml:Ring (curveMember refs) or gml:LinearRing (inline
        posList) → closed (n, 2) ring."""
        kind = _local(ring_el.tag)
        if kind == "LinearRing":
            coords = self._curve_coords(ring_el)
        elif kind == "Ring":
            segs: list[np.ndarray] = []
            for m in ring_el.iter():
                if _local(m.tag) == "curveMember":
                    segs.append(self._curve_coords(self._deref(m)))
            if not segs:
                raise GmlError("gml:Ring without curveMember")
            joined = [segs[0]]
            for seg in segs[1:]:
                prev = joined[-1]
                if prev[-1, 0] == seg[0, 0] and prev[-1, 1] == seg[0, 1]:
                    seg = seg[1:]
                joined.append(seg)
            coords = np.concatenate(joined)
        else:
            raise GmlError(f"unsupported ring element <{kind}>")
        if len(coords) < 3:
            raise GmlError(f"degenerate ring ({len(coords)} vertices)")
        if coords[0, 0] != coords[-1, 0] or coords[0, 1] != coords[-1, 1]:
            coords = np.concatenate([coords, coords[:1]])
        return coords

    def _surface_polys(self, el: ET.Element) -> list[list[np.ndarray]]:
        """Surface → [[exterior, hole...], ...] — one entry per
        PolygonPatch / inline Polygon."""
        polys: list[list[np.ndarray]] = []
        for patch in el.iter():
            if _local(patch.tag) not in ("PolygonPatch", "Polygon"):
                continue
            rings: list[np.ndarray] = []
            holes: list[np.ndarray] = []
            for side in patch:
                name = _local(side.tag)
                if name not in ("exterior", "interior"):
                    continue
                inner = [c for c in side if _local(c.tag) in ("Ring", "LinearRing")]
                if not inner:
                    raise GmlError(f"<{name}> without Ring/LinearRing")
                coords = self._ring_coords(inner[0])
                (rings if name == "exterior" else holes).append(coords)
            if not rings:
                raise GmlError("PolygonPatch without exterior ring")
            polys.append([rings[0], *holes])
        if not polys:
            raise GmlError("Surface contains no PolygonPatch")
        return polys


def _geometry_ref(el: ET.Element) -> str | None:
    href = el.attrib.get(XLINK_HREF)
    return href.lstrip("#") if href else None


def read_gml(buf: bytes):
    """Parse one KSJ JPGIS-GML document.

    Returns ``(features, crs)`` where ``features`` is a list of
    ``(feature_type, attrs, geometry)`` tuples — ``attrs`` maps
    attribute localname → (text, codespace-or-None) and ``geometry`` is
    a :class:`ksj2gp_spark.geo.wkb.Geometry` (or None for features
    without a geometry reference) — and ``crs`` is the datum name the
    rest of the engine uses ("JGD2011" / "JGD2000" / "Tokyo").
    """
    root = _secure_parse(buf)
    idx = _GeometryIndex(root)

    features = []
    for el in root:
        if _is_gml(el.tag):
            continue  # gml:description, geometry elements, boundedBy...
        # A feature is an app-namespace element that references (or
        # inlines) a geometry; elements without one are document
        # metadata and are skipped.
        geom: wkb.Geometry | None = None
        attrs: dict[str, tuple[str | None, str | None]] = {}
        for child in el:
            name = _local(child.tag)
            ref = _geometry_ref(child)
            if ref is not None:
                geom = idx.resolve(ref)
                continue
            if _is_gml(child.tag):
                continue
            if len(child):
                # nested structure (rare in KSJ attribute tables):
                # flatten one level as name.subname
                for sub in child:
                    attrs[f"{name}.{_local(sub.tag)}"] = (
                        (sub.text or "").strip() or None,
                        sub.attrib.get("codeSpace"),
                    )
                continue
            attrs[name] = (
                (child.text or "").strip() or None,
                child.attrib.get("codeSpace"),
            )
        if geom is None and not attrs:
            continue
        features.append((_local(el.tag), attrs, geom))

    crs = "JGD2011"
    if idx.srs_name:
        m = _SRS_DATUM.search(idx.srs_name)
        if m:
            crs = _SRS_NAMES[m.group(1)]
    return features, crs


_NORM_INDEX: dict[str, dict[str, str]] | None = None


def _normalize(name: str) -> str:
    return name.replace("-", "").replace("_", "").casefold()


def codelist_for_codespace(codespace: str | None) -> dict[str, str] | None:
    """codeSpace="LandUseCd-09.xml" → the same codelist map the
    shapefile lane's translation registry holds (LAND_USE_CD_09), or
    None for unknown codeSpaces (value then passes through untranslated
    — the reference's on-miss semantics, builder.rs:107,118).

    The bridge is mechanical: official KSJ codelist basenames differ
    from the registry's internal static names only in separators and
    case, so both sides are matched after stripping ``-``/``_`` and
    casefolding."""
    if not codespace:
        return None
    global _NORM_INDEX
    if _NORM_INDEX is None:
        from ..ksj._codelist_data import CODELISTS, REGISTRY

        idx: dict[str, dict[str, str]] = {}
        for key, mapname in REGISTRY.items():
            m = CODELISTS.get(mapname)
            if m is not None:
                idx.setdefault(_normalize(key), m)
        for mapname, m in CODELISTS.items():
            idx.setdefault(_normalize(mapname), m)
        _NORM_INDEX = idx
    base = codespace.rsplit("/", 1)[-1]
    if base.lower().endswith(".xml"):
        base = base[:-4]
    return _NORM_INDEX.get(_normalize(base))
