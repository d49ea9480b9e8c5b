"""WKT (Well-Known Text) serializer/parser over the engine's Geometry
model — completes the interchange matrix next to WKB (geo/wkb.py),
GeoJSON (formats/geojson.py), Shapefile, GML, and GeoPackage.

Public simple-features text grammar, XY only (a third ordinate is
accepted on parse and dropped, the reference transform path's
behavior). Numbers serialize via repr-shortest round-trip (Python
float repr), so dumps∘loads is exact for any double.
"""

from __future__ import annotations

import re

import numpy as np

from . import wkb


class WktError(ValueError):
    pass


def _fmt(v: float) -> str:
    return repr(float(v))


def _ring_txt(arr) -> str:
    a = np.asarray(arr)
    return "(" + ", ".join(
        f"{_fmt(x)} {_fmt(y)}" for x, y in a[:, :2]
    ) + ")"


def dumps(g: wkb.Geometry) -> str:
    """Geometry → WKT string."""
    k = g.kind
    if k == wkb.POINT:
        c = np.asarray(g.coords)
        return f"POINT ({_fmt(c[0])} {_fmt(c[1])})"
    if k == wkb.MULTIPOINT:
        return "MULTIPOINT " + _ring_txt(g.coords)
    if k == wkb.LINESTRING:
        return "LINESTRING " + _ring_txt(g.coords)
    if k == wkb.MULTILINESTRING:
        return (
            "MULTILINESTRING ("
            + ", ".join(_ring_txt(p) for p in g.coords)
            + ")"
        )
    if k == wkb.POLYGON:
        return (
            "POLYGON ("
            + ", ".join(_ring_txt(r) for r in g.coords)
            + ")"
        )
    if k == wkb.MULTIPOLYGON:
        return (
            "MULTIPOLYGON ("
            + ", ".join(
                "(" + ", ".join(_ring_txt(r) for r in poly) + ")"
                for poly in g.coords
            )
            + ")"
        )
    raise WktError(f"cannot serialize kind {k}")


_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(.*)\s*$", re.S)


def _parse_coords_block(s: str):
    """Parse a balanced parenthesis block into nested lists of
    number pairs. Returns (tree, rest)."""
    s = s.lstrip()
    if not s.startswith("("):
        raise WktError(f"expected '(' at: {s[:30]!r}")
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i], s[i + 1:]
    raise WktError("unbalanced parentheses")


def _split_top(s: str) -> list[str]:
    """Split on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _pts(s: str) -> np.ndarray:
    rows = []
    for tok in s.split(","):
        nums = tok.split()
        if len(nums) < 2:
            raise WktError(f"bad coordinate: {tok!r}")
        rows.append((float(nums[0]), float(nums[1])))
    return np.asarray(rows, dtype="float64")


def loads(text: str) -> wkb.Geometry:
    """WKT string → Geometry. Raises WktError on malformed input."""
    m = _HEAD.match(text or "")
    if not m:
        raise WktError("empty WKT")
    tag = m.group(1).upper()
    body = m.group(2)
    try:
        inner, _rest = _parse_coords_block(body)
    except WktError:
        if body.strip().upper() == "EMPTY":
            raise WktError("EMPTY geometries unsupported") from None
        raise
    if tag == "POINT":
        p = _pts(inner)
        if len(p) != 1:
            raise WktError("POINT needs exactly one coordinate")
        return wkb.Geometry(wkb.POINT, p[0].copy())
    if tag == "MULTIPOINT":
        # both MULTIPOINT (1 2, 3 4) and ((1 2), (3 4)) forms
        parts = _split_top(inner)
        if parts and parts[0].lstrip().startswith("("):
            rows = [
                _pts(_parse_coords_block(p)[0])[0] for p in parts
            ]
            return wkb.Geometry(
                wkb.MULTIPOINT, np.asarray(rows, dtype="float64")
            )
        return wkb.Geometry(wkb.MULTIPOINT, _pts(inner))
    if tag == "LINESTRING":
        return wkb.Geometry(wkb.LINESTRING, _pts(inner))
    if tag == "MULTILINESTRING":
        return wkb.Geometry(
            wkb.MULTILINESTRING,
            [
                _pts(_parse_coords_block(p)[0])
                for p in _split_top(inner)
            ],
        )
    if tag == "POLYGON":
        return wkb.Geometry(
            wkb.POLYGON,
            [
                _pts(_parse_coords_block(p)[0])
                for p in _split_top(inner)
            ],
        )
    if tag == "MULTIPOLYGON":
        polys = []
        for ptxt in _split_top(inner):
            pin, _ = _parse_coords_block(ptxt)
            polys.append(
                [
                    _pts(_parse_coords_block(r)[0])
                    for r in _split_top(pin)
                ]
            )
        return wkb.Geometry(wkb.MULTIPOLYGON, polys)
    raise WktError(f"unsupported WKT type: {tag!r}")
