"""Deterministic synthetic fixtures (FIXTURES.md §§1-2): the KSJ-style
polygon layer and the image+caption table with `input_hint` schema.

Everything is derived arithmetically from integer keys (no RNG state),
so the same rows are produced on any executor at any parallelism —
a requirement for the local[8] vs local[32] determinism evidence.

The image table is generated *distributed* (spark.range → mapInPandas)
so fixture generation itself scales; nothing materializes on the
driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .formats import imagecodec
from .geo import wkb

# Polygon layer bounding box (FIXTURES.md §2)
LON0, LON1 = 139.0, 141.0
LAT0, LAT1 = 35.0, 37.0

# Three "prefectures" as lat bands, hot ones first (Tokyo/Osaka analog).
PREFS = [
    ("13", "東京都", LAT0 + 0.0, LAT0 + 2.0 / 3.0),
    ("27", "大阪府", LAT0 + 2.0 / 3.0, LAT0 + 4.0 / 3.0),
    ("01", "北海道", LAT0 + 4.0 / 3.0, LAT1),
]
N_POLY_PER_PREF = 7
HOT_SHARE = 0.70  # fraction of image anchors inside the two hot bands
OCEAN_SHARE = 0.05  # anchors outside every polygon (anti-join lane)

_MIX = 2654435761  # Knuth multiplicative hash constant
_MOD = 1 << 20


def _u(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform in [0, 1) from integer keys — dyadic
    rationals, so bit-identical in any engine evaluating the same
    integer arithmetic."""
    return (((i + salt) * _MIX) % _MOD).astype(np.float64) / _MOD


def polygon_layer(crs: str = "JGD2011") -> pd.DataFrame:
    """21 convex polygons (3 prefecture bands × 7 irregular lon slices)
    tiling the box; columns mirror a translated N03 conversion output."""
    rows = []
    for p, (code_pref, pref_name, lat_lo, lat_hi) in enumerate(PREFS):
        # Irregular but deterministic slice widths
        w = 1.0 + _u(np.arange(N_POLY_PER_PREF, dtype=np.int64), 97 + p)
        edges = np.concatenate([[0.0], np.cumsum(w)])
        edges = LON0 + edges / edges[-1] * (LON1 - LON0)
        for m in range(N_POLY_PER_PREF):
            x0, x1 = float(edges[m]), float(edges[m + 1])
            admin_code = f"{code_pref}{m + 101:03d}"
            rows.append(
                {
                    "polygon_id": f"poly_{p}_{m}",
                    "行政区域コード": admin_code,
                    "都道府県名": pref_name,
                    "区町村名": f"{pref_name}市区{m + 1}",
                    "geometry": wkb.polygon(
                        [(x0, lat_lo), (x1, lat_lo), (x1, lat_hi), (x0, lat_hi)]
                    ),
                    "crs": crs,
                }
            )
    return pd.DataFrame(rows)


def polygon_layer_tokyo_datum() -> pd.DataFrame:
    """Variant with coordinates pre-shifted into the Tokyo datum so the
    engine's Helmert transform must reproduce the WGS84 originals."""
    from .geo import transform

    pdf = polygon_layer(crs="Tokyo")
    out_rows = []
    for _, row in pdf.iterrows():
        g = wkb.loads(row["geometry"])
        rings = []
        for ring in g.coords:
            tlon, tlat, _ = transform.wgs84_to_tokyo(ring[:, 0], ring[:, 1])
            rings.append(np.column_stack([tlon, tlat]))
        row = row.copy()
        row["geometry"] = wkb.dumps(wkb.Geometry(wkb.POLYGON, rings))
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def anchor_lonlat(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic image anchor points: 70% in the two hot prefecture
    bands, 25% in the cold band, 5% in the ocean east of the box."""
    ids = np.asarray(ids, dtype=np.int64)
    sel = _u(ids, 1)
    lon_u = _u(ids, 2)
    lat_u = _u(ids, 3)

    hot = sel < HOT_SHARE
    ocean = sel >= 1.0 - OCEAN_SHARE
    cold = ~hot & ~ocean

    lon = np.empty(len(ids))
    lat = np.empty(len(ids))
    band_h = 2.0 / 3.0
    # hot: split between band 0 and band 1 by parity of key
    band = (ids % 2).astype(np.float64)
    lon[hot] = LON0 + lon_u[hot] * (LON1 - LON0)
    lat[hot] = LAT0 + band[hot] * band_h + lat_u[hot] * band_h
    lon[cold] = LON0 + lon_u[cold] * (LON1 - LON0)
    lat[cold] = LAT0 + 2 * band_h + lat_u[cold] * band_h
    # ocean: east of the box
    lon[ocean] = LON1 + 0.5 + lon_u[ocean]
    lat[ocean] = LAT0 + lat_u[ocean] * (LAT1 - LAT0)
    return lon, lat


def expected_admin_code(
    lons: np.ndarray, lats: np.ndarray
) -> np.ndarray:
    """Sequential oracle: admin_code per point (or None), straight from
    the band/slice arithmetic — independent of the join code path."""
    pdf = polygon_layer()
    out = np.full(len(lons), None, dtype=object)
    for _, row in pdf.iterrows():
        g = wkb.loads(row["geometry"])
        minx, miny, maxx, maxy = g.bounds()
        m = (
            (lons >= minx)
            & (lons <= maxx)
            & (lats >= miny)
            & (lats <= maxy)
            & (out == None)  # noqa: E711  — first match wins
        )
        out[m] = row["行政区域コード"]
    return out


def images_pdf(
    ids: np.ndarray, with_bytes: bool = True
) -> pd.DataFrame:
    """One batch of the images table (input_hint schema + lon/lat
    anchors). Called from mapInPandas; deterministic per id."""
    ids = np.asarray(ids, dtype=np.int64)
    lon, lat = anchor_lonlat(ids)
    fmts = np.where(ids % 3 == 0, "jpeg", "png")
    admin = expected_admin_code(lon, lat)
    # vectorized string building (no per-row Python format() calls);
    # pandas zfill pads to ≥8 without truncating longer ids — matches
    # f"img{i:08d}" at any scale incl. 10^12-row id spaces (np.char.zfill
    # would truncate to its width, so it is NOT used here).
    id_ser = pd.Series(ids).astype("string")
    image_ids = ("img" + id_ser.str.zfill(8)).to_numpy(dtype=object)
    admin_str = np.where(admin == None, "ocean", admin)  # noqa: E711
    captions = (
        "caption " + id_ser + " " + pd.Series(admin_str, dtype="string")
    ).to_numpy(dtype=object)
    if with_bytes:
        blobs, ws, hs, phashes = [], [], [], []
        for i, fmt in zip(ids, fmts):
            h = 8 + int(i % 9)
            w = 8 + int((i * 3) % 9)
            arr = imagecodec.make_test_image(int(i), h, w)
            buf = imagecodec.encode_image(arr, str(fmt))
            blobs.append(buf)
            ws.append(w)
            hs.append(h)
            phashes.append(
                imagecodec.phash64(imagecodec.decode_image(buf, str(fmt)))
            )
    else:
        blobs = [b""] * len(ids)
        ws = (8 + (ids * 3) % 9).tolist()
        hs = (8 + ids % 9).tolist()
        phashes = (((ids * _MIX) % (1 << 63))).tolist()
    return pd.DataFrame(
        {
            "image_id": image_ids,
            "bytes": blobs,
            "w": np.asarray(ws, dtype=np.int32),
            "h": np.asarray(hs, dtype=np.int32),
            "fmt": fmts,
            "caption": captions,
            "phash": np.asarray(phashes, dtype=np.int64),
            "lon": lon,
            "lat": lat,
        }
    )


IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon double, lat double"
)


def images_df(spark, n: int, with_bytes: bool = True, partitions: int | None = None):
    """Distributed deterministic images table as a Spark DataFrame."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)

    def gen(batches):
        for pdf in batches:
            yield images_pdf(pdf["id"].to_numpy(), with_bytes=with_bytes)

    return rng.mapInPandas(gen, schema=IMAGES_SCHEMA)
