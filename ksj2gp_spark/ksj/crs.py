"""CRS detection for KSJ shapefile bundles.

Behavioral spec: /root/reference/rust/src/crs/mod.rs:41-84 and the
fallback order in /root/reference/rust/src/zip_reader.rs:103-140:
``.prj`` ESRI-WKT substring match first, then the ``KS-META-*.xml``
``referenceSystemIdentifier`` regex; error if neither matches.

Supported datums: Tokyo (EPSG:4301), JGD2000 (EPSG:4612), JGD2011
(EPSG:6668). Per the reference's documented decision, JGD2000/JGD2011
→ WGS84 is treated as identity; only Tokyo requires a datum transform
(see ksj2gp_spark.geo.transform).
"""

from __future__ import annotations

import re

TOKYO = "Tokyo"
JGD2000 = "JGD2000"
JGD2011 = "JGD2011"

EPSG = {TOKYO: 4301, JGD2000: 4612, JGD2011: 6668}


class CrsError(ValueError):
    pass


def guess_crs_from_esri_wkt(wkt: str) -> str:
    if "GCS_JGD_2011" in wkt:
        return JGD2011
    if "GCS_JGD_2000" in wkt:
        return JGD2000
    if "GCS_Tokyo" in wkt:
        return TOKYO
    raise CrsError(
        f"Failed to identify CRS from ESRI WKT in the .prj file: {wkt}"
    )


# Format per JMP2.0 metadata spec: "<datum> / <coordinate system>",
# e.g. "JGD2011 / (B, L)"; "(B, L, h)" is the 3D variant.
_META_RE = re.compile(
    r"<referenceSystemIdentifier>.*<code>\s*([^/]+) / ([^/]+?)\s*</code>"
    r".*</referenceSystemIdentifier>",
    re.MULTILINE | re.DOTALL,
)

_DATUMS = {"JGD2011": JGD2011, "JGD2000": JGD2000, "TD": TOKYO}


def guess_crs_from_meta_xml(meta_xml_content: str) -> str:
    m = _META_RE.search(meta_xml_content)
    if m is None:
        raise CrsError("Failed to identify CRS from Meta XML")
    datum, cs = m.group(1).strip(), m.group(2).strip()
    if datum in _DATUMS and cs in ("(B, L)", "(B, L, h)"):
        return _DATUMS[datum]
    raise CrsError(f"Unexpected crs: {datum}, {cs}")


def guess_crs(prj_wkt: str | None, meta_xml_content: str | None) -> str:
    """Apply the reference's fallback order: .prj first, then KS-META."""
    if prj_wkt is not None:
        try:
            return guess_crs_from_esri_wkt(prj_wkt)
        except CrsError:
            pass
    if meta_xml_content is not None:
        return guess_crs_from_meta_xml(meta_xml_content)
    raise CrsError("Failed to detect CRS from .prj or KS-META-")
