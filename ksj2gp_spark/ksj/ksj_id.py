"""KSJ dataset-id + year extraction from ZIP filenames.

Behavioral spec: /root/reference/rust/src/translate/ksj_id.rs:12-87
(130-case golden table at ksj_id.rs:101-235 is ported to
tests/test_ksj_id.py). Re-implemented from scratch in Python.

Rules:
* mesh files have fixed prefixes handled before the generic regex
* N03 years span >100 years, so 2-digit years pivot at 20 (>=20 → 1900s)
* generic 2-digit years pivot at 40 (>=40 → 1900s)
* a handful of raw ids are normalized (``m1000``→``mesh1000`` etc.)
"""

from __future__ import annotations

import re

_RE = re.compile(
    r"([A-Z][0-9]{2}[a-z]?[0-9]?(?:-[a-z12])?(?:-[cu])?|m1000|m500)-([0-9]{2})"
)

_MESH_PREFIXES = (
    ("1km_mesh_suikei_2018", ("mesh1000h30", 2018)),
    ("1km_mesh_2024", ("mesh1000r6", 2024)),
    ("500m_mesh_suikei_2018", ("mesh500h30", 2018)),
    ("500m_mesh_2024", ("mesh500r6", 2018)),
    ("250m_mesh_2024", ("mesh250r6", 2018)),
)

_ID_FIXUPS = {
    "m1000": "mesh1000",
    "m500": "mesh500",
    "A18s-a": "A18s_a",
    "A19s-a": "A19s",
    "G04-a": "G04a",
    "G04-c": "G04c",
    "G04-d": "G04d",
}


class KsjIdError(ValueError):
    """Raised when a KSJ id/year cannot be derived from a filename."""


def extract_ksj_id(filename: str) -> tuple[str, int]:
    """Return ``(ksj_id, year)`` guessed from a KSJ ZIP filename."""
    for prefix, result in _MESH_PREFIXES:
        if filename.startswith(prefix):
            return result

    # N03 holds >100 years of data, so its 2-digit years use a 1920 pivot.
    if filename.startswith("N03"):
        rest = filename[4:]
        if "_" in rest:
            ymd = rest.split("_", 1)[0]
            if len(ymd) == 6:
                year_part = _parse_year(ymd[0:2])
                year = year_part + (1900 if year_part >= 20 else 2000)
            elif len(ymd) == 8:
                year = _parse_year(ymd[0:4])
            else:
                raise KsjIdError(f"Unexpected year: {ymd}")
            return "N03", year
        raise KsjIdError(f"Unexpected filename: {filename}")

    m = _RE.search(filename)
    if m is None:
        raise KsjIdError(f"Failed to detect KSJ id from filename: {filename}")
    id_raw, year_str = m.group(1), m.group(2)
    year_2digits = _parse_year(year_str)
    year = year_2digits + (1900 if year_2digits >= 40 else 2000)
    return _ID_FIXUPS.get(id_raw, id_raw), year


def _parse_year(year_str: str) -> int:
    try:
        return int(year_str)
    except ValueError as e:  # pragma: no cover - regex guarantees digits
        raise KsjIdError(f"Failed to parse year: {e}") from e
