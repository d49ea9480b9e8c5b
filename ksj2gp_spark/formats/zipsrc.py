"""ZIP-of-shapefile source: member listing, metadata probe, bundle
extraction with encoding + CRS detection.

Behavioral spec: /root/reference/rust/src/lib.rs:23-48 (list/probe) and
/root/reference/rust/src/zip_reader.rs:11-183 (member validation,
encoding + CRS heuristics). Runs inside the ingest pandas UDF — one ZIP
is parsed entirely in memory on an executor.
"""

from __future__ import annotations

import io
import zipfile
from dataclasses import dataclass

from ..ksj import (
    decode_cp437cp932_to_utf8,
    encode_utf8_to_cp437cp932,
    guess_crs,
    guess_encoding,
)


class ZipSourceError(ValueError):
    pass


def _member_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """{utf8-repaired name: raw name in archive}. Python's zipfile
    decodes non-UTF8-flagged names as CP437, same as the Rust zip crate."""
    out = {}
    for info in zf.infolist():
        out[decode_cp437cp932_to_utf8(info.filename)] = info.filename
    return out


def _zip_ctx(src: "bytes | zipfile.ZipFile"):
    """Context manager over either raw archive bytes or an already-open
    ZipFile. A caller-owned ZipFile is NOT closed on exit — the
    member-parallel ingest path opens one handle per archive (a ranged
    central-directory read on remote filesystems) and lists under it."""
    if isinstance(src, zipfile.ZipFile):
        import contextlib

        return contextlib.nullcontext(src)
    return zipfile.ZipFile(io.BytesIO(src))


def list_shp_files(zip_src: "bytes | zipfile.ZipFile") -> list[str]:
    """UTF-8 names of all .shp members (lib.rs:23-35)."""
    with _zip_ctx(zip_src) as zf:
        return [n for n in _member_names(zf) if n.endswith(".shp")]


def list_gml_files(zip_src: "bytes | zipfile.ZipFile") -> list[str]:
    """UTF-8 names of the JPGIS-GML members: ``.gml`` plus non-KS-META
    ``.xml``. (The reference lists only .shp members, lib.rs:23-35 —
    the GML lane is graft capability; see formats/gml.py.)"""
    with _zip_ctx(zip_src) as zf:
        out = []
        for n in _member_names(zf):
            base = n.rsplit("/", 1)[-1]
            if base.startswith("KS-META"):
                continue
            if n.endswith(".gml") or n.endswith(".xml"):
                out.append(n)
        return out


# Largest decompressed member we will extract. Real KSJ members are
# single-digit-MB; a hostile ZIP can declare a tiny compressed stream
# that inflates to GBs (zip bomb) and take the executor down with it.
# zipfile truncates decompression at the declared file_size, so capping
# the declaration caps the allocation.
MAX_MEMBER_BYTES = 512 * 1024 * 1024


def read_member(
    zip_bytes: bytes, name_utf8: str, max_bytes: int = MAX_MEMBER_BYTES
) -> bytes:
    """Read one member by its UTF-8-repaired name."""
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
        names = _member_names(zf)
        raw = names.get(name_utf8)
        if raw is None:
            raise ZipSourceError(f"member {name_utf8!r} not in ZIP")
        declared = zf.getinfo(raw).file_size
        if declared > max_bytes:
            raise ZipSourceError(
                f"member {name_utf8!r} declares {declared} decompressed "
                f"bytes (cap {max_bytes}); refusing zip-bomb-sized member"
            )
        return zf.read(raw)


def find_meta_xml(zip_bytes: bytes) -> str | None:
    """First member whose basename starts with KS-META (lib.rs:37-48)."""
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
        for name in _member_names(zf):
            base = name.rsplit("/", 1)[-1]
            if base.startswith("KS-META"):
                return name
    return None


@dataclass
class ShapefileBundle:
    """All bytes + detected properties for one .shp inside a ZIP."""

    shp_name: str
    shp: bytes
    dbf: bytes
    shx: bytes | None
    crs: str
    encoding: str
    dbt: bytes | None = None  # memo sidecar for dBASE 'M' fields


def read_bundle(zip_bytes: bytes, target_shp: str) -> ShapefileBundle:
    """Extract one shapefile bundle, applying the reference's member
    validation (zip_reader.rs:43-51), encoding (:143-183) and CRS
    (:103-140) heuristics."""
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
        names = _member_names(zf)

        def raw(name_utf8: str) -> str | None:
            if name_utf8 in names:
                return names[name_utf8]
            # also accept the CP437-mangled spelling directly
            try:
                mangled = encode_utf8_to_cp437cp932(name_utf8)
            except Exception:
                return None
            return mangled if mangled in zf.namelist() else None

        stem = target_shp[:-4]
        shp_raw = raw(target_shp)
        dbf_raw = raw(stem + ".dbf")
        shx_raw = raw(stem + ".shx")
        if shp_raw is None or dbf_raw is None:
            missing = [
                n
                for n, r in [(target_shp, shp_raw), (stem + ".dbf", dbf_raw)]
                if r is None
            ]
            raise ZipSourceError(f"ZIP is missing members: {missing}")

        def bounded(name: str) -> bytes:
            declared = zf.getinfo(name).file_size
            if declared > MAX_MEMBER_BYTES:
                raise ZipSourceError(
                    f"member {name!r} declares {declared} decompressed "
                    f"bytes (cap {MAX_MEMBER_BYTES}); refusing "
                    f"zip-bomb-sized member"
                )
            return zf.read(name)

        shp_bytes = bounded(shp_raw)
        dbf_bytes = bounded(dbf_raw)
        shx_bytes = bounded(shx_raw) if shx_raw else None
        dbt_raw = raw(stem + ".dbt")
        dbt_bytes = bounded(dbt_raw) if dbt_raw else None

        prj_raw = raw(stem + ".prj")
        prj_wkt = (
            zf.read(prj_raw).decode("utf-8", "replace") if prj_raw else None
        )
        meta_name = find_meta_xml(zip_bytes)
        meta_content = None
        if meta_name is not None:
            # KS-META XML is Shift_JIS (zip_reader.rs:122-131)
            meta_content = zf.read(names[meta_name]).decode("cp932", "replace")
        crs = guess_crs(prj_wkt, meta_content)

        cpg_raw = raw(stem + ".cpg")
        cpg = zf.read(cpg_raw).decode("ascii", "replace") if cpg_raw else None
        encoding = guess_encoding(dbf_bytes[:32], cpg, target_shp)

        return ShapefileBundle(
            shp_name=target_shp,
            shp=shp_bytes,
            dbf=dbf_bytes,
            shx=shx_bytes,
            crs=crs,
            encoding=encoding,
            dbt=dbt_bytes,
        )
