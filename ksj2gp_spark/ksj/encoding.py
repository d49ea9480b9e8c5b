"""ZIP member-name encoding repair + dBASE encoding detection.

Behavioral spec: /root/reference/rust/src/encoding.rs:97-138 and
/root/reference/rust/src/zip_reader.rs:143-183. Re-implemented with
Python's stdlib codecs (``cp437``/``cp932``), which cover the same
mappings the reference carries as hand-rolled tables.

ZIP files written by Japanese tools store Shift_JIS (CP932) member
names; generic ZIP readers expose those bytes decoded as CP437. The
repair is: re-encode the mangled text as CP437 bytes, then decode as
CP932. If the text contains anything outside CP437 it is assumed to be
already-correct UTF-8 and passed through.
"""

from __future__ import annotations


class EncodingError(ValueError):
    pass


def decode_cp437cp932_to_utf8(text: str) -> str:
    """Un-mangle a CP437-decoded CP932 string; pass through real UTF-8."""
    try:
        raw = text.encode("cp437")
    except UnicodeEncodeError:
        # Characters beyond CP437 → the name was already proper UTF-8.
        return text
    try:
        return raw.decode("cp932")
    except UnicodeDecodeError as e:
        raise EncodingError("Failed to decode from CP932") from e


def encode_utf8_to_cp437cp932(text: str) -> str:
    """Inverse mapping, used to address members inside a mangled ZIP."""
    try:
        raw = text.encode("cp932")
    except UnicodeEncodeError as e:
        raise EncodingError("Failed to encode to CP932") from e
    try:
        return raw.decode("cp437")
    except UnicodeDecodeError as e:
        raise EncodingError("Failed to encode to CP437") from e


def guess_encoding(
    dbf_header: bytes, cpg_content: str | None, shp_filename: str
) -> str:
    """Guess the dBASE text encoding; returns a Python codec name.

    Priority (spec: zip_reader.rs:143-183):
    1. dBASE LDID (byte 28) == 13 → Shift_JIS
    2. ``.cpg`` file content: ``UTF-8`` or ``CP932``
    3. shp path containing "utf8" (lowercased, ``-_`` stripped) → UTF-8
    4. default Shift_JIS
    """
    if len(dbf_header) > 28 and dbf_header[28] == 13:
        return "cp932"
    if cpg_content is not None:
        if cpg_content == "UTF-8":
            return "utf-8"
        if cpg_content == "CP932":
            return "cp932"
        raise EncodingError(
            f"Unknown encoding is found in .cpg file: {cpg_content}"
        )
    if "utf8" in shp_filename.lower().replace("-", "").replace("_", ""):
        return "utf-8"
    return "cp932"
