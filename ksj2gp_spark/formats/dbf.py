"""dBASE (.dbf) reader/writer — the attribute side of a shapefile.

Behavioral spec: the reference consumes dBASE via the ``dbase`` crate
and maps field types to Arrow at /root/reference/rust/src/builder.rs:
290-318 (Numeric/Double/Currency→f64, Character/Memo→utf8, Float→f32,
Integer→i32, Logical→bool, Date→date32; DateTime decoded as an
engine extension — the reference panics on it, builder.rs:310). The
writer exists for building deterministic test fixtures only.

Memo ('M') fields resolve through the .dbt sidecar (dBASE III layout:
512-byte blocks, 0x1A-terminated text) passed as ``memo=``; without a
sidecar the cell is null. Currency ('Y') is the 8-byte LE integer
scaled by 10^-4; Double ('B') is an 8-byte IEEE double — both map to
float64 like the reference's FieldValue::Currency/Double
(builder.rs:58-60,291-293).

Field values decode to Python objects; empty numerics decode to None
(nullable columns, builder.rs:50-97).
"""

from __future__ import annotations

import datetime as _dt
import struct
from dataclasses import dataclass

__all__ = [
    "DbfError",
    "DbfField",
    "read_dbf",
    "write_dbf",
    "write_dbt",
    "read_header",
]

DBT_BLOCK_SIZE = 512  # dBASE III memo sidecar block size


class DbfError(ValueError):
    pass


@dataclass
class DbfField:
    name: str
    ftype: str  # C N F L D I (I = long integer, dBASE 7 style)
    length: int
    decimals: int = 0


def read_header(buf: bytes) -> tuple[int, int, int, int]:
    """(n_records, header_size, record_size, ldid)."""
    if len(buf) < 32:
        raise DbfError("dbf header too short")
    n_records, header_size, record_size = struct.unpack_from("<IHH", buf, 4)
    # LDID convention follows the reference: the 29th byte (index 28),
    # value 13 meaning Shift_JIS (zip_reader.rs:146-148).
    ldid = buf[28]
    return n_records, header_size, record_size, ldid


def read_fields(buf: bytes) -> list[DbfField]:
    fields = []
    pos = 32
    while pos < len(buf) and buf[pos] != 0x0D:
        raw = buf[pos : pos + 32]
        if len(raw) < 32:
            raise DbfError("truncated field descriptor")
        name = raw[:11].split(b"\x00", 1)[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        length = raw[16]
        decimals = raw[17]
        fields.append(DbfField(name, ftype, length, decimals))
        pos += 32
    return fields


def read_dbf(
    buf: bytes, encoding: str = "cp932", memo: bytes | None = None
) -> tuple[list[DbfField], list[list[object]]]:
    """Parse a .dbf file into (fields, rows). Deleted rows skipped.

    ``memo``: the .dbt sidecar bytes, resolved for 'M' fields; a memo
    reference with no sidecar decodes to None (nullable, like every
    other empty cell)."""
    n_records, header_size, record_size, _ = read_header(buf)
    if record_size < 1 or header_size < 32 or header_size > len(buf):
        raise DbfError(
            f"corrupt dbf header: header_size={header_size}, "
            f"record_size={record_size}"
        )
    fields = read_fields(buf)
    # A corrupt header may claim billions of records; the buffer bounds
    # the real count (fuzz-tested — an unbounded loop here is a DoS).
    capacity = (len(buf) - header_size) // record_size
    rows: list[list[object]] = []
    pos = header_size
    for _ in range(min(n_records, capacity)):
        rec = buf[pos : pos + record_size]
        pos += record_size
        if len(rec) < record_size or rec[0:1] == b"*":
            continue  # deleted
        off = 1
        row: list[object] = []
        for f in fields:
            raw = rec[off : off + f.length]
            off += f.length
            row.append(_decode_value(raw, f, encoding, memo))
        rows.append(row)
    return fields, rows


def _decode_value(
    raw: bytes, f: DbfField, encoding: str, memo: bytes | None = None
) -> object:
    if f.ftype == "C":
        return raw.decode(encoding, "replace").rstrip(" \x00") or None
    if f.ftype == "M":
        # Memo: the record stores a block reference into the .dbt
        # sidecar — ASCII digits (dBASE III, 10 bytes) or a LE uint32
        # (FoxPro-style 4-byte field). Reference maps Memo→Utf8
        # (builder.rs:88,294); without a sidecar the cell is null.
        if f.length == 4 and len(raw) == 4:
            block = struct.unpack("<I", raw)[0]
        else:
            text = raw.strip(b" \x00").decode("ascii", "replace")
            if not text.isdigit():
                return None
            block = int(text)
        if block == 0 or memo is None:
            return None
        return _read_dbt_block(memo, block, encoding)
    if f.ftype == "Y":
        # Currency: 8-byte LE integer, implied 4 decimal places → f64
        # (builder.rs:59 FieldValue::Currency → Float64Builder).
        if len(raw) != 8:
            return None
        return struct.unpack("<q", raw)[0] / 10000.0
    if f.ftype == "B":
        # Double: 8-byte IEEE 754 LE → f64 (builder.rs:59,291).
        if len(raw) != 8:
            return None
        return struct.unpack("<d", raw)[0]
    text = raw.strip(b" \x00*").decode("ascii", "replace")
    if f.ftype in ("N", "F"):
        if not text:
            return None
        try:
            if f.decimals == 0 and f.ftype == "N" and "." not in text:
                return int(text)
            return float(text)
        except ValueError:
            return None
    if f.ftype == "L":
        if text in ("T", "t", "Y", "y"):
            return True
        if text in ("F", "f", "N", "n"):
            return False
        return None
    if f.ftype == "D":
        if len(text) != 8:
            return None
        try:
            return _dt.date(int(text[:4]), int(text[4:6]), int(text[6:8]))
        except ValueError:
            return None
    if f.ftype == "I":
        return struct.unpack("<i", raw)[0] if len(raw) == 4 else None
    if f.ftype == "T":
        # dBASE DateTime: two LE int32 — Julian Day Number and
        # milliseconds since midnight (second precision in practice).
        # The reference panics on this type (builder.rs:310
        # unimplemented!()); decoding it is an engine extension.
        if len(raw) != 8:
            return None
        jdn, ms = struct.unpack("<ii", raw)
        if jdn == 0 and ms == 0:
            return None
        base = _dt.datetime(1970, 1, 1)  # JDN 2440588
        try:
            return base + _dt.timedelta(days=jdn - 2440588, milliseconds=ms)
        except (OverflowError, ValueError):
            # corrupt bytes can encode a day outside datetime's range
            # (year 1..9999) — quarantine the cell, don't crash the file
            return None
    raise DbfError(f"unsupported dBASE field type: {f.ftype}")


def _read_dbt_block(memo: bytes, block: int, encoding: str) -> str | None:
    """dBASE III .dbt: text starts at block*512, runs to 0x1A (field
    terminator). A reference past the sidecar's end decodes to null —
    the cell is quarantined, not the file."""
    start = block * DBT_BLOCK_SIZE
    if start >= len(memo):
        return None
    end = memo.find(b"\x1a", start)
    chunk = memo[start : end if end != -1 else len(memo)]
    return chunk.decode(encoding, "replace").rstrip(" \x00") or None


def write_dbt(texts: list[str | None], encoding: str = "cp932") -> tuple[bytes, list[int]]:
    """Build a dBASE III memo sidecar (fixture builder): returns
    (dbt_bytes, block_number per text; 0 = no memo)."""
    out = bytearray(DBT_BLOCK_SIZE)  # header block: next-free pointer
    blocks: list[int] = []
    for t in texts:
        if t is None:
            blocks.append(0)
            continue
        raw = t.encode(encoding) + b"\x1a\x1a"
        blocks.append(len(out) // DBT_BLOCK_SIZE)
        n_blocks = (len(raw) + DBT_BLOCK_SIZE - 1) // DBT_BLOCK_SIZE
        out += raw + bytes(n_blocks * DBT_BLOCK_SIZE - len(raw))
    struct.pack_into("<I", out, 0, len(out) // DBT_BLOCK_SIZE)
    out[16] = 0x03  # dBASE III version marker
    return bytes(out), blocks


def write_dbf(
    fields: list[DbfField],
    rows: list[list[object]],
    encoding: str = "cp932",
    ldid: int = 0,
) -> bytes:
    """Serialize rows to a dBASE III file (fixture builder)."""
    record_size = 1 + sum(f.length for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += bytes([0x03, 95, 7, 26])  # version + fake date
    out += struct.pack("<IHH", len(rows), header_size, record_size)
    out += bytes(16)
    out += bytes([ldid])  # index 28, matching the reference's convention
    out += bytes(3)
    assert len(out) == 32
    for f in fields:
        name = f.name.encode("ascii")[:10]
        out += name + bytes(11 - len(name))
        out += f.ftype.encode("ascii")
        out += bytes(4)
        out += bytes([f.length, f.decimals])
        out += bytes(14)
    out += b"\x0d"
    for row in rows:
        out += b" "
        for f, v in zip(fields, row):
            out += _encode_value(v, f, encoding)
    out += b"\x1a"
    return bytes(out)


def _encode_value(v: object, f: DbfField, encoding: str) -> bytes:
    if f.ftype == "C":
        raw = ("" if v is None else str(v)).encode(encoding)[: f.length]
        return raw + b" " * (f.length - len(raw))
    if f.ftype in ("N", "F"):
        if v is None:
            return b" " * f.length
        text = (
            f"{v:.{f.decimals}f}" if f.decimals else str(int(v))
        )
        raw = text.encode("ascii")[-f.length :]
        return b" " * (f.length - len(raw)) + raw
    if f.ftype == "M":
        # v is the .dbt block number from write_dbt (0/None = no memo)
        text = "" if not v else str(int(v))
        raw = text.encode("ascii")[-f.length:]
        return b" " * (f.length - len(raw)) + raw
    if f.ftype == "Y":
        if v is None:
            return bytes(8)
        return struct.pack("<q", round(float(v) * 10000.0))
    if f.ftype == "B":
        if v is None:
            return bytes(8)
        return struct.pack("<d", float(v))
    if f.ftype == "L":
        return b"?" if v is None else (b"T" if v else b"F")
    if f.ftype == "D":
        if v is None:
            return b" " * 8
        return f"{v.year:04d}{v.month:02d}{v.day:02d}".encode("ascii")
    if f.ftype == "T":
        if v is None:
            return bytes(8)
        days = (v - _dt.datetime(1970, 1, 1)).days
        midnight = v.replace(hour=0, minute=0, second=0, microsecond=0)
        ms = int((v - midnight).total_seconds() * 1000)
        return struct.pack("<ii", days + 2440588, ms)
    raise DbfError(f"unsupported dBASE field type: {f.ftype}")
