"""Pure-Python KSJ semantics kernels (no Spark dependency).

Usable both on the driver (plan-time column renames, codelist map
selection) and inside pandas/Arrow UDFs (ingest parsing).
"""

from .codelists import format_numeric_code, get_codelist_map, translate_value
from .colnames import TranslateOptions, TranslationError, translate_colnames
from .crs import (
    CrsError,
    guess_crs,
    guess_crs_from_esri_wkt,
    guess_crs_from_meta_xml,
)
from .encoding import (
    EncodingError,
    decode_cp437cp932_to_utf8,
    encode_utf8_to_cp437cp932,
    guess_encoding,
)
from .ksj_id import KsjIdError, extract_ksj_id

__all__ = [
    "CrsError",
    "EncodingError",
    "KsjIdError",
    "TranslateOptions",
    "TranslationError",
    "decode_cp437cp932_to_utf8",
    "encode_utf8_to_cp437cp932",
    "extract_ksj_id",
    "format_numeric_code",
    "get_codelist_map",
    "guess_crs",
    "guess_crs_from_esri_wkt",
    "guess_crs_from_meta_xml",
    "guess_encoding",
    "translate_colnames",
    "translate_value",
]
