"""KSJ ZIP → polygons DataFrame ingestion (SURVEY.md §2.1 S1-S4, §3.3).

Spark shape: ``spark.read.format("binaryFile").load("*.zip")`` →
``mapInPandas`` partition that parses each ZIP fully in executor memory
(zipsrc + shp + dbf kernels), applies CRS/encoding detection, KSJ id
extraction, colname + codelist translation, and emits one row per
feature with WKB geometry. Failed ZIPs go to an error lane column
instead of failing the job.

Attribute values are emitted as a map<string,string> (post-translation
everything is label text; the reference also retypes codelist columns
to utf8, builder.rs:272-285). A typed-schema variant can pivot the map
out per dataset at plan time.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..formats import dbf as dbf_mod
from ..formats import shp as shp_mod
from ..formats import zipsrc
from ..geo import wkb
from ..ksj import TranslateOptions, extract_ksj_id, translate_colnames
from ..ksj.codelists import get_codelist_map, translate_value

INGEST_SCHEMA = (
    "zip_path string, ksj_id string, year int, shp_name string, "
    "feature_idx long, crs string, geometry binary, geom_type string, "
    "attrs map<string,string>, error string"
)


def parse_zip_bytes(
    zip_path: str,
    zip_bytes: bytes,
    translate: bool = True,
    ignore_translation_errors: bool = True,
    target_shp: str | None = None,
) -> pd.DataFrame:
    """Parse one KSJ ZIP into feature rows (pure Python, UDF-usable).

    ``target_shp`` restricts a multi-layer ZIP to one ``.shp`` member —
    the reference's candidate-selection workflow (the web UI prompts
    when >1, worker.ts:49-60; the CLI takes the first, main.rs:38).
    Default: convert every member (a distributed job has no reason to
    drop the rest).

    Quarantine granularity is the MEMBER: a corrupt layer emits one
    error row (``shp_name`` = that member, ``feature_idx`` = -1) and
    the remaining layers still convert — a whole-archive try would
    silently drop every layer after the bad one, and would make the
    per-archive and per-member ingestion routes disagree on mixed-
    health bundles (the auto router must be free to pick either).
    Archive-level failures (unreadable ZIP, no ``.shp`` member,
    missing ``target_shp``) emit one row with ``shp_name`` empty."""
    filename = os.path.basename(zip_path)
    try:
        ksj_id, year = extract_ksj_id(filename)
    except Exception:
        ksj_id, year = "", 0
    rows = []
    try:
        shp_names = zipsrc.list_shp_files(zip_bytes)
        if not shp_names:
            raise zipsrc.ZipSourceError("no .shp member in ZIP")
        if target_shp is not None:
            if target_shp not in shp_names:
                raise zipsrc.ZipSourceError(
                    f"target_shp {target_shp!r} not in ZIP (members: {shp_names})"
                )
            shp_names = [target_shp]
    except Exception as e:
        rows.append(
            _row(
                zip_path, ksj_id, year, "", -1, "", None, "",
                {}, f"{type(e).__name__}: {e}",
            )
        )
        return pd.DataFrame(rows)
    for shp_name in shp_names:
        try:
            bundle = zipsrc.read_bundle(zip_bytes, shp_name)
            opts = TranslateOptions(
                translate_colnames=translate,
                translate_contents=translate,
                ignore_translation_errors=ignore_translation_errors,
                ksj_id=ksj_id,
                year=year,
                target_shp=shp_name,
            )
            geoms = shp_mod.read_shp(bundle.shp)
            fields, recs = dbf_mod.read_dbf(
                bundle.dbf, bundle.encoding, memo=bundle.dbt
            )
            colnames = [translate_colnames(f.name, opts) for f in fields]
            codelists = [
                get_codelist_map(f.name, year, shp_name)
                if translate
                else None
                for f in fields
            ]
            member_rows = []
            for idx, (g, rec) in enumerate(zip(geoms, recs)):
                if g is None:
                    member_rows.append(
                        _row(
                            zip_path, ksj_id, year, shp_name, idx,
                            bundle.crs, None, "NullShape", {},
                            "NullShape rejected",
                        )
                    )
                    continue
                attrs = {}
                for name, cl, value in zip(colnames, codelists, rec):
                    v = translate_value(value, cl)
                    attrs[name] = None if v is None else str(v)
                member_rows.append(
                    _row(
                        zip_path, ksj_id, year, shp_name, idx, bundle.crs,
                        wkb.dumps(g), g.name, attrs, None,
                    )
                )
        except Exception as e:
            rows.append(
                _row(
                    zip_path, ksj_id, year, shp_name, -1, "", None, "",
                    {}, f"{type(e).__name__}: {e}",
                )
            )
            continue
        rows.extend(member_rows)
    return pd.DataFrame(rows)


def parse_gml_zip_bytes(
    zip_path: str,
    zip_bytes: bytes,
    translate: bool = True,
    target_member: str | None = None,
) -> pd.DataFrame:
    """Parse the JPGIS-GML members of a KSJ ZIP into the SAME feature
    rows as the shapefile lane (INGEST_SCHEMA) — graft capability
    beyond the reference (which reads only .shp members, lib.rs:23-35;
    the north_star names "Shapefile/GML" ingest).

    Attribute names are the GML localnames (self-describing English,
    e.g. ``administrativeAreaCode``); coded values are translated
    through the shared codelist registry via their ``codeSpace``
    attribute, with the reference's pass-through-on-miss semantics."""
    from ..formats import gml as gml_mod

    filename = os.path.basename(zip_path)
    try:
        ksj_id, year = extract_ksj_id(filename)
    except Exception:
        ksj_id, year = "", 0
    rows = []
    try:
        members = zipsrc.list_gml_files(zip_bytes)
        if target_member is not None:
            if target_member not in members:
                raise zipsrc.ZipSourceError(
                    f"target member {target_member!r} not in ZIP "
                    f"(members: {members})"
                )
            members = [target_member]
        if not members:
            raise zipsrc.ZipSourceError("no GML member in ZIP")
    except Exception as e:
        rows.append(
            _row(
                zip_path, ksj_id, year, "", -1, "", None, "",
                {}, f"{type(e).__name__}: {e}",
            )
        )
        return pd.DataFrame(rows)
    for member in members:
        # Quarantine granularity is the MEMBER (matches the shapefile
        # lane): each member parses independently, so the per-archive
        # and per-member ingestion routes emit identical rows for any
        # mix of healthy / malformed / feature-less members.
        n_before = len(rows)
        try:
            buf = zipsrc.read_member(zip_bytes, member)
            features, crs = gml_mod.read_gml(buf)
        except Exception as e:
            rows.append(
                _row(
                    zip_path, ksj_id, year, member, -1, "", None, "",
                    {}, f"{type(e).__name__}: {e}",
                )
            )
            continue
        for idx, (ftype, raw_attrs, geom) in enumerate(features):
            attrs = {"featureType": ftype}
            for name, (text, codespace) in raw_attrs.items():
                if text is not None and translate:
                    cl = gml_mod.codelist_for_codespace(codespace)
                    if cl is not None:
                        text = cl.get(text, text)
                attrs[name] = text
            if geom is None:
                rows.append(
                    _row(
                        zip_path, ksj_id, year, member, idx, crs,
                        None, "", attrs, "feature without geometry",
                    )
                )
                continue
            rows.append(
                _row(
                    zip_path, ksj_id, year, member, idx, crs,
                    wkb.dumps(geom), geom.name, attrs, None,
                )
            )
        if len(rows) == n_before:
            # valid XML, zero features: loud per-member quarantine
            # rather than silent zero rows
            rows.append(
                _row(
                    zip_path, ksj_id, year, member, -1, "", None, "",
                    {}, "GML member contains no features",
                )
            )
    return pd.DataFrame(rows)


def _row(zip_path, ksj_id, year, shp_name, idx, crs, geometry, gtype, attrs, err):
    return {
        "zip_path": zip_path,
        "ksj_id": ksj_id,
        "year": year,
        "shp_name": shp_name,
        "feature_idx": idx,
        "crs": crs,
        "geometry": geometry,
        "geom_type": gtype,
        "attrs": attrs,
        "error": err,
    }


def ingest_zips(
    spark: SparkSession,
    path: str,
    translate: bool = True,
    target_shp: str | None = None,
    source: str = "shp",
) -> DataFrame:
    """Distributed ingestion: binaryFile scan → per-ZIP parse UDF.

    ``source``: "shp" (reference parity — shapefile members), "gml"
    (JPGIS-GML members), or "auto" (shapefile members when the ZIP has
    any, else GML — one lane per ZIP, never both, so a bundle shipping
    both representations is not double-ingested)."""
    if source not in ("shp", "gml", "auto"):
        raise ValueError(f"source must be shp|gml|auto, got {source!r}")
    raw = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                lane = source
                if lane == "auto":
                    lane = "shp" if zipsrc.list_shp_files(b) else "gml"
                if lane == "shp":
                    yield parse_zip_bytes(
                        p, b, translate=translate, target_shp=target_shp
                    )
                else:
                    yield parse_gml_zip_bytes(p, b, translate=translate)

    return raw.select("path", "content").mapInPandas(parse, schema=INGEST_SCHEMA)


def _open_zip_uri(uri: str):
    """Seekable reader for a Spark file URI. ``file:`` URIs (and bare
    paths) open locally; any other scheme goes through ``pyarrow.fs``
    (S3/HDFS/GCS), whose readers serve ranged reads — so a listing
    touches only the ZIP central directory, not the whole archive."""
    if uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return open(unquote(urlparse(uri).path), "rb")
    if "://" not in uri:
        return open(uri, "rb")
    from pyarrow import fs as pafs

    fsys, p = pafs.FileSystem.from_uri(_pyarrow_uri(uri))
    return fsys.open_input_file(p)


def _pyarrow_uri(uri: str) -> str:
    """Translate Hadoop scheme aliases to the names pyarrow.fs
    recognizes (s3a/s3n → s3): Spark's binaryFile paths carry the
    Hadoop spelling, and without the translation the member-parallel
    route would quarantine every archive with ArrowInvalid while the
    per-archive route reads the same URIs fine."""
    for alias, canon in (("s3a://", "s3://"), ("s3n://", "s3://")):
        if uri.startswith(alias):
            return canon + uri[len(alias):]
    return uri


def list_zip_members(
    spark: SparkSession,
    path: str,
    source: str = "shp",
    target_shp: str | None = None,
) -> DataFrame:
    """Distributed member listing: one output row per (ZIP, member)
    that ingestion would parse — ``(path, member, lane, err)``. ZIPs
    that fail to list (bad archive, no member of the lane, missing
    ``target_shp``) emit one row with ``err`` set, carrying the same
    message the per-ZIP parse kernels raise, so downstream error rows
    stay byte-identical to :func:`ingest_zips`. Listing opens each
    archive's central directory only (no member decompression)."""
    if source not in ("shp", "gml", "auto"):
        raise ValueError(f"source must be shp|gml|auto, got {source!r}")
    import zipfile as _zipfile

    paths = spark.read.format("binaryFile").load(path).select("path")

    def list_members(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                try:
                    with _open_zip_uri(p) as fh, _zipfile.ZipFile(fh) as zf:
                        lane = source
                        # the shp listing decodes every member name —
                        # skip it when the caller pinned the gml lane
                        shp_names = (
                            zipsrc.list_shp_files(zf)
                            if lane != "gml"
                            else []
                        )
                        if lane == "auto":
                            lane = "shp" if shp_names else "gml"
                        if lane == "shp":
                            members = shp_names
                            if not members:
                                raise zipsrc.ZipSourceError(
                                    "no .shp member in ZIP"
                                )
                            if target_shp is not None:
                                if target_shp not in members:
                                    raise zipsrc.ZipSourceError(
                                        f"target_shp {target_shp!r} not in "
                                        f"ZIP (members: {members})"
                                    )
                                members = [target_shp]
                        else:
                            members = zipsrc.list_gml_files(zf)
                            if not members:
                                raise zipsrc.ZipSourceError(
                                    "no GML member in ZIP"
                                )
                    rows += [(p, m, lane, None) for m in members]
                except Exception as e:  # noqa: BLE001 — error lane
                    rows.append((p, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows, columns=["path", "member", "lane", "err"]
            )

    return paths.mapInPandas(
        list_members, schema="path string, member string, lane string, err string"
    )


def ingest_zip_members(
    spark: SparkSession,
    path: str,
    translate: bool = True,
    source: str = "shp",
    target_shp: str | None = None,
    _listing: DataFrame | None = None,
) -> DataFrame:
    """Member-parallel ingestion — same rows as :func:`ingest_zips`,
    different unit of work.

    ``ingest_zips``'s task granularity is one ZIP, so a single
    multi-layer bundle (e.g. one archive holding 50 prefecture .shp
    layers) serializes into one straggler task while the rest of the
    cluster idles. This variant runs :func:`list_zip_members` first
    (central-directory reads only), hash-repartitions the exploded
    (ZIP, member) rows across the cluster, and each task parses ONE
    member through the very same tested kernels (`parse_zip_bytes` /
    `parse_gml_zip_bytes` with the member restriction) — intra-ZIP
    skew is bounded by the largest member, not the largest bundle.

    Cost trade, stated plainly: a member task re-reads its archive's
    compressed bytes from storage (one archive cached per task at a
    time), so a ZIP with M members costs up to M× its compressed size
    in reads. Parse time dominates compressed-byte reads for every KSJ
    format, and on object stores the reads are ranged — use this path
    when bundles are member-heavy or member-skewed, `ingest_zips` when
    archives are small and uniform.

    Partitioning: the exploded rows are (path, member) STRINGS — a few
    hundred bytes for hours of downstream parse work — so AQE's
    size-based coalescing would fold a column-hash repartition of them
    into ONE post-shuffle partition and silently serialize the whole
    point of this variant (measured: 16 members → 1 task → zero 4→16
    core speedup). Round-robin with an EXPLICIT partition count is
    immune to coalescing and count-balanced; sortWithinPartitions then
    re-groups any same-archive rows that landed together so the
    one-archive-per-task cache still amortizes."""
    n_parts = max(
        spark.sparkContext.defaultParallelism * 2,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    listing = (
        _listing
        if _listing is not None
        else list_zip_members(spark, path, source=source, target_shp=target_shp)
    )
    spread = listing.repartition(n_parts).sortWithinPartitions(
        "path", "member"
    )

    def parse_one(batches):
        cache: dict[str, bytes] = {}

        def zip_bytes_of(p: str) -> bytes:
            if p not in cache:
                cache.clear()  # hold at most one archive per worker
                with _open_zip_uri(p) as fh:
                    cache[p] = fh.read()
            return cache[p]

        for pdf in batches:
            for p, m, lane, err in zip(
                pdf["path"], pdf["member"], pdf["lane"], pdf["err"]
            ):
                if isinstance(err, str) and err:
                    try:
                        ksj_id, year = extract_ksj_id(os.path.basename(p))
                    except Exception:
                        ksj_id, year = "", 0
                    yield pd.DataFrame(
                        [_row(p, ksj_id, year, "", -1, "", None, "", {}, err)]
                    )
                elif lane == "shp":
                    yield parse_zip_bytes(
                        p, zip_bytes_of(p), translate=translate, target_shp=m
                    )
                else:
                    yield parse_gml_zip_bytes(
                        p, zip_bytes_of(p), translate=translate, target_member=m
                    )

    return spread.mapInPandas(parse_one, schema=INGEST_SCHEMA)


def _auto_ingest_strategy(
    spark: SparkSession,
    path: str,
    source: str = "shp",
    target_shp: str | None = None,
    min_parallelism: int | None = None,
) -> tuple[str, DataFrame | None]:
    """Pick "zip" (per-archive) or "member" (per-member) for a source
    glob — the routing brain of :func:`ingest_zips_auto`. Returns
    ``(strategy, listing)`` where ``listing`` is the persisted member
    listing when the central-directory scan ran (so the member route
    reuses it instead of re-opening every archive), else None.

    Per-member parallelism costs a listing pass plus compressed
    re-reads and buys a skew bound of max-MEMBER instead of
    max-ARCHIVE. It can only matter when the archives alone under-fill
    the cluster, so the probe short-circuits: a ``limit(par+1)`` count
    on the binaryFile path listing (file metadata only — no ZIP is
    opened) settles the common many-archives case for free, and only
    an under-filled listing pays the central-directory scan to see
    whether any archive actually holds multiple members."""
    par = (
        min_parallelism
        if min_parallelism is not None
        else spark.sparkContext.defaultParallelism
    )
    n_arch = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path")
        .limit(par + 1)
        .count()
    )
    if n_arch > par:
        return "zip", None  # archives already fill the cluster
    # materialize the listing to the driver: it is bounded by
    # construction (this branch only runs for <= par archives, and a
    # central directory is (path, member) strings — bytes, not data),
    # and a local relation both reuses the scan on the member route
    # (LocalTableScan, no archive re-opened) and leaves nothing
    # persisted behind (a .persist() here had no owner to unpersist it
    # once the member route's lazy frame escaped to the caller)
    listing = list_zip_members(
        spark, path, source=source, target_shp=target_shp
    )
    rows = listing.collect()
    n_arch = len({r["path"] for r in rows})
    n_members = sum(r["member"] is not None for r in rows)
    if n_members > n_arch:  # at least one multi-member bundle
        return "member", spark.createDataFrame(rows, listing.schema)
    return "zip", None


def ingest_zips_auto(
    spark: SparkSession,
    path: str,
    translate: bool = True,
    source: str = "shp",
    target_shp: str | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Strategy-free ingestion: probe the source, then route between
    :func:`ingest_zips` (per-archive tasks) and
    :func:`ingest_zip_members` (per-member tasks) — the same
    auto-routing posture as ``pipeline.spatial_join``'s big-layer
    switch, so neither skew knob is manual. Row sets and error rows
    are identical on both routes (pinned by tests); only task
    granularity differs. See :func:`_auto_ingest_strategy` for the
    routing rule and its probe costs."""
    strategy, listing = _auto_ingest_strategy(
        spark, path, source=source, target_shp=target_shp,
        min_parallelism=min_parallelism,
    )
    if strategy == "member":
        return ingest_zip_members(
            spark, path, translate=translate, source=source,
            target_shp=target_shp, _listing=listing,
        )
    return ingest_zips(
        spark, path, translate=translate, source=source,
        target_shp=target_shp,
    )


def polygons_from_ingest(
    ingested: DataFrame, admin_code_attr: str = "行政区域コード"
) -> DataFrame:
    """Project the ingest frame into the spatial-join polygon layer
    shape (polygon_id, admin_code, geometry, crs)."""
    from pyspark.sql import functions as F

    return (
        ingested.filter(F.col("error").isNull())
        .select(
            F.concat_ws(
                "_", F.col("ksj_id"), F.col("shp_name"), F.col("feature_idx")
            ).alias("polygon_id"),
            F.col("attrs").getItem(admin_code_attr).alias("行政区域コード"),
            F.col("geometry"),
            F.col("crs"),
        )
    )
