"""CLI conversion entry point — the Spark equivalent of ksj2gp-cli
(/root/reference/rust/ksj2gp-cli/src/main.rs:9-79):

    spark-submit --py-files ksj2gp_spark.zip -m ksj2gp_spark.convert \\
        <input.zip or glob> <output path>

* output format from the output extension/suffix (main.rs:38-47):
  ``.parquet`` → GeoParquet-style parquet with bbox covering;
  ``.geojson`` → GeoJSON feature lines (reprojected to WGS84, matching
  the reference's GeoJSON-only transform rule); ``.gpkg`` → GeoPackage
  (single-file SQLite export, collected driver-side like the
  reference's single-threaded writer).
* converts every ``.shp`` in each ZIP (the reference CLI takes the
  first; a Spark job has no reason to drop the rest).
* translations hardcoded on, like the reference CLI (main.rs:59-63).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, functions as F


def convert(
    spark: SparkSession,
    zip_path: str,
    out_path: str,
    target_shp: str | None = None,
) -> int:
    from .operators import ingest

    # auto-routed: the CLI's common shape is ONE archive (reference
    # parity), which is exactly the per-archive path's straggler case
    # when the bundle is multi-layer — the probe routes it per-member
    ingested = ingest.ingest_zips_auto(
        spark, zip_path, translate=True, target_shp=target_shp
    ).cache()
    try:
        return _convert_cached(ingested, out_path)
    finally:
        # the cache only spans this conversion — a long-lived session
        # (driver service converting many ZIPs) must not accumulate
        # cached ingest frames
        ingested.unpersist()


def _convert_cached(ingested, out_path: str) -> int:
    from .sinks import geoparquet

    errors = ingested.filter(F.col("error").isNotNull())
    n_err = errors.count()
    if n_err:
        for r in errors.select("zip_path", "error").limit(20).collect():
            print(f"ERROR {r['zip_path']}: {r['error']}", file=sys.stderr)
    good = ingested.filter(F.col("error").isNull())
    n = good.count()

    if out_path.endswith(".geojson"):
        crs = good.select("crs").first()
        df = good.select(
            "ksj_id", "shp_name", "feature_idx", "geometry", "crs"
        )
        geoparquet.write_geojson(df, out_path)
        del crs
    elif out_path.endswith(".gpkg"):
        import pandas as pd

        from .sinks import gpkg

        crs_row = good.select("crs").first()
        pdf = good.select("attrs", "geometry").toPandas()
        # one typed column per dBASE field, like the reference's layer
        attrs = pd.DataFrame(list(pdf["attrs"]))
        pdf = pd.concat([attrs, pdf[["geometry"]]], axis=1)
        gpkg.write_gpkg(
            pdf,
            out_path,
            layer="layer1",
            crs_name=crs_row["crs"] if crs_row else "JGD2011",
        )
    else:
        crs_row = good.select("crs").first()
        geoparquet.write_geoparquet(
            good.drop("error"),
            out_path,
            crs_name=crs_row["crs"] if crs_row else "JGD2011",
        )
    return n


def main(argv: list[str]) -> int:
    if len(argv) not in (2, 3):
        print(
            "usage: python -m ksj2gp_spark.convert <input.zip|glob> <out> "
            "[target_shp]",
            file=sys.stderr,
        )
        return 2
    spark = (
        SparkSession.builder.appName("ksj2gp-convert")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    n = convert(spark, argv[0], argv[1], argv[2] if len(argv) == 3 else None)
    print(f"converted {n} features -> {argv[1]}")
    spark.stop()
    return 0 if n > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
