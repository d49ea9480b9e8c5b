"""Straggler probe for member-parallel ingestion.

One archive holding M GML members is the worst case for per-ZIP
ingestion: the whole bundle parses in ONE task regardless of cluster
size. This probe builds a single 16-member ZIP (5k features per
member), runs `ingest_zips` (per-ZIP) and `ingest_zip_members`
(per-member) on the same cores, and prints one JSON line with both
walls and the speedup. Also runs the member path at two parallelism
levels (4 and 16 cores) for the two-cluster-size scaling criterion.

Usage: python bench/member_ingest_probe.py
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 16 members x 20k features: one member parses in ~0.8s, the whole
# bundle in ~13s — big enough that parse dominates the ~4s of fixed
# session/listing overhead that drowned the signal at 5k/member.
N_MEMBERS = 16
N_PER = 20_000


def build_zip(tmpdir: str) -> str:
    import numpy as np

    rng = np.random.default_rng(7)
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for m in range(N_MEMBERS):
            x0 = rng.uniform(130, 140, N_PER)
            y0 = rng.uniform(33, 40, N_PER)
            parts = [
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<Dataset xmlns:gml="http://www.opengis.net/gml/3.2" '
                'xmlns:xlink="http://www.w3.org/1999/xlink" '
                'xmlns="http://nlftp.mlit.go.jp/ksj/schemas/ksj-app" '
                'gml:id="ds">'
            ]
            for i in range(N_PER):
                x, y = x0[i], y0[i]
                pl = (
                    f"{y:.6f} {x:.6f} {y:.6f} {x + 0.01:.6f} "
                    f"{y + 0.01:.6f} {x + 0.01:.6f} {y:.6f} {x:.6f}"
                )
                parts.append(
                    f'<gml:Surface gml:id="sf{i}" srsName="fguuid:jgd2011.bl">'
                    f"<gml:patches><gml:PolygonPatch><gml:exterior>"
                    f"<gml:LinearRing><gml:posList>{pl}</gml:posList>"
                    f"</gml:LinearRing></gml:exterior></gml:PolygonPatch>"
                    f"</gml:patches></gml:Surface>"
                    f'<AdministrativeBoundary gml:id="ab{i}">'
                    f'<bounds xlink:href="#sf{i}"/>'
                    f'<administrativeAreaCode codeSpace="AdminAreaCd.xml">'
                    f"13{i % 900 + 100:03d}</administrativeAreaCode>"
                    f"<name>city{i % 100}</name>"
                    f"</AdministrativeBoundary>"
                )
            parts.append("</Dataset>")
            zf.writestr(f"d/N03-2024_{m:02d}.xml", "\n".join(parts).encode())
    path = os.path.join(tmpdir, "N03-20240101_13_GML.zip")
    with open(path, "wb") as f:
        f.write(bio.getvalue())
    return path


def run(cpus: int, zip_glob: str, fn_name: str) -> float:
    from pyspark.sql import SparkSession

    from ksj2gp_spark.operators import ingest

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName(f"member-probe-{fn_name}-{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = getattr(ingest, fn_name)
    # warm (JVM + python workers + codegen), then timed
    fn(spark, zip_glob, source="gml").filter("error is null").count()
    t0 = time.time()
    n = fn(spark, zip_glob, source="gml").filter("error is null").count()
    wall = time.time() - t0
    assert n == N_MEMBERS * N_PER, n
    spark.stop()
    return wall


def main() -> None:
    import tempfile

    d = tempfile.mkdtemp(prefix="member_probe_")
    build_zip(d)
    glob = os.path.join(d, "*.zip")
    per_zip_16 = run(16, glob, "ingest_zips")
    per_member_16 = run(16, glob, "ingest_zip_members")
    per_member_4 = run(4, glob, "ingest_zip_members")
    speedup = per_member_4 / per_member_16
    print(
        json.dumps(
            {
                "n_members": N_MEMBERS,
                "n_features": N_MEMBERS * N_PER,
                "per_zip_16c_sec": round(per_zip_16, 2),
                "per_member_16c_sec": round(per_member_16, 2),
                "straggler_speedup_16c": round(per_zip_16 / per_member_16, 2),
                "per_member_4c_sec": round(per_member_4, 2),
                "core_speedup_4_to_16": round(speedup, 2),
                "core_scaling_efficiency": round(speedup / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
