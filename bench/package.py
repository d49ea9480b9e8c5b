"""Build the --py-files artifact: dist/ksj2gp_spark.zip.

Ship-and-run (north_star):

    python bench/package.py
    spark-submit --py-files dist/ksj2gp_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        your_job.py            # `import ksj2gp_spark` just works

or the built-in converter job:

    spark-submit --py-files dist/ksj2gp_spark.zip \\
        $(python -c 'import ksj2gp_spark.convert as m; print(m.__file__)') \\
        input_zips/'*.zip' out.parquet
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "ksj2gp_spark.zip")
    pkg = os.path.join(REPO, "ksj2gp_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
