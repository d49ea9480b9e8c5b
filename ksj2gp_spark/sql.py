"""SQL surface: register the engine's vectorized kernels as Spark SQL
functions so every cell scheme and transform is usable from
``spark.sql(...)`` as well as the DataFrame API.

All functions are Arrow-batched pandas UDFs over the same numpy
kernels the operators use — registration adds a name, not a new code
path, so SQL and DataFrame results are identical by construction.

    from ksj2gp_spark.sql import register_sql_functions
    register_sql_functions(spark)
    spark.sql("SELECT image_id, hex_cell(lon, lat, 7) AS cell FROM imgs")
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def _cell_udf(fn):
    @pandas_udf("long")
    def udf(lon: pd.Series, lat: pd.Series, res: pd.Series) -> pd.Series:
        r = int(res.iloc[0]) if len(res) else 0
        return pd.Series(
            fn(
                lon.to_numpy(dtype=np.float64),
                lat.to_numpy(dtype=np.float64),
                r,
            )
        )

    return udf


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register all engine SQL functions; returns their names."""
    from .geo import grid, hexgrid, s2, transform

    spark.udf.register("grid_cell", _cell_udf(grid.latlng_to_cell))
    spark.udf.register("hex_cell", _cell_udf(hexgrid.latlng_to_cell))
    spark.udf.register("s2_cell", _cell_udf(s2.latlng_to_cell))

    @pandas_udf("double")
    def tokyo_to_wgs84_lon(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo, _, _ = transform.tokyo_to_wgs84(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64)
        )
        return pd.Series(lo)

    @pandas_udf("double")
    def tokyo_to_wgs84_lat(lon: pd.Series, lat: pd.Series) -> pd.Series:
        _, la, _ = transform.tokyo_to_wgs84(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64)
        )
        return pd.Series(la)

    spark.udf.register("tokyo_to_wgs84_lon", tokyo_to_wgs84_lon)
    spark.udf.register("tokyo_to_wgs84_lat", tokyo_to_wgs84_lat)

    @pandas_udf("string")
    def ksj_colname(col_id: pd.Series, ksj_id: pd.Series, year: pd.Series) -> pd.Series:
        from .ksj import colnames
        from .ksj.colnames import TranslateOptions

        out = []
        for c, k, y in zip(col_id, ksj_id, year):
            opts = TranslateOptions(
                ksj_id=str(k), year=int(y), ignore_translation_errors=True
            )
            out.append(colnames.translate_colnames(str(c), opts))
        return pd.Series(out)

    spark.udf.register("ksj_colname", ksj_colname)
    return [
        "grid_cell",
        "hex_cell",
        "s2_cell",
        "tokyo_to_wgs84_lon",
        "tokyo_to_wgs84_lat",
        "ksj_colname",
    ]
