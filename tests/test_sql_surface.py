"""SQL-function surface (ksj2gp_spark/sql.py): spark.sql results must
equal the DataFrame-API kernels by construction."""

import numpy as np

from ksj2gp_spark import fixtures
from ksj2gp_spark.operators import cells
from ksj2gp_spark.sql import register_sql_functions


def test_sql_cells_match_dataframe_api(spark):
    names = register_sql_functions(spark)
    assert "hex_cell" in names and "s2_cell" in names
    imgs = fixtures.images_df(spark, 500, with_bytes=False)
    imgs.createOrReplaceTempView("imgs_sql")
    for fn, scheme, res in (
        ("grid_cell", "grid", 10),
        ("hex_cell", "hex", 7),
        ("s2_cell", "s2", 12),
    ):
        got = (
            spark.sql(
                f"SELECT image_id, {fn}(lon, lat, {res}) AS cell FROM imgs_sql"
            )
            .toPandas()
            .sort_values("image_id")["cell"]
            .to_numpy()
        )
        want = (
            cells.with_cell(imgs, scheme, res)
            .select("image_id", "cell")
            .toPandas()
            .sort_values("image_id")["cell"]
            .to_numpy()
        )
        assert (got == want).all(), fn


def test_sql_tokyo_transform_and_colname(spark):
    register_sql_functions(spark)
    from ksj2gp_spark.geo import transform

    row = spark.sql(
        "SELECT tokyo_to_wgs84_lon(139.741357, 35.658099) AS lon, "
        "tokyo_to_wgs84_lat(139.741357, 35.658099) AS lat, "
        "ksj_colname('A03_001', 'A03', 2006) AS name"
    ).first()
    lo, la, _ = transform.tokyo_to_wgs84(
        np.array([139.741357]), np.array([35.658099])
    )
    assert abs(row["lon"] - lo[0]) < 1e-12
    assert abs(row["lat"] - la[0]) < 1e-12
    assert row["name"] and row["name"] != "A03_001"  # translated to Japanese


def test_sql_st_functions_match_kernels(spark):
    """ST_* SQL functions equal the numpy kernels they wrap."""
    register_sql_functions(spark)
    from ksj2gp_spark import fixtures
    from ksj2gp_spark.geo import geom, wkb

    layer = fixtures.polygon_layer()
    sdf = spark.createDataFrame(layer[["polygon_id", "geometry"]])
    sdf.createOrReplaceTempView("polys")
    got = (
        spark.sql(
            """SELECT polygon_id,
                      st_area(geometry)       AS area,
                      st_centroid_x(geometry) AS cx,
                      st_centroid_y(geometry) AS cy,
                      st_geomtype(geometry)   AS gt,
                      st_contains(geometry, st_centroid_x(geometry),
                                  st_centroid_y(geometry)) AS has_centroid,
                      st_distance(geometry, 0.0, 0.0) AS d0
               FROM polys"""
        )
        .toPandas()
        .set_index("polygon_id")
        .sort_index()
    )
    for pid, b in zip(layer["polygon_id"], layer["geometry"]):
        g = wkb.loads(b)
        r = got.loc[pid]
        assert abs(r["area"] - geom.geometry_area(g)) < 1e-12
        cx, cy = geom.centroid(g)
        assert abs(r["cx"] - cx) < 1e-12 and abs(r["cy"] - cy) < 1e-12
        assert r["gt"] == g.name
        want_c = bool(
            geom.geometry_contains(
                np.array([cx]), np.array([cy]), g
            )[0]
        )
        assert bool(r["has_centroid"]) == want_c
        want_d = float(
            geom.distance_to_geometry(np.array([0.0]), np.array([0.0]), g)[0]
        )
        assert abs(r["d0"] - want_d) < 1e-9

    # null geometry → null results, not a crash
    row = spark.sql(
        "SELECT st_area(CAST(NULL AS BINARY)) AS a, "
        "st_contains(CAST(NULL AS BINARY), 1.0, 2.0) AS c"
    ).first()
    assert row["a"] is None and row["c"] is None


def test_sql_st_simplify_npoints(spark):
    register_sql_functions(spark)
    import pandas as pd

    from ksj2gp_spark.geo import geom, wkb

    # square with collinear on-edge vertices + a small square hole that
    # collapses at tol=0.01
    ring = [(0, 0), (0.25, 0), (0.5, 0), (1, 0), (1, 0.5), (1, 1),
            (0.7, 1), (0, 1), (0, 0.2)]
    hole = [(0.5, 0.5), (0.503, 0.5), (0.503, 0.503), (0.5, 0.503)]
    sdf = spark.createDataFrame(
        pd.DataFrame({"gid": ["a"], "geometry": [wkb.polygon(ring, hole)]})
    )
    sdf.createOrReplaceTempView("simp")
    row = spark.sql(
        """SELECT st_npoints(geometry) AS n0,
                  st_npoints(st_simplify(geometry, 0.01)) AS n1,
                  st_area(st_simplify(geometry, 0.01)) AS a1
           FROM simp"""
    ).first()
    assert row["n0"] == 15  # 10 exterior (closed) + 5 hole
    assert row["n1"] == 5   # corners only, hole dropped
    assert abs(row["a1"] - 1.0) < 1e-12
    # kernel equivalence
    g = geom.simplify_geometry(wkb.loads(wkb.polygon(ring, hole)), 0.01)
    assert len(g.all_coords()) == row["n1"]
    # null passthrough
    r2 = spark.sql(
        "SELECT st_simplify(CAST(NULL AS BINARY), 0.1) AS s, "
        "st_npoints(CAST(NULL AS BINARY)) AS n"
    ).first()
    assert r2["s"] is None and r2["n"] is None


def test_sql_st_intersects(spark):
    register_sql_functions(spark)
    import pandas as pd

    from ksj2gp_spark.geo import wkb

    sq = lambda x0, y0, x1, y1: [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    donut = wkb.polygon(sq(0, 0, 10, 10), sq(2, 2, 8, 8))
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "name": ["overlap", "in_hole", "touch", "disjoint"],
                "a": [donut] * 4,
                "b": [
                    wkb.polygon(sq(1, 1, 3, 3)),     # crosses hole edge
                    wkb.polygon(sq(4, 4, 6, 6)),     # inside the hole
                    wkb.polygon(sq(10, 0, 12, 10)),  # shared edge
                    wkb.polygon(sq(20, 20, 21, 21)),
                ],
            }
        )
    )
    sdf.createOrReplaceTempView("pairs")
    got = {
        r["name"]: r["x"]
        for r in spark.sql(
            "SELECT name, st_intersects(a, b) AS x FROM pairs"
        ).collect()
    }
    assert got == {
        "overlap": True,
        "in_hole": False,
        "touch": True,
        "disjoint": False,
    }
    r = spark.sql(
        "SELECT st_intersects(CAST(NULL AS BINARY), CAST(NULL AS BINARY)) AS x"
    ).first()
    assert r["x"] is None
