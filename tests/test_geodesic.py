"""Geodesic lane: haversine_km / trajectory_stats / dwithin_join_geo.

Everything planar in the engine answers degree-space questions (the
reference's parity surface); these operators answer metric-radius
questions on the sphere. Tests pin:

* the haversine column against a numpy reference (and the published
  Tokyo-Osaka distance), NULL propagation, antipodal clamp;
* trajectory_stats against a pandas brute force, its one-Exchange /
  zero-Python plan, and its validation surface;
* dwithin_join_geo against an all-pairs numpy brute force including
  antimeridian-wrap and near-pole (full-ring window) rows, its
  zero-Python plan, and its validation surface.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ksj2gp_spark.operators.spatial import (
    _EARTH_RADIUS_KM,
    dwithin_join_geo,
    haversine_km,
    trajectory_stats,
)


def hav_np(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = (
        np.radians(np.asarray(a, dtype=np.float64))
        for a in (lon1, lat1, lon2, lat2)
    )
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * _EARTH_RADIUS_KM * np.arcsin(np.minimum(np.sqrt(a), 1.0))


class TestHaversine:
    def test_matches_numpy_and_tokyo_osaka(self, spark):
        pairs = [
            (139.6917, 35.6895, 135.5023, 34.6937),  # Tokyo - Osaka
            (0.0, 0.0, 0.0, 0.0),
            (0.0, 0.0, 180.0, 0.0),  # antipodal on the equator
            (179.99, 12.3, -179.99, 12.3),  # antimeridian wrap
            (10.0, 89.9, -170.0, 89.9),  # across the pole
        ]
        df = spark.createDataFrame(
            pd.DataFrame(pairs, columns=["lon1", "lat1", "lon2", "lat2"])
        )
        got = (
            df.select(
                haversine_km("lon1", "lat1", "lon2", "lat2").alias("d")
            )
            .toPandas()["d"]
            .to_numpy()
        )
        want = hav_np(*[np.array([p[i] for p in pairs]) for i in range(4)])
        assert np.allclose(got, want, rtol=1e-12, atol=1e-9)
        # sanity anchor: the published Tokyo-Osaka distance is ~400 km
        assert 395 < got[0] < 405
        # antipodal hits the clamp, never NaN
        assert np.isfinite(got).all()
        assert got[1] == 0.0

    def test_null_and_nan_inputs_propagate(self, spark):
        schema = "lon1 double, lat1 double, lon2 double, lat2 double"
        df = spark.createDataFrame(
            [(None, None, 1.0, 2.0), (float("nan"), 3.0, 1.0, 2.0)],
            schema,
        )
        rows = df.select(
            haversine_km("lon1", "lat1", "lon2", "lat2").alias("d")
        ).collect()
        # NULL stays NULL, NaN stays NaN — neither clamps to a
        # spurious asin(1) = 20015 km
        assert rows[0]["d"] is None
        assert np.isnan(rows[1]["d"])


def _pings_pdf():
    rows = []
    # user 1: a walk with irregular steps; user 2: exactly min_pings;
    # user 3: one ping (drops); user 4: zero duration (same us)
    base = pd.Timestamp("2024-03-01 00:00:00")
    pts1 = [(139.0, 35.0), (139.1, 35.02), (139.1, 35.02),
            (139.4, 34.9), (138.9, 35.3)]
    for i, (x, y) in enumerate(pts1):
        rows.append((1, base + pd.Timedelta(minutes=7 * i), x, y))
    rows.append((2, base, 135.0, 34.0))
    rows.append((2, base + pd.Timedelta(hours=1), 135.5, 34.2))
    rows.append((3, base, 130.0, 33.0))
    rows.append((4, base, 141.0, 43.0))
    rows.append((4, base, 141.2, 43.1))
    return pd.DataFrame(rows, columns=["user_id", "ts", "lon", "lat"])


class TestTrajectoryStats:
    def test_matches_pandas_brute_force(self, spark):
        pdf = _pings_pdf()
        out = (
            trajectory_stats(spark.createDataFrame(pdf), min_pings=2)
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )
        assert sorted(out.index) == [1, 2, 4]  # user 3 dropped
        for uid, grp in pdf.groupby("user_id"):
            if len(grp) < 2:
                continue
            g = grp.sort_values(["ts", "lon", "lat"])
            steps = hav_np(
                g["lon"].to_numpy()[:-1], g["lat"].to_numpy()[:-1],
                g["lon"].to_numpy()[1:], g["lat"].to_numpy()[1:],
            )
            r = out.loc[uid]
            assert r["n_pings"] == len(g)
            assert np.isclose(r["total_km"], steps.sum(), rtol=1e-12)
            assert np.isclose(r["max_step_km"], steps.max(), rtol=1e-12)
            dur = (g["ts"].max() - g["ts"].min()).total_seconds()
            assert np.isclose(r["duration_s"], dur)
            if dur > 0:
                assert np.isclose(
                    r["avg_kmh"], steps.sum() / (dur / 3600.0), rtol=1e-12
                )
            else:
                assert pd.isna(r["avg_kmh"])
        # user 4: zero duration -> NULL speed, distance still counted
        assert pd.isna(out.loc[4, "avg_kmh"])
        assert out.loc[4, "total_km"] > 0

    def test_one_exchange_no_python(self, spark):
        df = spark.createDataFrame(_pings_pdf())
        plan = (
            trajectory_stats(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan, node

    def test_validates_min_pings(self, spark):
        df = spark.createDataFrame(_pings_pdf())
        with pytest.raises(ValueError, match="min_pings"):
            trajectory_stats(df, min_pings=0)


def _geo_sets():
    # deterministic scatter over Japan + adversarial rows: a pair
    # straddling the antimeridian and a near-pole pair that forces
    # the full-ring longitude window
    i = np.arange(220)
    left = pd.DataFrame(
        {
            "image_id": [f"im{k}" for k in i],
            "lon": 130.0 + (i * 37 % 100) / 10.0 + (i % 7) * 0.013,
            "lat": 30.0 + (i * 53 % 80) / 10.0 + (i % 5) * 0.017,
        }
    )
    left.loc[0, ["lon", "lat"]] = (179.98, 11.5)
    left.loc[1, ["lon", "lat"]] = (45.0, 89.93)
    j = np.arange(90)
    right = pd.DataFrame(
        {
            "poi_id": [f"poi{k}" for k in j],
            "lon": 130.0 + (j * 61 % 100) / 10.0 + (j % 3) * 0.021,
            "lat": 30.0 + (j * 29 % 80) / 10.0 + (j % 11) * 0.009,
        }
    )
    right.loc[0, ["lon", "lat"]] = (-179.99, 11.52)  # wrap partner
    right.loc[1, ["lon", "lat"]] = (-140.0, 89.95)  # polar partner
    return left, right


class TestDwithinJoinGeo:
    def _brute(self, left, right, r):
        want = set()
        for _, lr in left.iterrows():
            d = hav_np(lr["lon"], lr["lat"], right["lon"], right["lat"])
            for pid, dk in zip(right["poi_id"], np.atleast_1d(d)):
                if dk <= r:
                    want.add((lr["image_id"], pid, round(float(dk), 6)))
        return want

    @pytest.mark.parametrize("radius_km", [8.0, 30.0])
    def test_matches_brute_force(self, spark, radius_km):
        left, right = _geo_sets()
        out = dwithin_join_geo(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            radius_km=radius_km,
        ).toPandas()
        got = {
            (r["image_id"], r["poi_id"], round(float(r["dist_km"]), 6))
            for _, r in out.iterrows()
        }
        want = self._brute(left, right, radius_km)
        assert got == want and len(want) > 0
        # no duplicate pairs (each right point lives in ONE cell and
        # the probe window is distinct)
        assert len(out) == len(out[["image_id", "poi_id"]].drop_duplicates())

    def test_wrap_and_pole_pairs_found(self, spark):
        left, right = _geo_sets()
        out = dwithin_join_geo(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            radius_km=30.0,
        ).toPandas()
        pairs = set(zip(out["image_id"], out["poi_id"]))
        assert ("im0", "poi0") in pairs  # antimeridian wrap
        assert ("im1", "poi1") in pairs  # near-pole full ring

    def test_coarser_cell_same_rows(self, spark):
        left, right = _geo_sets()
        ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
        a = dwithin_join_geo(ldf, rdf, 25.0).toPandas()
        b = dwithin_join_geo(ldf, rdf, 25.0, cell_deg=1.0).toPandas()
        key = lambda p: sorted(zip(p["image_id"], p["poi_id"]))
        assert key(a) == key(b)

    def test_zero_python_plan(self, spark):
        left, right = _geo_sets()
        plan = (
            dwithin_join_geo(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                10.0,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan, node

    def test_validates_inputs(self, spark):
        left, right = _geo_sets()
        ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
        with pytest.raises(ValueError, match="radius_km"):
            dwithin_join_geo(ldf, rdf, 0.0)
        with pytest.raises(ValueError, match="cell_deg"):
            dwithin_join_geo(ldf, rdf, 5.0, cell_deg=-1.0)
