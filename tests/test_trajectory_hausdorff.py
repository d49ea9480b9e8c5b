"""Trajectory-similarity join (operators/spatial.py::
trajectory_hausdorff_join): exact discrete Hausdorff distance over
cell-pruned candidate pairs, pure Catalyst.

Reference parity note: the reference engine (ksj2gp) has no
trajectory similarity; this extends the engine's trajectory family
(stay_points / od_matrix / trajectory_stats / hmm_map_match) with the
route-dedup / co-travel join shape.
"""

import numpy as np
import pandas as pd
import pytest

from ksj2gp_spark.operators.spatial import trajectory_hausdorff_join


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["traj_id", "x", "y"])
    )


def _brute(rows, max_dist):
    by = {}
    for t, x, y in rows:
        by.setdefault(t, []).append((x, y))
    arrs = {t: np.array(v) for t, v in by.items()}
    out = []
    keys = sorted(arrs)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            pa, pb = arrs[a], arrs[b]
            d = np.sqrt(
                ((pa[:, None, :] - pb[None, :, :]) ** 2).sum(axis=2)
            )
            h = max(d.min(axis=1).max(), d.min(axis=0).max())
            if h <= max_dist:
                out.append((a, b, round(float(h), 9)))
    return sorted(out)


def _collect(df):
    return sorted(
        (r.traj_a, r.traj_b, round(r.hausdorff, 9)) for r in df.collect()
    )


class TestTrajectoryHausdorffJoin:
    def test_matches_brute_force(self, spark):
        rng = np.random.RandomState(3)
        rows = []
        # 12 base tracks + jittered near-copies of the first 6 —
        # near-copy pairs pass, unrelated pairs mostly fail
        for t in range(12):
            base = rng.uniform(0.0, 4.0, (2,))
            steps = rng.uniform(-0.3, 0.3, (6, 2)).cumsum(axis=0)
            pts = base + steps
            rows += [(t, float(x), float(y)) for x, y in pts]
            if t < 6:
                jit = pts + rng.uniform(-0.04, 0.04, pts.shape)
                rows += [
                    (100 + t, float(x), float(y)) for x, y in jit
                ]
        for cs in (None, 0.07, 0.5):
            got = _collect(
                trajectory_hausdorff_join(
                    _pts(spark, rows), max_dist=0.15, cell_size=cs
                )
            )
            assert got == _brute(rows, 0.15), f"cell_size={cs}"
        assert len(_brute(rows, 0.15)) >= 4  # the test tests something

    def test_asymmetric_direction_drops_pair(self, spark):
        # short track A hugs one end of long track B: h(A,B) tiny but
        # h(B,A) large -> pair must NOT appear at a small threshold
        rows = [(1, 0.0, 0.01), (1, 0.1, 0.01)] + [
            (2, 0.1 * k, 0.0) for k in range(20)
        ]
        assert (
            trajectory_hausdorff_join(
                _pts(spark, rows), max_dist=0.3
            ).count()
            == 0
        )
        # raising the threshold past the far end admits it with the
        # exact directed max
        got = _collect(
            trajectory_hausdorff_join(_pts(spark, rows), max_dist=2.0)
        )
        assert got == _brute(rows, 2.0)
        assert got[0][:2] == (1, 2)

    def test_duplicate_coordinates(self, spark):
        # repeated pings at the same spot must not break the
        # exact-coverage test (min/max over a multiset = the set's)
        rows = [
            (1, 0.0, 0.0),
            (1, 0.0, 0.0),
            (1, 1.0, 0.0),
            (2, 0.0, 0.05),
            (2, 1.0, 0.05),
            (2, 1.0, 0.05),
        ]
        got = _collect(
            trajectory_hausdorff_join(_pts(spark, rows), max_dist=0.1)
        )
        assert got == _brute(rows, 0.1)
        assert len(got) == 1 and got[0][2] == 0.05

    def test_far_pairs_absent_and_no_self_pairs(self, spark):
        rows = [(1, 0.0, 0.0), (1, 0.1, 0.0), (2, 50.0, 50.0), (2, 50.1, 50.0)]
        assert (
            trajectory_hausdorff_join(
                _pts(spark, rows), max_dist=0.5
            ).count()
            == 0
        )

    def test_validates_inputs(self, spark):
        rows = [(1, 0.0, 0.0)]
        with pytest.raises(ValueError, match="max_dist"):
            trajectory_hausdorff_join(_pts(spark, rows), max_dist=0.0)
        with pytest.raises(ValueError, match="cell_size"):
            trajectory_hausdorff_join(
                _pts(spark, rows), max_dist=0.1, cell_size=-1.0
            )

    def test_plan_zero_python(self, spark):
        rows = [(1, 0.0, 0.0), (2, 0.01, 0.0)]
        plan = (
            trajectory_hausdorff_join(_pts(spark, rows), max_dist=0.1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
