"""HMM map matching (operators/spatial.py::hmm_map_match): Viterbi
decode over cell-join candidates — route continuity disambiguates
where independent nearest-segment snapping zig-zags.

Reference parity note: the reference engine (ksj2gp) has no map
matcher; this operator extends the engine's spatial-join family for
the trajectory lanes (stay_points / od_matrix / trajectory_stats)
over the same candidate machinery as snap_points
(operators/spatial.py::_segment_cell_cover).
"""

import numpy as np
import pandas as pd
import pytest

from ksj2gp_spark.operators.spatial import hmm_map_match, snap_points


def _segs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["line_id", "seg_idx", "x1", "y1", "x2", "y2"]
        )
    )


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["traj_id", "step", "x", "y"])
    )


# two parallel horizontal roads 0.1 apart; pings ride road 0 (y=0)
# with noise that pushes pings 1 and 3 NEARER to road 1 (y=0.1)
PARALLEL_SEGS = [
    (0, 0, 0.0, 0.0, 1.0, 0.0),
    (0, 1, 1.0, 0.0, 2.0, 0.0),
    (1, 0, 0.0, 0.1, 1.0, 0.1),
    (1, 1, 1.0, 0.1, 2.0, 0.1),
]
ZIGZAG_PINGS = [
    (7, 0, 0.2, 0.01),
    (7, 1, 0.6, 0.06),  # nearer road 1
    (7, 2, 1.0, 0.02),
    (7, 3, 1.4, 0.07),  # nearer road 1
    (7, 4, 1.8, 0.01),
]


class TestHmmMapMatch:
    def test_continuity_beats_nearest_segment(self, spark):
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, ZIGZAG_PINGS)
        hmm = (
            hmm_map_match(pts, segs, max_dist=0.2, sigma=0.1, beta=0.01)
            .orderBy("step")
            .collect()
        )
        # nearest-segment snapping provably zig-zags on this input
        snap = (
            snap_points(
                pts.selectExpr(
                    "traj_id * 10 + step AS point_id", "x", "y"
                ),
                segs,
                max_dist=0.2,
            )
            .orderBy("point_id")
            .collect()
        )
        assert [r.line_id for r in snap] == [0, 1, 0, 1, 0]
        # the HMM keeps the whole trajectory on road 0
        assert [r.line_id for r in hmm] == [0, 0, 0, 0, 0]
        assert [r.step for r in hmm] == [0, 1, 2, 3, 4]
        # snap positions project onto y=0 and distances are the ping y
        for r, (_, _, x, y) in zip(hmm, ZIGZAG_PINGS):
            assert r.snap_y == 0.0
            assert abs(r.snap_x - x) < 1e-9
            assert abs(r.snap_dist - y) < 1e-9

    def test_weak_transition_reduces_to_nearest(self, spark):
        # with beta huge, transitions cost ~0 and the decode picks the
        # per-ping emission argmin = nearest segment
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, ZIGZAG_PINGS)
        hmm = (
            hmm_map_match(pts, segs, max_dist=0.2, sigma=0.1, beta=1e9)
            .orderBy("step")
            .collect()
        )
        assert [r.line_id for r in hmm] == [0, 1, 0, 1, 0]

    def test_off_network_ping_absent_and_chain_survives(self, spark):
        segs = _segs(spark, PARALLEL_SEGS)
        pings = list(ZIGZAG_PINGS)
        pings[2] = (7, 2, 1.0, 5.0)  # far off-network
        pts = _pts(spark, pings)
        hmm = (
            hmm_map_match(pts, segs, max_dist=0.2, sigma=0.1, beta=0.01)
            .orderBy("step")
            .collect()
        )
        assert [r.step for r in hmm] == [0, 1, 3, 4]
        assert [r.line_id for r in hmm] == [0, 0, 0, 0]

    def test_max_step_gap_breaks_chain(self, spark):
        # same hole, but max_step_gap=1 splits the decode into two
        # independent runs with no transition linking step 1 to step 3.
        # Hand-computed optima: run [0,1] stays on road 0; run [3,4],
        # now missing the upstream continuity anchor, starts on road 1
        # (ping 3 is nearer it) and crosses to road 0 — whereas the
        # UNBROKEN chain over the same pings keeps every step on road 0
        segs = _segs(spark, PARALLEL_SEGS)
        pings = [p for p in ZIGZAG_PINGS if p[1] != 2]
        pts = _pts(spark, pings)
        kw = dict(max_dist=0.2, sigma=0.1, beta=0.01)
        broken = (
            hmm_map_match(pts, segs, max_step_gap=1, **kw)
            .orderBy("step")
            .collect()
        )
        chained = (
            hmm_map_match(pts, segs, **kw).orderBy("step").collect()
        )
        assert [r.step for r in broken] == [0, 1, 3, 4]
        assert [r.line_id for r in broken] == [0, 0, 1, 0]
        assert [r.line_id for r in chained] == [0, 0, 0, 0]

    def test_multiple_trajectories_independent(self, spark):
        segs = _segs(spark, PARALLEL_SEGS)
        rows = list(ZIGZAG_PINGS) + [
            # second trajectory mirrors the first above road 1
            (8, s, x, 0.2 - y)
            for (_, s, x, y) in ZIGZAG_PINGS
        ]
        pts = _pts(spark, rows)
        out = hmm_map_match(
            pts, segs, max_dist=0.3, sigma=0.1, beta=0.01
        ).toPandas()
        t7 = out[out.traj_id == 7].sort_values("step")
        t8 = out[out.traj_id == 8].sort_values("step")
        assert list(t7.line_id) == [0] * 5
        assert list(t8.line_id) == [1] * 5

    def test_single_ping_trajectory(self, spark):
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, [(3, 0, 0.5, 0.04)])
        out = hmm_map_match(
            pts, segs, max_dist=0.2, sigma=0.1, beta=0.01
        ).collect()
        assert len(out) == 1
        assert out[0].line_id == 0  # nearest (0.04 < 0.06)

    def test_no_candidates_empty(self, spark):
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, [(3, 0, 50.0, 50.0)])
        assert (
            hmm_map_match(
                pts, segs, max_dist=0.2, sigma=0.1, beta=0.01
            ).count()
            == 0
        )

    def test_validates_inputs(self, spark):
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, ZIGZAG_PINGS)
        with pytest.raises(ValueError, match="max_dist"):
            hmm_map_match(pts, segs, max_dist=0.0)
        with pytest.raises(ValueError, match="sigma"):
            hmm_map_match(pts, segs, max_dist=0.1, sigma=-1.0)
        with pytest.raises(ValueError, match="cell_size"):
            hmm_map_match(pts, segs, max_dist=0.1, cell_size=-2.0)

    def test_deterministic_tie_break(self, spark):
        # a ping exactly equidistant from both roads at every step:
        # costs tie, (line_id, seg_idx) order picks road 0 every time
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, [(1, s, 0.2 + 0.4 * s, 0.05) for s in range(4)])
        for _ in range(2):
            out = (
                hmm_map_match(
                    pts, segs, max_dist=0.2, sigma=0.1, beta=0.01
                )
                .orderBy("step")
                .collect()
            )
            assert [r.line_id for r in out] == [0, 0, 0, 0]

    def test_plan_candidate_join_stays_catalyst(self, spark):
        # everything upstream of the per-trajectory DP is codegen: the
        # only Python node in the plan is the final FlatMapGroupsInPandas
        segs = _segs(spark, PARALLEL_SEGS)
        pts = _pts(spark, ZIGZAG_PINGS)
        plan = (
            hmm_map_match(pts, segs, max_dist=0.2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("FlatMapGroupsInPandas") == 1
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
