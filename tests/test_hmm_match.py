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

    def test_mixed_length_cohorts_match_scalar_reference(self, spark):
        # the tensor kernel splits a bucket's runs into ceil-log2
        # (length, width) cohorts; pin that path with trajectories of
        # very different lengths AND candidate widths, all forced into
        # ONE kernel call (bucket_count=1), against an independent
        # scalar per-trajectory Viterbi computed here
        rng = np.random.RandomState(7)
        segs_rows = [
            (i, 0, 0.0, 0.1 * i, 5.0, 0.1 * i) for i in range(4)
        ] + [
            # dense vertical cluster near x=2 raises K for pings there
            (10 + i, 0, 2.0 + 0.01 * i, -0.2, 2.0 + 0.01 * i, 0.6)
            for i in range(6)
        ]
        pts_rows = []
        for traj, n_steps in [(1, 37), (2, 3), (3, 7), (4, 1), (5, 12)]:
            xs = np.round(rng.uniform(0.0, 5.0, n_steps), 3)
            ys = np.round(rng.uniform(-0.05, 0.35, n_steps), 3)
            pts_rows += [
                (traj, s, float(xs[s]), float(ys[s]))
                for s in range(n_steps)
            ]
        max_dist, sigma, beta = 0.3, 0.15, 0.06

        def scalar_reference():
            segs = sorted(segs_rows)  # (line_id, seg_idx) order
            rows = []
            by_traj = {}
            for traj, s, x, y in pts_rows:
                by_traj.setdefault(traj, []).append((s, x, y))
            for traj, steps in sorted(by_traj.items()):
                cands = []  # per step: list of (line, seg, sx, sy, d2)
                kept_steps = []
                for s, x, y in sorted(steps):
                    cc = []
                    for line, seg, x1, y1, x2, y2 in segs:
                        dx, dy = x2 - x1, y2 - y1
                        ln2 = dx * dx + dy * dy
                        t = (
                            0.0
                            if ln2 == 0.0
                            else max(
                                0.0,
                                min(1.0, ((x - x1) * dx + (y - y1) * dy) / ln2),
                            )
                        )
                        sx_, sy_ = x1 + t * dx, y1 + t * dy
                        d2 = (x - sx_) * (x - sx_) + (y - sy_) * (y - sy_)
                        if np.sqrt(d2) <= max_dist:
                            cc.append((line, seg, sx_, sy_, d2, x, y))
                    if cc:
                        cands.append(cc)
                        kept_steps.append(s)
                if not cands:
                    continue
                best = [c[4] / (sigma * sigma) for c in cands[0]]
                bps = []
                for k in range(1, len(cands)):
                    prev, cur = cands[k - 1], cands[k]
                    gx = cur[0][5] - prev[0][5]
                    gy = cur[0][6] - prev[0][6]
                    gap = np.sqrt(gx * gx + gy * gy)
                    nb, bp = [], []
                    for j, c in enumerate(cur):
                        tots = [
                            best[i]
                            + abs(
                                np.sqrt(
                                    (c[2] - p[2]) * (c[2] - p[2])
                                    + (c[3] - p[3]) * (c[3] - p[3])
                                )
                                - gap
                            )
                            / beta
                            for i, p in enumerate(prev)
                        ]
                        bi = int(np.argmin(tots))
                        bp.append(bi)
                        nb.append(tots[bi] + c[4] / (sigma * sigma))
                    bps.append(bp)
                    best = nb
                j = int(np.argmin(best))
                picked = []
                for k in range(len(cands) - 1, 0, -1):
                    picked.append((k, j))
                    j = bps[k - 1][j]
                picked.append((0, j))
                for k, j in sorted(picked):
                    line, seg, sx_, sy_, d2, _, _ = cands[k][j]
                    rows.append(
                        (
                            traj,
                            kept_steps[k],
                            line,
                            seg,
                            round(sx_, 6),
                            round(sy_, 6),
                            round(float(np.sqrt(d2)), 6),
                        )
                    )
            return sorted(rows)

        expected = scalar_reference()
        for bc in (1, None):
            got = sorted(
                (
                    r.traj_id,
                    r.step,
                    r.line_id,
                    r.seg_idx,
                    round(r.snap_x, 6),
                    round(r.snap_y, 6),
                    round(r.snap_dist, 6),
                )
                for r in hmm_map_match(
                    _pts(spark, pts_rows),
                    _segs(spark, segs_rows),
                    max_dist=max_dist,
                    sigma=sigma,
                    beta=beta,
                    bucket_count=bc,
                ).collect()
            )
            assert got == expected, f"bucket_count={bc}"
