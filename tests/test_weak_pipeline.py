"""End-to-end weak-depth (RGB-only) pipeline test: SuperPoint-style
front-end bootstrap -> pseudo-depth supervision -> weak mapping + tracking.
This is the reference's flagship mode (configs/pointNeRF_slam.yaml)."""

import numpy as np

from pointnerf_slam_tpu.engine import PointNeRFSLAM
from tests.test_engine import tiny_cfg


def weak_cfg():
    return tiny_cfg(
        weak_depth=True,
        depth_supervision=True,
        track_every_frame=5,
        # tiny 120x160 scenes carry far fewer keypoints/triangulations
        # than the flagship's 680x1200; keep the production-strength
        # bootstrap conditioning gates proportionate
        bootstrap_min_cand=16,
        cam={"H": 120, "W": 160, "fx": 90.0, "fy": 90.0,
             "cx": 79.5, "cy": 59.5},
        data={"dataset": "synthetic", "n_frames": 16, "orbit": 0.12,
              "output": "/tmp/tpu_slam_weak_test"},
        mapping={"every_frame": 5, "pixels": 400, "iters": 45,
                 "iters_first": 150, "mapping_window_size": 3,
                 "keyframe_every": 5, "color_refine": False},
        tracking={"pixels": 300, "iters": 10, "lr": 2e-3},
    )


class TestWeakPipeline:
    def test_full_weak_run(self):
        from tests.weak_runs import weak_run
        slam, est, gt = weak_run(True)

        # bootstrap must have produced pseudo-depth for frames 0 and 5
        assert 0 in slam.pseudo_depths and 5 in slam.pseudo_depths
        p5 = np.asarray(slam.pseudo_depths[5])
        assert (p5 > 0.01).sum() > 50
        # pseudo-depth values close to (unobserved) sensor depth
        _, _, d5, _ = slam.frame_reader[5]
        m = p5 > 0.01
        rel = np.abs(p5[m] - d5[m]) / d5[m]
        assert float(np.median(rel)) < 0.15

        # continuous-mode pseudo-depth is quality-gated (scene-scale z
        # gate, see test_map_wiring): at this toy's tiny baselines the
        # gate may reject everything, but whatever survives must be
        # scene-consistent — junk supervision is worse than none
        for i in slam.pseudo_depths:
            p = np.asarray(slam.pseudo_depths[i])
            m = p > 0.01
            if m.sum() == 0:
                continue
            _, _, d, _ = slam.frame_reader[i]
            rel_i = np.abs(p[m] - np.asarray(d)[m]) / np.asarray(d)[m]
            assert float(np.median(rel_i)) < 0.2, (i, np.median(rel_i))

        # all poses populated and finite; bounded drift on the easy orbit
        assert np.isfinite(est).all()
        ate = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
        assert ate.max() < 1.0, f"ATE {ate}"

        # bootstrap pose (frame 5) close to gt
        assert ate[5] < 0.2, f"bootstrap pose err {ate[5]}"

        # keyframes: weak mode inserts every mapped frame
        assert len(slam.keyframes) >= 3
        assert slam.timings["frontend"] > 0

    def test_gt_scale_injection_ablation(self):
        """tracking.gt_scale_injection (error-budget ablation,
        BASELINE.md): each continuous solve's baseline about the estimated
        reference equals the TRUE metric baseline; telemetry records the
        applied factor."""
        from pointnerf_slam_tpu.engine import PointNeRFSLAM
        cfg = weak_cfg()
        cfg["tracking"]["gt_scale_injection"] = True
        cfg["data"]["output"] = "/tmp/tpu_slam_gtscale_test"
        slam = PointNeRFSLAM(cfg)
        for idx in range(16):
            _, color, depth, gt = slam.frame_reader[idx]
            slam.step(idx, color, depth, gt)
        fe = slam.frontend
        inj = [t for t in fe.telemetry if "f_gt" in t]
        assert inj, "no injected solves recorded"
        # every injected solve's baseline matches the gt baseline about
        # the estimated reference (checked via the recorded solve center)
        checked = 0
        for rec in slam.scale_telemetry:
            if rec["c_solve"] is None:
                continue
            i, r = rec["idx"], rec["ref_idx"]
            b_est = np.linalg.norm(np.asarray(rec["c_solve"])
                                   - slam.estimate_c2w_list[r][:3, 3])
            b_gt = np.linalg.norm(slam.gt_c2w_list[i][:3, 3]
                                  - slam.gt_c2w_list[r][:3, 3])
            # ref pose may have been refined AFTER the solve; compare
            # loosely (the telemetry f_gt is the exact check)
            if any(t.get("idx") == i and "f_gt" in t
                   for t in fe.telemetry):
                np.testing.assert_allclose(b_est, b_gt, rtol=0.35)
                checked += 1
        assert checked >= 1
