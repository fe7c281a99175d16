"""Checkpoint/resume: a run interrupted at frame k and resumed must keep
state (params, poses, keyframes, pseudo-depths) and finish equivalently."""

import numpy as np

from pointnerf_slam_tpu.engine import PointNeRFSLAM
from pointnerf_slam_tpu.outputs.logger import Logger, resume_slam
from tests.test_engine import tiny_cfg


class TestResume:
    def test_resume_continues_run(self, tmp_path):
        cfg = tiny_cfg(tracking={"gt_camera": True},
                       data={"n_frames": 8, "output": str(tmp_path)},
                       mapping={"iters_first": 20, "iters": 9,
                                "ckpt_freq": 4})
        # run the first 5 frames, checkpoint at 4
        slam1 = PointNeRFSLAM(cfg)
        slam1.logger = Logger(str(tmp_path), 4, slam1.n_img)
        for idx in range(5):
            _, color, depth, gt = slam1.frame_reader[idx]
            slam1.step(idx, color, depth, gt)
            slam1.logger.maybe_log(slam1, idx)

        # resume into a fresh system
        slam2 = PointNeRFSLAM(cfg)
        start = resume_slam(slam2, str(tmp_path / "ckpts" / "00004.npz"))
        assert start == 5
        assert slam2.keyframes.frame_idx == slam1.keyframes.frame_idx
        np.testing.assert_allclose(slam2.estimate_c2w_list[:5],
                                   slam1.estimate_c2w_list[:5])
        import jax
        for a, b in zip(jax.tree_util.tree_leaves(slam2.params),
                        jax.tree_util.tree_leaves(slam1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        # finish the run from the checkpoint
        est, gt = slam2.run(start)
        assert np.abs(est[7]).sum() > 0  # later frames processed
        assert slam2.timings["frames"] == 3

    def test_resume_weak_restores_pseudo(self, tmp_path):
        from tests.test_weak_pipeline import weak_cfg
        cfg = weak_cfg()  # 16-frame trajectory with a bootstrap-able baseline
        cfg["data"]["output"] = str(tmp_path)
        slam1 = PointNeRFSLAM(cfg)
        for idx in range(7):
            _, color, depth, gt = slam1.frame_reader[idx]
            slam1.step(idx, color, depth, gt)
        assert slam1._bootstrapped
        logger = Logger(str(tmp_path), 1, slam1.n_img,
                        no_log_on_first_frame=False)
        logger.log(slam1, 6)

        slam2 = PointNeRFSLAM(cfg)
        start = resume_slam(slam2, str(tmp_path / "ckpts" / "00006.npz"))
        assert start == 7
        assert slam2._bootstrapped
        assert set(slam2.pseudo_depths) == set(slam1.pseudo_depths)
        for k in slam1.pseudo_depths:
            np.testing.assert_allclose(np.asarray(slam2.pseudo_depths[k]),
                                       np.asarray(slam1.pseudo_depths[k]),
                                       atol=1e-6)
        # metric-scale anchors survive the resume (round-4 oracle failure:
        # depth_scale fell back to 1.0 and the run chained the E-matrix's
        # unit-norm baseline at ~23x true camera speed)
        assert slam1.frontend.depth_scale is not None
        assert np.isclose(float(slam2.frontend.depth_scale),
                          float(slam1.frontend.depth_scale))
        assert np.isclose(float(slam2.frontend.median_gt_depth),
                          float(slam1.frontend.median_gt_depth))
        # reference-keyframe identity survives the resume (run-2 forensics
        # #3: the old max(pseudo_depths) guess reseeded it 45 frames stale)
        assert slam2.frontend.prev["frame_idx"] \
            == slam1.frontend.prev["frame_idx"]
        assert slam2.frontend._last_tracked_idx \
            == slam1.frontend._last_tracked_idx

    def test_resume_weak_restores_map_and_telemetry(self, tmp_path):
        """Round-5: the persistent sparse map (the metric-scale memory),
        the reference-keyframe FEATURES, and the per-stage telemetry all
        survive a resume. Run-3 forensics (RESULTS.md round 5): the map
        restarted empty at the frame-100 resume and the scale random walk
        began within 10 tracked frames."""
        from tests.test_weak_pipeline import weak_cfg
        cfg = weak_cfg()
        cfg["data"]["output"] = str(tmp_path)
        slam1 = PointNeRFSLAM(cfg)
        for idx in range(9):
            _, color, depth, gt = slam1.frame_reader[idx]
            slam1.step(idx, color, depth, gt)
        fe1 = slam1.frontend
        assert fe1.map is not None and len(fe1.map.points) > 0
        logger = Logger(str(tmp_path), 1, slam1.n_img,
                        no_log_on_first_frame=False)
        logger.log(slam1, 8)

        slam2 = PointNeRFSLAM(cfg)
        resume_slam(slam2, str(tmp_path / "ckpts" / "00008.npz"))
        fe2 = slam2.frontend
        # keyframe window identity + poses
        assert fe2._kf_order == fe1._kf_order
        for fidx in fe1._kf_order:
            np.testing.assert_allclose(fe2._kfs[fidx].Tcw,
                                       fe1._kfs[fidx].Tcw)
            np.testing.assert_allclose(fe2._kfs[fidx].kps,
                                       fe1._kfs[fidx].kps)
        # map points: same alive positions + observation counts
        alive1 = [mp for mp in fe1.map.points if not mp.is_bad]
        alive2 = [mp for mp in fe2.map.points if not mp.is_bad]
        assert len(alive2) == len(alive1)
        np.testing.assert_allclose(
            np.stack([mp.pt for mp in alive2]),
            np.stack([mp.pt for mp in alive1]))
        assert [mp.num_observations for mp in alive2] \
            == [mp.num_observations for mp in alive1]
        # reference features are the saved arrays, not a re-extraction
        np.testing.assert_allclose(np.asarray(fe2.prev["feats"][0]),
                                   np.asarray(fe1.prev["feats"][0]))
        # telemetry trails continue across the resume
        assert [t.get("idx") for t in fe2.telemetry] \
            == [t.get("idx") for t in fe1.telemetry]
        assert [t["idx"] for t in slam2.scale_telemetry] \
            == [t["idx"] for t in slam1.scale_telemetry]
        # and the map ANCHORS the same: the correction factor computed on
        # the restored map must match the live one for the same solve
        # inputs (identical ratios -> identical median)
        kfr1 = fe1._kfs[fe1._kf_order[-1]]
        obs1 = sum(1 for mp in alive1 if kfr1.id in mp.observations)
        kfr2 = fe2._kfs[fe2._kf_order[-1]]
        obs2 = sum(1 for mp in alive2 if kfr2.id in mp.observations)
        assert obs2 == obs1

    def test_resume_weak_scale_from_legacy_ckpt(self, tmp_path):
        """A checkpoint WITHOUT the fe_* fields (pre-round-4) must restore
        sane anchors derived from the data, never 1.0."""
        from tests.test_weak_pipeline import weak_cfg
        cfg = weak_cfg()
        cfg["data"]["output"] = str(tmp_path)
        slam1 = PointNeRFSLAM(cfg)
        for idx in range(7):
            _, color, depth, gt = slam1.frame_reader[idx]
            slam1.step(idx, color, depth, gt)
        logger = Logger(str(tmp_path), 1, slam1.n_img,
                        no_log_on_first_frame=False)
        logger.log(slam1, 6)
        # strip the new fields to simulate an old checkpoint
        p = tmp_path / "ckpts" / "00006.npz"
        z = dict(np.load(p))
        for k in ("fe_median_gt_depth", "fe_depth_scale", "fe_step_hist"):
            z.pop(k)
        np.savez_compressed(p, **z)

        slam2 = PointNeRFSLAM(cfg)
        resume_slam(slam2, str(p))
        mgd = slam2.frontend.median_gt_depth
        assert mgd is not None and 0.1 < mgd < 100.0
        # derived anchor within a factor ~3 of the live value (medians over
        # different support sets)
        assert mgd < 3 * slam1.frontend.median_gt_depth + 1e-6
        assert mgd > slam1.frontend.median_gt_depth / 3 - 1e-6
