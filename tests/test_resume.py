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
