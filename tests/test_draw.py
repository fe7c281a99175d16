"""Diagnostic drawing (outputs/draw.py — utils_draw/feature-trail parity)."""

import os
from types import SimpleNamespace

import numpy as np

from pointnerf_slam_tpu.outputs.draw import (
    MatchVisualizer, combine_images_horizontally, combine_images_vertically,
    draw_feature_matches, draw_feature_trails, draw_lines, draw_points)


def test_draw_points_marks_pixels():
    img = np.zeros((20, 30, 3), np.uint8)
    out = draw_points(img, [[10.0, 5.0]], radius=2)
    assert out[5, 10].sum() > 0
    assert out[0, 0].sum() == 0
    assert img.sum() == 0  # input untouched


def test_draw_points_clips_at_border():
    img = np.zeros((10, 10, 3), np.uint8)
    out = draw_points(img, [[-1.0, 0.0], [9.5, 9.5]], radius=3)
    assert out.shape == (10, 10, 3)


def test_draw_lines_connects_endpoints():
    img = np.zeros((20, 20, 3), np.uint8)
    out = draw_lines(img, [[2, 2, 17, 17]])
    assert out[2, 2].sum() > 0 and out[17, 17].sum() > 0
    assert out[9, 9].sum() > 0 or out[10, 10].sum() > 0  # midpoint touched


def test_combine_shapes():
    a = np.zeros((10, 12, 3), np.uint8)
    b = np.zeros((14, 8), np.float32)  # gray float also accepted
    h = combine_images_horizontally(a, b)
    v = combine_images_vertically(a, b)
    assert h.shape == (14, 20, 3)
    assert v.shape == (24, 12, 3)


def test_draw_feature_matches_panel():
    a = np.full((16, 20, 3), 50, np.uint8)
    b = np.full((16, 20, 3), 80, np.uint8)
    kps1 = np.array([[4.0, 4.0], [10.0, 8.0]])
    kps2 = np.array([[5.0, 5.0], [11.0, 9.0]])
    panel = draw_feature_matches(a, b, kps1, kps2)
    assert panel.shape == (16, 40, 3)
    # keypoint in the second image is drawn at the offset position
    assert not np.array_equal(panel[5, 25], np.array([80, 80, 80]))


def test_draw_feature_trails():
    img = np.zeros((30, 30, 3), np.uint8)
    trails = [[[2, 2], [6, 6], [10, 10]], [[20, 5]]]
    out = draw_feature_trails(img, trails)
    assert out[10, 10].sum() > 0  # newest position circled
    assert out[6, 6].sum() > 0    # trail segment drawn
    assert out[5, 20].sum() > 0   # single-point trail still marked


def test_match_visualizer_writes_panel(tmp_path):
    H, W = 24, 32
    imgs = {0: np.random.default_rng(0).uniform(size=(H, W, 3)),
            5: np.random.default_rng(1).uniform(size=(H, W, 3))}

    class Reader:
        def __getitem__(self, i):
            return i, imgs[i], None, None

    fe = SimpleNamespace(last_debug={
        "ref_idx": 0, "cur_idx": 5,
        "kps_ref": np.array([[3.0, 4.0], [8.0, 9.0]]),
        "kps_cur": np.array([[4.0, 5.0], [9.0, 10.0]]),
        "accept": np.array([True, False])})
    slam = SimpleNamespace(frontend=fe, frame_reader=Reader())
    mv = MatchVisualizer(5, str(tmp_path / "matches_vis"))
    mv.vis(slam, 4)   # off-cadence: no file
    mv.vis(slam, 5)
    assert not os.path.exists(tmp_path / "matches_vis" / "00004.jpg")
    assert os.path.exists(tmp_path / "matches_vis" / "00005.jpg")


def test_trajectory_and_loss_writers(tmp_path):
    import jax.numpy as jnp
    from pointnerf_slam_tpu.outputs.draw import (LossCurveWriter,
                                                 TrajectoryWriter)
    n = 12
    est = np.tile(np.eye(4), (n, 1, 1))
    est[:, 0, 3] = np.linspace(0, 1, n)
    gt = est.copy()
    gt[:, 2, 3] = 0.1

    class MP:
        def __init__(self, p):
            self.pt = np.asarray(p, float)
            self.is_bad = False

    fe = SimpleNamespace(map=SimpleNamespace(points=[MP([0, 0, 1]),
                                                     MP([1, 0, 2])]))
    slam = SimpleNamespace(
        estimate_c2w_list=est, gt_c2w_list=gt, frontend=fe,
        loss_log={"mapping": [(5, jnp.array([10.0, 5.0, 2.0]))],
                  "tracking": [(5, jnp.float32(8.0), jnp.float32(1.0))]})
    tw = TrajectoryWriter(5, str(tmp_path / "traj_vis"))
    lw = LossCurveWriter(5, str(tmp_path / "loss_vis"))
    tw.vis(slam, 4)
    lw.vis(slam, 4)
    assert not os.listdir(tmp_path / "traj_vis")
    tw.vis(slam, 10)
    lw.vis(slam, 10)
    assert os.path.exists(tmp_path / "traj_vis" / "00010.png")
    assert os.path.exists(tmp_path / "loss_vis" / "loss_curves.png")
