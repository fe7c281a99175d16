"""Bundle-adjustment tests: synthetic scenes with known gt, perturbed
poses/points must converge back (g2o capability, frontend/ba.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.core.se3 import tensor_from_camera
from pointnerf_slam_tpu.frontend.ba import (pose_optimization,
                                            bundle_adjustment)
from tests.test_core import rotmat_from_axis_angle


def make_scene(n_pts=200, n_cams=4, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 9], size=(n_pts, 3))
    cams = []
    for k in range(n_cams):
        R = rotmat_from_axis_angle(rng.normal(size=3), 0.05 * k)
        t = np.array([0.3 * k, 0.05 * k, 0.1 * k])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        cams.append(T)
    obs = np.zeros((n_cams, n_pts, 2))
    for k, T in enumerate(cams):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        obs[k] = pc[:, :2] / pc[:, 2:3]
    cams7 = np.stack([np.asarray(tensor_from_camera(jnp.asarray(
        T, jnp.float32))) for T in cams])
    return pts, cams7, obs


class TestPoseOptimization:
    def test_recovers_pose(self):
        pts, cams7, obs = make_scene()
        cam_gt = jnp.asarray(cams7[2], jnp.float32)
        cam0 = cam_gt + jnp.asarray([0.01, -0.005, 0.008, 0.0,
                                     0.05, -0.03, 0.02])
        valid = jnp.ones((len(pts),), bool)
        cam, inl, n = pose_optimization(cam0, jnp.asarray(pts, jnp.float32),
                                        jnp.asarray(obs[2], jnp.float32),
                                        valid, sigma2=1e-6)
        err0 = float(jnp.abs(cam0 - cam_gt).max())
        err1 = float(jnp.abs(cam - cam_gt).max())
        assert err1 < 0.02 * err0, (err0, err1)
        assert int(n) > 190

    def test_outliers_rejected(self):
        pts, cams7, obs = make_scene()
        rng = np.random.default_rng(1)
        kpn = obs[1].copy()
        bad = rng.choice(len(pts), 40, replace=False)
        kpn[bad] += rng.uniform(0.05, 0.2, size=(40, 2))
        cam_gt = jnp.asarray(cams7[1], jnp.float32)
        cam0 = cam_gt + jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.03, -0.02, 0.01])
        cam, inl, n = pose_optimization(
            cam0, jnp.asarray(pts, jnp.float32), jnp.asarray(kpn, jnp.float32),
            jnp.ones((len(pts),), bool), sigma2=1e-6)
        inl = np.asarray(inl)
        assert inl[bad].mean() < 0.1  # corrupted obs classified outliers
        assert float(jnp.abs(cam - cam_gt).max()) < 5e-3


class TestBundleAdjustment:
    def test_joint_refinement(self):
        pts, cams7, obs = make_scene(n_pts=120, n_cams=4)
        rng = np.random.default_rng(2)
        cams_pert = cams7.copy()
        cams_pert[2:] += rng.normal(0, 0.01, size=(2, 7))
        pts_pert = pts + rng.normal(0, 0.02, size=pts.shape)
        # monocular BA: fix TWO cameras to pin the scale gauge (the
        # reference's local BA fixes keyframes with kid <= 1)
        fixed = jnp.asarray([True, True, False, False])
        cams_out, pts_out, chi2 = bundle_adjustment(
            jnp.asarray(cams_pert, jnp.float32),
            jnp.asarray(pts_pert, jnp.float32),
            jnp.asarray(obs, jnp.float32),
            jnp.ones(obs.shape[:2], bool), fixed, sigma2=1e-6, iters=30,
            l2_iters=15)
        # anchored gauge -> compare directly against gt
        cam_err0 = np.abs(cams_pert - cams7).max()
        cam_err1 = float(jnp.abs(cams_out - jnp.asarray(cams7)).max())
        pt_err0 = np.abs(pts_pert - pts).max()
        pt_err1 = float(jnp.abs(pts_out - jnp.asarray(pts)).max())
        assert cam_err1 < 0.1 * cam_err0, (cam_err0, cam_err1)
        # block-coordinate descent converges points slower than cameras
        assert pt_err1 < 0.25 * pt_err0, (pt_err0, pt_err1)
        assert float(chi2) < 1.0
        # fixed cameras untouched
        np.testing.assert_allclose(np.asarray(cams_out[0]), cams_pert[0])
        np.testing.assert_allclose(np.asarray(cams_out[1]), cams_pert[1])
