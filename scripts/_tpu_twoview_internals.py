"""Probe: dump two-view pose-recovery internals for a room_bench_weak pair.

Diagnoses the weak-mode bootstrap 'n_cand=0 at all baselines' failure:
for pairs (0, k) it reports E inliers, the 4 cheirality candidate scores,
the chosen (R, t) vs the GT relative pose, and where point_checks kills
each triangulated inlier (z sign / reprojection / parallax).

Runs on CPU (no axon) so it is safe alongside nothing-else; forces the
platform before first backend use.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.io.config import load_config
from pointnerf_slam_tpu.io.datasets import get_dataset
from pointnerf_slam_tpu.frontend import SparseFrontend
from pointnerf_slam_tpu.frontend.frontend import nerf_c2w_to_cv_w2c
from pointnerf_slam_tpu.frontend.matching import match_two_way
from pointnerf_slam_tpu.frontend.epipolar import (
    estimate_relative_pose_ransac)
from pointnerf_slam_tpu.frontend.triangulate import (
    triangulate_points, point_checks)

N = int(os.environ.get("PROBE_FRAMES", "40"))
cfg = load_config(os.path.join(
    _REPO, os.environ.get("PROBE_CFG",
                          "configs/Synthetic/room_bench_weak.yaml")))
cfg["data"]["n_frames"] = N
cfg["data"]["orbit"] = 0.5 * N / 500.0
ds = get_dataset(cfg)
H, W = ds.H, ds.W
fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
fe = SparseFrontend(cfg, H, W, fx, fy, cx, cy)

_, c0, d0, p0 = ds[0]
feats0 = fe._extract(c0)
Tcw0 = nerf_c2w_to_cv_w2c(np.asarray(p0))

kps_r, desc_r, val_r = [np.asarray(x) for x in feats0[:3]]
print(f"frame 0: {int(val_r.sum())} keypoints", flush=True)

for cur in (5, 10, 20, 35):
    _, cc, _, pc = ds[cur]
    feats = fe._extract(cc)
    kps_c, desc_c, val_c = [np.asarray(x) for x in feats[:3]]
    Tcw_c_gt = nerf_c2w_to_cv_w2c(np.asarray(pc))

    idx2, mvalid, scores = match_two_way(
        jnp.asarray(desc_c), jnp.asarray(val_c), jnp.asarray(desc_r),
        jnp.asarray(val_r), fe.nn_thresh)
    idx2, mvalid = np.asarray(idx2), np.asarray(mvalid)
    f = np.array([fx, fy], np.float32)
    c = np.array([cx, cy], np.float32)
    kpn_cur = (kps_c - c) / f
    kpn_ref = ((kps_r - c) / f)[idx2]

    Trc, inliers, n_inl = estimate_relative_pose_ransac(
        jnp.asarray(kpn_ref), jnp.asarray(kpn_cur), jnp.asarray(mvalid),
        jax.random.PRNGKey(0), thresh=fe.ransac_thresh)
    Trc, inliers = np.asarray(Trc), np.asarray(inliers)

    # GT relative pose (ref<-cur): x_ref = R x_cur + t
    T_gt = Tcw0 @ np.linalg.inv(Tcw_c_gt)
    t_gt = T_gt[:3, 3]
    t_gt_u = t_gt / max(np.linalg.norm(t_gt), 1e-12)
    t_est = Trc[:3, 3]
    ang_t = np.degrees(np.arccos(np.clip(np.dot(t_gt_u, t_est), -1, 1)))
    dR = Trc[:3, :3].T @ T_gt[:3, :3]
    ang_R = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))

    R = Trc[:3, :3]
    t = Trc[:3, 3]
    Tcr = np.eye(4)
    Tcr[:3, :3] = R.T
    Tcr[:3, 3] = -R.T @ t
    Tcw_cur = Tcr @ Tcw0

    pts3d, ok = triangulate_points(jnp.asarray(Tcw_cur), jnp.asarray(Tcw0),
                                   jnp.asarray(kpn_cur),
                                   jnp.asarray(kpn_ref))
    accept, z_cur, z_ref, uvn_cur, uvn_ref = point_checks(
        pts3d, jnp.asarray(Tcw_cur), jnp.asarray(Tcw0),
        jnp.asarray(kpn_cur), jnp.asarray(kpn_ref), fx)
    pts3d, z_cur, z_ref = map(np.asarray, (pts3d, z_cur, z_ref))
    accept = np.asarray(accept)
    ok = np.asarray(ok)

    err_cur = np.linalg.norm(
        np.asarray(uvn_cur) - kpn_cur, axis=1) * fx
    err_ref = np.linalg.norm(
        np.asarray(uvn_ref) - kpn_ref, axis=1) * fx
    C_cur = -Tcw_cur[:3, :3].T @ Tcw_cur[:3, 3]
    C_ref = -Tcw0[:3, :3].T @ Tcw0[:3, 3]
    r1 = pts3d - C_cur
    r2 = pts3d - C_ref
    cosp = np.sum(r1 * r2, -1) / np.maximum(
        np.linalg.norm(r1, axis=1) * np.linalg.norm(r2, axis=1), 1e-12)

    inl = inliers & mvalid
    sub = np.flatnonzero(inl)
    print(f"pair (0,{cur}): matches {int(mvalid.sum())} "
          f"inliers {int(n_inl)}  t_ang_err {ang_t:.2f}deg "
          f"R_err {ang_R:.3f}deg", flush=True)
    if len(sub):
        par_deg = np.degrees(np.arccos(np.clip(cosp[sub], -1, 1)))
        print(f"   inlier z_cur>0: {int((z_cur[sub] > 0).sum())}/{len(sub)}"
              f"  z_ref>0: {int((z_ref[sub] > 0).sum())}"
              f"  reproj_cur px med {np.median(err_cur[sub]):.2f}"
              f"  reproj_ref px med {np.median(err_ref[sub]):.2f}"
              f"  parallax deg med {np.median(par_deg):.2f}"
              f"  pass_parallax {int((cosp[sub] < 0.9998).sum())}"
              f"  pass_all {int((accept & inl).sum())}",
              flush=True)
