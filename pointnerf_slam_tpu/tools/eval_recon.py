"""Reconstruction evaluation (capability of src/tools/eval_recon.py).

3-D metrics (reference :24-59, 91-117): sample 200k points on both meshes,
ICP-align reconstruction to gt, report accuracy (cm), completion (cm),
completion ratio (% < 5 cm). Open3D's ICP is replaced by a point-to-point
ICP over scipy cKDTree; mesh surface sampling is area-weighted.

2-D depth-L1 (reference :131-210): render depth maps of gt vs reconstructed
mesh from random in-room views via the native BVH ray-caster
(native/raycast.cpp — the Open3D offscreen-render replacement) and report
mean L1 (cm).
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy.spatial import cKDTree

from ..outputs.mesher import read_ply


def sample_mesh_surface(verts: np.ndarray, tris: np.ndarray, n: int,
                        rng=None):
    """Area-weighted uniform surface sampling."""
    rng = rng or np.random.default_rng(0)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    probs = areas / areas.sum()
    idx = rng.choice(len(tris), n, p=probs)
    u = rng.uniform(size=(n, 1))
    v = rng.uniform(size=(n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return a[idx] + u * (b[idx] - a[idx]) + v * (c[idx] - a[idx])


def icp_align(src: np.ndarray, dst: np.ndarray, iters: int = 30,
              subsample: int = 20000, rng=None):
    """Point-to-point ICP: returns (4, 4) transform aligning src -> dst."""
    rng = rng or np.random.default_rng(1)
    T = np.eye(4)
    cur = src
    tree = cKDTree(dst)
    for _ in range(iters):
        sel = rng.choice(len(cur), min(subsample, len(cur)), replace=False)
        s = cur[sel]
        _, nn = tree.query(s, workers=-1)
        d = dst[nn]
        sm = s.mean(0)
        dm = d.mean(0)
        H = (s - sm).T @ (d - dm)
        U, _, Vt = np.linalg.svd(H)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = Vt.T @ S @ U.T
        t = dm - R @ sm
        dT = np.eye(4)
        dT[:3, :3] = R
        dT[:3, 3] = t
        T = dT @ T
        cur = src @ T[:3, :3].T + T[:3, 3]
    return T


def completion_ratio(gt: np.ndarray, rec: np.ndarray,
                     dist_th: float = 0.05) -> float:
    d, _ = cKDTree(rec).query(gt, workers=-1)
    return float((d < dist_th).mean())


def accuracy(gt: np.ndarray, rec: np.ndarray) -> float:
    d, _ = cKDTree(gt).query(rec, workers=-1)
    return float(d.mean())


def completion(gt: np.ndarray, rec: np.ndarray) -> float:
    d, _ = cKDTree(rec).query(gt, workers=-1)
    return float(d.mean())


def calc_3d_metric(rec_ply: str, gt_ply: str, n_samples: int = 200000,
                   align: bool = True):
    """accuracy/completion (cm) + completion ratio (%)
    (reference eval_recon.py:91-117)."""
    rv, rt, _ = read_ply(rec_ply)
    gv, gt_t, _ = read_ply(gt_ply)
    rec = sample_mesh_surface(rv, rt, n_samples)
    gt = sample_mesh_surface(gv, gt_t, n_samples)
    if align:
        T = icp_align(rec, gt)
        rec = rec @ T[:3, :3].T + T[:3, 3]
    return {
        "accuracy": accuracy(gt, rec) * 100,
        "completion": completion(gt, rec) * 100,
        "completion ratio": completion_ratio(gt, rec) * 100,
    }


def calc_2d_metric(rec_ply: str, gt_ply: str, n_imgs: int = 1000,
                   H: int = 480, W: int = 640, fx: float = 300.0,
                   seed: int = 0):
    """Depth-L1 (cm) over random in-room views rendered by the native BVH
    ray-caster (reference eval_recon.py:131-210)."""
    from .raycast import MeshRaycaster

    rv, rt, _ = read_ply(rec_ply)
    gv, gt_t, _ = read_ply(gt_ply)
    rc_rec = MeshRaycaster(rv, rt)
    rc_gt = MeshRaycaster(gv, gt_t)

    rng = np.random.default_rng(seed)
    lo = gv.min(0)
    hi = gv.max(0)
    errs = []
    tries = 0
    while len(errs) < n_imgs and tries < n_imgs * 5:
        tries += 1
        eye = rng.uniform(lo + 0.2 * (hi - lo), hi - 0.2 * (hi - lo))
        target = rng.uniform(lo, hi)
        up = np.array([0.0, 0.0, 1.0])
        d_gt = _render_depth(rc_gt, eye, target, up, H, W, fx)
        # resample views that see unobserved gt regions (reference :188-196)
        if (d_gt <= 0).mean() > 0.1:
            continue
        d_rec = _render_depth(rc_rec, eye, target, up, H, W, fx)
        m = (d_gt > 0)
        errs.append(np.abs(d_gt[m] - np.where(d_rec[m] > 0, d_rec[m],
                                              d_gt[m].max())).mean())
    return {"depth l1": float(np.mean(errs)) * 100 if errs else float("nan"),
            "n_views": len(errs)}


def _render_depth(rc, eye, target, up, H, W, fx):
    fwd = target - eye
    n = np.linalg.norm(fwd)
    if n < 1e-9:
        fwd = np.array([1.0, 0, 0])
    else:
        fwd = fwd / n
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-9)
    upv = np.cross(right, fwd)
    j, i = np.mgrid[0:H, 0:W]
    cx, cy = (W - 1) / 2, (H - 1) / 2
    dirs = ((i - cx)[..., None] * right + (j - cy)[..., None] * -upv
            + fx * fwd).reshape(-1, 3)
    t = rc.cast(np.broadcast_to(eye, dirs.shape).astype(np.float32),
                dirs.astype(np.float32))
    # hit = o + t * dir with dir . fwd == fx  ->  z-depth = t * fx
    z = t * fx
    z[~np.isfinite(z)] = 0
    z[t < 0] = 0
    return z.reshape(H, W)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rec_mesh", required=True)
    p.add_argument("--gt_mesh", required=True)
    p.add_argument("-3d", "--metric_3d", action="store_true")
    p.add_argument("-2d", "--metric_2d", action="store_true")
    args = p.parse_args()
    if args.metric_3d:
        print(calc_3d_metric(args.rec_mesh, args.gt_mesh))
    if args.metric_2d:
        print(calc_2d_metric(args.rec_mesh, args.gt_mesh))


if __name__ == "__main__":
    main()
