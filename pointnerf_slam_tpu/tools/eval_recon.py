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
import os

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


def _normalize(x):
    return x / max(np.linalg.norm(x), 1e-12)


def _viewmatrix(z, up, pos):
    """Reference viewmatrix (eval_recon.py:15-21): camera z axis points at
    the target (CV convention), columns [x, y, z, pos]."""
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    m = np.eye(4)
    m[:3, :4] = np.stack([vec0, vec1, vec2, pos], 1)
    return m


def oriented_bounds(verts: np.ndarray):
    """PCA oriented bounding box: (extents (3,), to_origin (4,4)) such that
    `verts @ to_origin` is centered, axis-aligned (replaces
    trimesh.bounds.oriented_bounds, reference eval_recon.py:120-127)."""
    c = verts.mean(0)
    sub = verts[:: max(len(verts) // 50000, 1)] - c
    _, _, Vt = np.linalg.svd(sub, full_matrices=False)
    proj = (verts - c) @ Vt.T
    lo, hi = proj.min(0), proj.max(0)
    extents = hi - lo
    center = c + Vt.T @ ((lo + hi) / 2)
    to_origin = np.eye(4)
    to_origin[:3, :3] = Vt
    to_origin[:3, 3] = -Vt @ center
    return extents, to_origin


def check_proj(points: np.ndarray, W, H, fx, fy, cx, cy, c2w) -> bool:
    """True if ANY point projects inside the camera view (exact port of
    reference check_proj, eval_recon.py:63-90: OpenGL->CV axis flips, -x
    camera flip, z<0 front test)."""
    if len(points) == 0:
        return False
    c2w = c2w.copy()
    c2w[:3, 1] *= -1.0
    c2w[:3, 2] *= -1.0
    w2c = np.linalg.inv(c2w)
    pc = points @ w2c[:3, :3].T + w2c[:3, 3]
    z = pc[:, 2] + 1e-5
    u = (fx * (-pc[:, 0]) + cx * z) / z
    v = (fy * pc[:, 1] + cy * z) / z
    mask = (z <= 0) & (u > 0) & (u < W) & (v > 0) & (v < H)
    return bool(mask.sum() > 0)


def calc_2d_metric(rec_ply: str, gt_ply: str, n_imgs: int = 1000,
                   H: int = 500, W: int = 500, fx: float = 300.0,
                   seed: int = 0, unseen_pc=None, align: bool = False,
                   reject_unseen: bool = True):
    """Depth-L1 (cm) over random in-room views rendered by the native BVH
    ray-caster (reference eval_recon.py:131-210).

    View-sampling parity with the reference: camera origins are drawn
    inside the gt mesh's shrunken oriented bounding box
    ([0.3, 0.7, 0.7] x extents, +0.4 world-z lift, :119-127), targets
    uniform in [-10000, 10000]^3, up = (0, 0, -1); a view is REDRAWN while
    any point of the unseen-gt-region point cloud projects into it
    (check_proj, :158-175). The unseen cloud is `{gt}_pc_unseen.npy` beside
    the gt mesh (the reference downloads it; our cull_mesh --save_unseen_pc
    produces it). Without one, views seeing > 10% gt-empty pixels are
    redrawn instead (documented deviation). `reject_unseen=False` disables
    the rejection loop so its metric effect can be measured."""
    from .raycast import MeshRaycaster

    rv, rt, _ = read_ply(rec_ply)
    gv, gt_t, _ = read_ply(gt_ply)
    if align:
        T = icp_align(sample_mesh_surface(rv, rt, 50000),
                      sample_mesh_surface(gv, gt_t, 50000))
        rv = rv @ T[:3, :3].T + T[:3, 3]
    rc_rec = MeshRaycaster(rv, rt)
    rc_gt = MeshRaycaster(gv, gt_t)

    if unseen_pc is None:
        auto = gt_ply.replace(".ply", "_pc_unseen.npy")
        unseen_pc = auto if os.path.exists(auto) else None
    if isinstance(unseen_pc, str):
        unseen_pc = np.load(unseen_pc)
    if not reject_unseen:
        unseen_pc = None

    fy = fx
    cx, cy = W / 2.0 - 0.5, H / 2.0 - 0.5
    extents, to_origin = oriented_bounds(gv)
    extents = extents * np.array([0.3, 0.7, 0.7])
    transform = np.linalg.inv(to_origin)
    transform[2, 3] += 0.4
    up = np.array([0.0, 0.0, -1.0])

    rng = np.random.default_rng(seed)
    errs = []
    tries = 0
    while len(errs) < n_imgs and tries < n_imgs * 20:
        tries += 1
        origin_box = rng.uniform(-extents / 2, extents / 2)
        origin = transform[:3, :3] @ origin_box + transform[:3, 3]
        target = rng.uniform(-10000, 10000, 3) - origin
        c2w = _viewmatrix(target, up, origin)
        if unseen_pc is not None:
            if check_proj(unseen_pc, W, H, fx, fy, cx, cy, c2w):
                continue  # unseen gt region visible -> redraw the view
        d_gt = _render_depth_c2w(rc_gt, c2w, H, W, fx, cx, cy)
        if unseen_pc is None and (d_gt <= 0).mean() > 0.1:
            continue
        d_rec = _render_depth_c2w(rc_rec, c2w, H, W, fx, cx, cy)
        # reference: unmasked mean |gt - ours| (missed rays render as 0 in
        # the Open3D depth buffer and here alike), eval_recon.py:205
        errs.append(np.abs(d_gt - d_rec).mean())
    return {"depth l1": float(np.mean(errs)) * 100 if errs else float("nan"),
            "n_views": len(errs)}


def _render_depth_c2w(rc, c2w, H, W, fx, cx, cy, z_far: float = 20.0):
    """Depth map under a CV-convention (+z forward) camera pose; missed
    rays and hits beyond z_far render 0 (the Open3D depth-buffer semantics
    the reference uses, with its set_constant_z_far(20))."""
    X, Y, Z = c2w[:3, 0], c2w[:3, 1], c2w[:3, 2]
    eye = c2w[:3, 3]
    j, i = np.mgrid[0:H, 0:W]
    dirs = ((i - cx)[..., None] * X + (j - cy)[..., None] * Y
            + fx * Z).reshape(-1, 3)
    t = rc.cast(np.broadcast_to(eye, dirs.shape).astype(np.float32),
                dirs.astype(np.float32))
    # hit = o + t * dir with dir . Z == fx  ->  z-depth = t * fx
    z = t * fx
    z[~np.isfinite(z)] = 0
    z[t < 0] = 0
    z[z > z_far] = 0
    return z.reshape(H, W)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rec_mesh", required=True)
    p.add_argument("--gt_mesh", required=True)
    p.add_argument("-3d", "--metric_3d", action="store_true")
    p.add_argument("-2d", "--metric_2d", action="store_true")
    p.add_argument("--n_imgs", type=int, default=1000)
    p.add_argument("--unseen_pc", type=str, default=None,
                   help="unseen-gt-region point cloud (.npy); default "
                        "{gt_mesh%.ply}_pc_unseen.npy if present")
    p.add_argument("--no_reject_unseen", action="store_true",
                   help="disable the unseen-region view-rejection loop "
                        "(to measure its effect on depth-L1)")
    args = p.parse_args()
    if args.metric_3d:
        print(calc_3d_metric(args.rec_mesh, args.gt_mesh))
    if args.metric_2d:
        print(calc_2d_metric(args.rec_mesh, args.gt_mesh,
                             n_imgs=args.n_imgs, unseen_pc=args.unseen_pc,
                             reject_unseen=not args.no_reject_unseen))


if __name__ == "__main__":
    main()
