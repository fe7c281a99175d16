"""Cull mesh faces outside every frustum of a trajectory
(capability of src/tools/cull_mesh.py; used to prepare gt meshes for
eval_recon)."""

from __future__ import annotations

import argparse

import numpy as np

from ..outputs.mesher import filter_mesh, read_ply, write_ply

# the reference hardcodes Replica intrinsics (cull_mesh.py:32-38)
REPLICA_INTRINSICS = dict(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5,
                          cy=339.5)


def frustum_keep_mask(verts: np.ndarray, poses_c2w: np.ndarray,
                      H: int, W: int, fx: float, fy: float, cx: float,
                      cy: float) -> np.ndarray:
    """Per-vertex mask: inside at least one camera frustum (NeRF -y/-z
    camera convention poses)."""
    keep = np.zeros(len(verts), bool)
    for c2w in poses_c2w:
        w2c = np.linalg.inv(c2w)
        pc = verts @ w2c[:3, :3].T + w2c[:3, 3]
        z = -pc[:, 2]
        ok = z > 1e-6
        u = pc[:, 0] / np.maximum(z, 1e-6) * fx + cx
        v = -pc[:, 1] / np.maximum(z, 1e-6) * fy + cy
        keep |= ok & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        if keep.all():
            break
    return keep


def cull_mesh(verts: np.ndarray, tris: np.ndarray, poses_c2w: np.ndarray,
              H: int, W: int, fx: float, fy: float, cx: float, cy: float):
    """Keep vertices inside at least one camera frustum."""
    keep = frustum_keep_mask(verts, poses_c2w, H, W, fx, fy, cx, cy)
    return filter_mesh(verts, tris, keep)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mesh")
    p.add_argument("--traj", required=True,
                   help="Replica traj.txt or npz ckpt with gt_c2w_list")
    p.add_argument("--out", required=True)
    p.add_argument("--save_unseen_pc", action="store_true",
                   help="also write {out%%.ply}_pc_unseen.npy: the culled "
                        "(out-of-every-frustum) vertices — the unseen-gt "
                        "point cloud eval_recon's 2D view rejection needs "
                        "(the reference downloads this file pre-made)")
    args = p.parse_args()

    verts, tris, colors = read_ply(args.mesh)
    if args.traj.endswith(".npz"):
        poses = np.load(args.traj)["gt_c2w_list"]
    else:
        rows = np.loadtxt(args.traj).reshape(-1, 4, 4)
        rows[:, :3, 1] *= -1
        rows[:, :3, 2] *= -1
        poses = rows
    k = REPLICA_INTRINSICS
    keep = frustum_keep_mask(verts, poses, **k)
    v, t = filter_mesh(verts, tris, keep)
    write_ply(args.out, v, t)
    print(f"culled {len(verts)} -> {len(v)} vertices")
    if args.save_unseen_pc:
        pc_path = args.out[:-4] + "_pc_unseen.npy" \
            if args.out.endswith(".ply") else args.out + "_pc_unseen.npy"
        np.save(pc_path, verts[~keep].astype(np.float32))
        print(f"wrote {pc_path} ({int((~keep).sum())} unseen points)")


if __name__ == "__main__":
    main()
