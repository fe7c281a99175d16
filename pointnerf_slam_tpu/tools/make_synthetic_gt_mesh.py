"""Exact ground-truth mesh for the procedural synthetic room.

The synthetic dataset (io/synthetic.py) is an analytic scene — a closed
room AABB viewed from inside plus one interior box — so its ground-truth
surface is available in closed form. This tool rasterizes the solid's
signed field on a dense grid, extracts the zero level set with the native
marching-tets kernel, colors vertices with the scene's procedural texture,
and writes `room_gt_mesh.ply`.

This is the synthetic stand-in for the Replica `{scene}_mesh.ply` the
reference evaluates against (reference src/tools/eval_recon.py:91-210);
with `tools/cull_mesh.py --save_unseen_pc` on the sequence trajectory it
also produces the unseen-region point cloud the 2D metric's view-rejection
loop needs.

Run: python -m pointnerf_slam_tpu.tools.make_synthetic_gt_mesh \
        --out output/room_gt_mesh.ply --resolution 256
"""

from __future__ import annotations

import argparse

import numpy as np

from ..io.synthetic import SyntheticScene
from ..outputs.mesher import marching_tets, write_ply


def solid_field(scene: SyntheticScene, pts: np.ndarray) -> np.ndarray:
    """Signed 'inside-solid' value: positive inside walls or any furniture
    box, negative in free (air) space; zero level = the visible surface."""
    h = scene.room_half
    wall = np.max(np.abs(pts), axis=-1) - h            # >0 outside room
    out = wall
    for lo, hi in scene.boxes:
        box = np.max(np.maximum(np.asarray(lo) - pts,
                                pts - np.asarray(hi)), axis=-1)  # <0 inside
        out = np.maximum(out, -box)
    return out


def make_gt_mesh(resolution: int = 256, pad: float = 0.15):
    scene = SyntheticScene()
    h = scene.room_half + pad
    axes = [np.linspace(-h, h, resolution, dtype=np.float32)] * 3
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    occ = solid_field(scene, pts).reshape(resolution, resolution,
                                          resolution)
    # marching_tets positions vertices in grid-index space; the grid is
    # uniform so a single affine maps back to world
    verts_idx, tris = marching_tets(occ.astype(np.float32), 0.0)
    step = 2 * h / (resolution - 1)
    verts = verts_idx * step - h

    # color: evaluate the scene texture at each vertex; the box tint marks
    # vertices on any furniture box (within a half-cell of its AABB)
    on_box = np.zeros(len(verts), bool)
    for lo, hi in scene.boxes:
        on_box |= np.all((verts >= np.asarray(lo) - step)
                         & (verts <= np.asarray(hi) + step), axis=-1)
    colors = np.clip(scene.color(verts, on_box) * 255, 0,
                     255).astype(np.uint8)
    return verts.astype(np.float32), tris, colors


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="output/room_gt_mesh.ply")
    p.add_argument("--resolution", type=int, default=256)
    args = p.parse_args()
    verts, tris, colors = make_gt_mesh(args.resolution)
    write_ply(args.out, verts, tris, colors)
    print(f"wrote {args.out}: {len(verts)} verts, {len(tris)} tris")


if __name__ == "__main__":
    main()
