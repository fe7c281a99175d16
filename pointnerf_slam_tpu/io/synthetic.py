"""Procedural synthetic RGB-D sequence: an analytic ray-cast room.

Replaces the need for Replica downloads in tests and benchmarks (SURVEY.md §4
"synthetic-cube RGB-D dataset fixture"). The scene is a closed room (axis-
aligned box, viewed from inside) containing one interior box; colors are a
smooth procedural 3-D texture so photometric losses have useful gradients.

Camera convention matches the framework: c2w with camera -z forward, +y up;
depth maps are z-buffer depths (distance along camera forward), exactly what
the renderer's z_vals integrate to.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticScene:
    room_half: float = 2.0                 # room is [-h, h]^3
    box_lo: tuple = (-0.6, -2.0, -0.7)     # interior box AABB
    box_hi: tuple = (0.4, -0.8, 0.3)

    def ray_cast(self, rays_o: np.ndarray, rays_d: np.ndarray):
        """Nearest-hit parameter t and hit points for (N, 3) rays.

        The room is hit from inside (exit of its AABB); the box from outside
        (entry of its AABB). Returns (t, points, hit_box_mask)."""
        o, d = rays_o, rays_d
        d = np.where(np.abs(d) < 1e-12, 1e-12, d)

        h = self.room_half
        t_room = np.min(np.max(
            (np.array([[-h, h]]) - o[..., None]) / d[..., None], axis=-1),
            axis=-1)

        lo = np.asarray(self.box_lo)
        hi = np.asarray(self.box_hi)
        t1 = (lo - o) / d
        t2 = (hi - o) / d
        t_near = np.max(np.minimum(t1, t2), axis=-1)
        t_far = np.min(np.maximum(t1, t2), axis=-1)
        box_hit = (t_near <= t_far) & (t_near > 1e-6)
        t = np.where(box_hit, np.minimum(t_near, t_room), t_room)
        pts = o + d * t[..., None]
        return t, pts, box_hit & (t_near <= t_room)

    def color(self, pts: np.ndarray, box_mask: np.ndarray) -> np.ndarray:
        """Smooth procedural texture in [0, 1] with a mid-frequency detail
        component (gives corner detectors something to latch onto while
        keeping photometric gradients smooth)."""
        p = pts
        base = 0.5 + 0.5 * np.stack([
            np.sin(1.7 * p[..., 0] + 0.9 * p[..., 1]),
            np.sin(1.3 * p[..., 1] + 1.1 * p[..., 2] + 2.0),
            np.sin(2.1 * p[..., 2] + 0.7 * p[..., 0] + 4.0),
        ], axis=-1)
        detail = (np.sin(7.3 * p[..., 0] + 0.5) * np.sin(8.1 * p[..., 1] + 1.2)
                  * np.sin(6.7 * p[..., 2] + 2.1))
        detail2 = (np.sin(14.9 * p[..., 0] + 2.7)
                   * np.sin(16.3 * p[..., 1] + 0.4)
                   * np.sin(13.1 * p[..., 2] + 5.0))
        base = np.clip(base * (0.8 + 0.28 * detail[..., None]
                               + 0.12 * detail2[..., None]), 0.0, 1.0)
        box_tint = np.array([0.9, 0.4, 0.2])
        return np.where(box_mask[..., None], 0.3 * base + 0.7 * box_tint,
                        base).astype(np.float32)


def _lookat_c2w(eye, target, up=(0.0, 0.0, 1.0)):
    """c2w with camera -z toward target, +y ~ up (z-up world)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    z = -fwd
    x = np.cross(np.asarray(up, np.float64), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


class SyntheticDataset:
    """Reader-API-compatible procedural sequence (lazy per-frame render)."""

    def __init__(self, cfg, args=None, scale: float = 1.0):
        c = cfg["cam"]
        self.H, self.W = c["H"], c["W"]
        self.fx, self.fy = c["fx"], c["fy"]
        self.cx, self.cy = c["cx"], c["cy"]
        self.crop_edge = c.get("crop_edge", 0)
        self.scale = scale
        self.n_img = cfg["data"].get("n_frames", 60)
        self.noise_depth = cfg["data"].get("depth_noise", 0.0)
        self.seed = cfg["data"].get("seed", 0)
        self.orbit = cfg["data"].get("orbit", 0.35)  # fraction of full turn
        self.scene = SyntheticScene()
        self.poses = self._trajectory()
        self.input_folder = cfg["data"].get("input_folder", "")

    def _trajectory(self):
        poses = []
        n = self.n_img
        for i in range(n):
            a = 2 * np.pi * i / max(n, 1) * self.orbit
            eye = (1.2 * np.cos(a), 1.2 * np.sin(a), 0.35 + 0.1 * np.sin(2 * a))
            target = (0.4 * np.cos(a + 2.3), 0.4 * np.sin(a + 2.3), 0.0)
            c2w = _lookat_c2w(eye, target)
            c2w[:3, 3] *= self.scale
            poses.append(c2w.astype(np.float32))
        return poses

    def __len__(self):
        return self.n_img

    def render_frame(self, c2w_unscaled: np.ndarray):
        H, W = self.H, self.W
        j, i = np.meshgrid(np.arange(H, dtype=np.float64),
                           np.arange(W, dtype=np.float64), indexing="ij")
        dirs = np.stack([(i - self.cx) / self.fx,
                         -(j - self.cy) / self.fy,
                         -np.ones_like(i)], axis=-1)
        R = c2w_unscaled[:3, :3]
        rays_d = dirs @ R.T
        rays_o = np.broadcast_to(c2w_unscaled[:3, 3], rays_d.shape)
        t, pts, box_mask = self.scene.ray_cast(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3))
        color = self.scene.color(pts, box_mask).reshape(H, W, 3)
        depth = t.reshape(H, W).astype(np.float32)
        return color, depth

    def __getitem__(self, index):
        c2w = self.poses[index].copy()
        c2w_unscaled = c2w.copy()
        c2w_unscaled[:3, 3] /= self.scale
        color, depth = self.render_frame(c2w_unscaled)
        depth = depth * self.scale
        if self.noise_depth > 0:
            rng = np.random.default_rng(self.seed + index)
            depth = depth + rng.normal(
                0, self.noise_depth, depth.shape).astype(np.float32)
        edge = self.crop_edge
        if edge > 0:
            color = color[edge:-edge, edge:-edge]
            depth = depth[edge:-edge, edge:-edge]
        return index, color, depth, c2w
