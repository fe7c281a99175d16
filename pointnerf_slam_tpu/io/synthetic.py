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
    """Analytic furnished room (v3).

    v1/v2 had ONE interior box; render-based tracking on that scene was
    structurally starved (measured, scripts/_tpu_loss_landscape.py): under
    the orbit's look-at motion, rotation flow cancels the translation flow
    at the target depth and the near-empty room offers almost no depth
    parallax — frame-1 data fit the frame-0 pose better than its own gt
    pose, for BOTH the depth and color tracking losses. Replica rooms (the
    reference's benchmark, src/utils/datasets.py Replica reader) are
    furnished — occlusion edges and depth structure everywhere. v3 adds
    wall cabinets, a central table, a full-height pillar and floor crates
    so tangential motion produces depth parallax across the image."""

    room_half: float = 2.0                 # room is [-h, h]^3
    # interior furniture AABBs (lo, hi); the first is the original v1 box.
    # None intersects the camera path (orbit radius 1.02-1.38, z 0.25-0.45).
    boxes: tuple = (
        ((-0.6, -2.0, -0.7), (0.4, -0.8, 0.3)),      # sofa, -y wall
        ((-0.4, 0.15, -2.0), (0.3, 0.75, -0.7)),     # central table
        ((1.55, -0.5, -2.0), (2.0, 0.6, 0.9)),       # cabinet, +x wall
        ((-1.1, 1.6, -2.0), (-0.2, 2.0, 1.2)),       # shelf, +y wall
        ((-2.0, -0.9, -2.0), (-1.5, -0.1, -0.9)),    # crate, -x wall
        ((1.4, 1.4, -2.0), (1.8, 1.8, 2.0)),         # corner pillar
        ((0.55, 0.35, -2.0), (0.95, 0.75, -1.55)),   # floor crate
    )

    # first-box aliases: the v1 single-box API, still used by tests/tools
    @property
    def box_lo(self) -> tuple:
        return self.boxes[0][0]

    @property
    def box_hi(self) -> tuple:
        return self.boxes[0][1]

    def ray_cast(self, rays_o: np.ndarray, rays_d: np.ndarray):
        """Nearest-hit parameter t and hit points for (N, 3) rays.

        The room is hit from inside (exit of its AABB); each furniture box
        from outside (entry of its AABB). Returns (t, points, hit_box_mask)
        where the mask marks rays whose nearest hit is furniture."""
        o, d = rays_o, rays_d
        d = np.where(np.abs(d) < 1e-12, 1e-12, d)

        h = self.room_half
        t_room = np.min(np.max(
            (np.array([[-h, h]]) - o[..., None]) / d[..., None], axis=-1),
            axis=-1)

        t = t_room
        box_hit_any = np.zeros(t.shape, bool)
        for lo, hi in self.boxes:
            t1 = (np.asarray(lo) - o) / d
            t2 = (np.asarray(hi) - o) / d
            t_near = np.max(np.minimum(t1, t2), axis=-1)
            t_far = np.min(np.maximum(t1, t2), axis=-1)
            hit = (t_near <= t_far) & (t_near > 1e-6) & (t_near < t)
            t = np.where(hit, t_near, t)
            box_hit_any |= hit
        pts = o + d * t[..., None]
        return t, pts, box_hit_any

    def color(self, pts: np.ndarray, box_mask: np.ndarray) -> np.ndarray:
        """Procedural texture in [0, 1]: a smooth low-frequency base plus a
        SHARP 3-D-anchored cell pattern (v2).

        The v1 texture was purely smooth sinusoids (finest ~16 rad/m =
        ~120 px/cycle at 2 m, fx 600). Harris/SuperPoint extrema of a smooth
        texture are image-space artifacts that DRIFT on the surface as the
        perspective changes, so two-view correspondences carried ~0.5 px of
        effective localization noise — measured to break the small-baseline
        essential-matrix translation estimate (t 80-120 deg off) and starve
        the color tracking loss. Real benchmark scenes (Replica) have sharp
        texture; v2 adds step edges anchored to fixed 3-D cell boundaries
        (per-cell hashed brightness, ~8 cm cells = ~25 px at 2 m) whose
        corners are view-invariant 3-D points."""
        p = pts
        base = 0.5 + 0.5 * np.stack([
            np.sin(1.7 * p[..., 0] + 0.9 * p[..., 1]),
            np.sin(1.3 * p[..., 1] + 1.1 * p[..., 2] + 2.0),
            np.sin(2.1 * p[..., 2] + 0.7 * p[..., 0] + 4.0),
        ], axis=-1)
        detail = (np.sin(7.3 * p[..., 0] + 0.5) * np.sin(8.1 * p[..., 1] + 1.2)
                  * np.sin(6.7 * p[..., 2] + 2.1))
        base = np.clip(base * (0.85 + 0.25 * detail[..., None]), 0.0, 1.0)
        # sharp component: hashed-brightness 3-D cells (two incommensurate
        # scales so corner spacing is irregular); cheap integer-lattice hash
        def cells(freq, seed):
            c = np.floor(p * freq)
            h = np.sin(c[..., 0] * 12.9898 + c[..., 1] * 78.233
                       + c[..., 2] * 37.719 + seed) * 43758.5453
            return h - np.floor(h)  # uniform-ish in [0, 1)
        sharp = 0.65 * cells(12.0, 0.0) + 0.35 * cells(4.7, 9.1)
        tex = base * (0.70 + 0.45 * sharp[..., None])
        tex = np.clip(tex, 0.0, 1.0)
        box_tint = np.array([0.9, 0.4, 0.2])
        return np.where(box_mask[..., None],
                        np.clip(0.3 * tex + 0.7 * box_tint
                                * (0.75 + 0.4 * sharp[..., None]), 0, 1),
                        tex).astype(np.float32)


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
        # on-disk frame cache (data.frame_cache_dir): the analytic ray cast
        # over H*W pixels is host numpy work (~1-2 s/frame at Replica
        # resolution) repeated on every run/restart of the same spec; real
        # datasets read PNGs instead. Cache key = everything the rendered
        # images depend on, so different specs never collide.
        self.cache_dir = cfg["data"].get("frame_cache_dir", "")

    def _cache_key(self) -> str:
        import hashlib
        s = self.scene
        spec = ("v3", self.H, self.W, self.fx, self.fy, self.cx, self.cy,
                self.n_img, self.orbit, s.room_half, s.boxes)
        return hashlib.sha1(repr(spec).encode()).hexdigest()[:16]

    def _render_cached(self, index: int, c2w_unscaled: np.ndarray):
        if not self.cache_dir:
            return self.render_frame(c2w_unscaled)
        import os
        d = os.path.join(self.cache_dir, self._cache_key())
        path = os.path.join(d, f"{index:05d}.npz")
        if os.path.exists(path):
            z = np.load(path)
            return z["color"], z["depth"]
        color, depth = self.render_frame(c2w_unscaled)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".{os.getpid()}.tmp.npz"
        np.savez(tmp, color=color.astype(np.float32),
                 depth=depth.astype(np.float32))
        os.replace(tmp, path)
        return color.astype(np.float32), depth.astype(np.float32)

    def _trajectory(self):
        poses = []
        n = self.n_img
        for i in range(n):
            a = 2 * np.pi * i / max(n, 1) * self.orbit
            # breathing orbit (v3): the radial term adds camera motion ALONG
            # view depth — pure look-at orbits are the degenerate case where
            # rotation flow cancels translation flow at the target depth and
            # the depth tracking loss has no signal; handheld benchmark
            # trajectories (Replica/TUM) always carry a depth component
            r = 1.2 + 0.18 * np.sin(3 * a)
            eye = (r * np.cos(a), r * np.sin(a), 0.35 + 0.1 * np.sin(2 * a))
            target = (0.4 * np.cos(a + 2.3), 0.4 * np.sin(a + 2.3),
                      0.1 * np.sin(a + 0.7))
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
        color, depth = self._render_cached(index, c2w_unscaled)
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
