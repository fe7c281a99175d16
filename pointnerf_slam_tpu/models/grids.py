"""Hierarchical feature-grid initialization for NICE mode.

Capability of the reference's grid_init (src/NICE_SLAM.py:224-316, the
`nice` path): one feature grid per level (coarse/middle/fine/color), sized
by the scene bound over the level's voxel length, values ~ N(0, 0.01).
Grids are stored channel-last (Dx, Dy, Dz, C) for the TPU trilinear sampler
(pointnerf_slam_tpu.ops.grid_sample).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init_grids(key, cfg: dict, bound: np.ndarray) -> dict:
    """Build the c_grid dict for NICE mode.

    Args:
      cfg: full config (reads grid_len.*, model.c_dim,
           model.coarse_bound_enlarge, coarse flag).
      bound: (3, 2) scaled scene bound.
    Returns: {'grid_coarse': (Dx,Dy,Dz,C), 'grid_middle': ..., ...}
    """
    c_dim = cfg["model"]["c_dim"]
    enlarge = cfg["model"]["coarse_bound_enlarge"]
    bound = np.asarray(bound)
    lengths = bound[:, 1] - bound[:, 0]

    def shape_for(grid_len, scale=1):
        return tuple(int(math.ceil(l * scale / grid_len)) + 1
                     for l in lengths)

    levels = {}
    if cfg["coarse"]:
        levels["grid_coarse"] = shape_for(cfg["grid_len"]["coarse"], enlarge)
    levels["grid_middle"] = shape_for(cfg["grid_len"]["middle"])
    levels["grid_fine"] = shape_for(cfg["grid_len"]["fine"])
    levels["grid_color"] = shape_for(cfg["grid_len"]["color"])

    keys = jax.random.split(key, len(levels))
    return {name: 0.01 * jax.random.normal(k, shape + (c_dim,))
            for k, (name, shape) in zip(keys, levels.items())}


def make_frustum_mask_fn(shape, H: int, W: int, fx, fy, cx, cy):
    """Build the jitted NICE frustum-feature mask for one grid level.

    Capability of the reference get_mask_from_c2w (src/Mapper.py:129-200):
    a grid cell is optimizable iff its center projects into the current
    frame (edge 0), lies in front of the camera, and passes the depth test
    -z <= depth(u, v) + 0.5 (bilinear depth lookup, zero samples filled
    with the max depth — cv2.remap at Mapper.py:170 with zero border), OR
    lies within 0.5 (scaled) of the camera center (Mapper.py:189-195).
    The coarse grid is never masked (Mapper.py:149-151): callers pass an
    all-ones mask for it.

    Args:
      shape: grid spatial shape (Dx, Dy, Dz) — channel-last layout.
    Returns: jitted fn(bound (3,2), c2w (4,4), depth (H,W)) -> (Dx,Dy,Dz,1)
      float32 mask.
    """
    Dx, Dy, Dz = shape

    @jax.jit
    def mask_fn(bound, c2w, depth):
        xs = jnp.linspace(bound[0, 0], bound[0, 1], Dx)
        ys = jnp.linspace(bound[1, 0], bound[1, 1], Dy)
        zs = jnp.linspace(bound[2, 0], bound[2, 1], Dz)
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
        pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)

        w2c = jnp.linalg.inv(c2w)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        # reference: cam_cord[:,0] *= -1; uv = K @ cam; z = uv[2] + 1e-5
        z = cam[:, 2] + 1e-5
        u = (fx * (-cam[:, 0]) + cx * z) / z
        v = (fy * cam[:, 1] + cy * z) / z

        # bilinear depth sample, zero outside the image (cv2.remap border 0)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)
        flat = depth.reshape(-1)

        def tap(vi, ui):
            ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
            return jnp.where(ok, jnp.take(flat, idx), 0.0)

        d = (tap(v0i, u0i) * (1 - fu) * (1 - fv)
             + tap(v0i, u0i + 1) * fu * (1 - fv)
             + tap(v0i + 1, u0i) * (1 - fu) * fv
             + tap(v0i + 1, u0i + 1) * fu * fv)
        # zero-depth rays get the maximum sampled depth (Mapper.py:181-182)
        d = jnp.where(d == 0, jnp.max(d), d)

        in_img = (u > 0) & (u < W) & (v > 0) & (v < H)
        mask = in_img & (0 <= -z) & (-z <= d + 0.5)
        # feature cells near the camera center (Mapper.py:189-195)
        dist2 = jnp.sum((pts - c2w[:3, 3]) ** 2, axis=1)
        mask = mask | (dist2 < 0.25)
        return mask.astype(jnp.float32).reshape(Dx, Dy, Dz, 1)

    return mask_fn
