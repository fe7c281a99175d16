"""Pseudo-depth map splatting.

The *intended* behavior of compute_pusdo_depth_np (src/Tracker.py:571-597;
its shipped nested loop is buggy — PARITY.md #3): each triangulated keypoint
writes its depth into a depth_patch x depth_patch neighborhood of its pixel;
keypoints whose full patch would cross the border write only their own pixel.
Implemented as one static scatter (K * patch^2 writes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("H", "W", "patch"))
def splat_pseudo_depth(uv: jnp.ndarray, depth: jnp.ndarray,
                       valid: jnp.ndarray, H: int, W: int,
                       patch: int = 5) -> jnp.ndarray:
    """Splat keypoint depths into an (H, W) pseudo-depth map.

    Args:
      uv: (K, 2) pixel coords (u = column/x, v = row/y).
      depth: (K,) camera depths.
      valid: (K,) bool.
      patch: half-size (the reference writes [c-p, c+p) rows/cols).
    Returns:
      (H, W) float32 map, 0 where no splat landed.
    """
    u = uv[:, 0]
    v = uv[:, 1]
    full_ok = ((v - patch > 0) & (u - patch > 0)
               & (v + patch < H) & (u + patch < W))
    center_ok = (v > 0) & (u > 0) & (v < H) & (u < W)

    off = jnp.arange(-patch, patch)
    ov, ou = jnp.meshgrid(off, off, indexing="ij")
    ov = ov.reshape(-1)
    ou = ou.reshape(-1)
    P2 = ov.shape[0]

    vv = v[:, None].astype(jnp.int32) + ov[None, :]
    uu = u[:, None].astype(jnp.int32) + ou[None, :]
    # full patch only when it fits; otherwise only the center pixel
    center = (ov == 0) & (ou == 0)
    write = (valid[:, None]
             & (full_ok[:, None] | (center_ok[:, None] & center[None, :])))
    vv = jnp.clip(vv, 0, H - 1)
    uu = jnp.clip(uu, 0, W - 1)
    flat_idx = (vv * W + uu).reshape(-1)
    vals = jnp.broadcast_to(depth[:, None], (depth.shape[0], P2)).reshape(-1)
    w = write.reshape(-1)

    out = jnp.zeros((H * W,), jnp.float32)
    # invalid writes are routed to an out-of-range index (dropped by scatter)
    flat_idx = jnp.where(w, flat_idx, H * W)
    out = out.at[flat_idx].set(vals.astype(jnp.float32), mode="drop")
    return out.reshape(H, W)
