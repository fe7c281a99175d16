"""Trilinear feature-grid sampling (the NICE stack's F.grid_sample
equivalent, reference src/conv_onet/models/decoder.py:168-175).

Semantics matched to torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) on a 3-D grid:
  - normalized coord x in [-1, 1] maps to voxel index (x+1)/2*(Dx-1)
  - out-of-range coords clamp to the border voxel
  - the last coordinate of the sample point indexes the *last* grid axis
    in our layout (we store grids channel-last (Dx, Dy, Dz, C); the point's
    (x, y, z) index (Dx, Dy, Dz) respectively — no axis reversal to track).

Implemented as 8-corner gathers + weighted sum: XLA lowers the gathers to
efficient dynamic-slices and fuses the lerp chain; a Pallas variant can slot
in behind the same signature later.
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear_sample(grid: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    """Sample a channel-last 3-D feature grid at normalized points.

    Args:
      grid: (Dx, Dy, Dz, C) feature grid.
      p_nor: (N, 3) points in [-1, 1]^3 (align_corners=True convention).
    Returns:
      (N, C) interpolated features. Differentiable in both grid and points.
    """
    Dx, Dy, Dz, C = grid.shape
    dims = jnp.array([Dx, Dy, Dz], dtype=p_nor.dtype)
    # align_corners=True: -1 -> 0, +1 -> D-1
    idx = (p_nor + 1.0) * 0.5 * (dims - 1.0)
    # border padding: clamp continuous coords into [0, D-1]
    idx = jnp.clip(idx, 0.0, dims - 1.0)

    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([Dx - 1, Dy - 1, Dz - 1]))

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1, z1 = i1[:, 0], i1[:, 1], i1[:, 2]
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

    g = grid
    c000 = g[x0, y0, z0]
    c001 = g[x0, y0, z1]
    c010 = g[x0, y1, z0]
    c011 = g[x0, y1, z1]
    c100 = g[x1, y0, z0]
    c101 = g[x1, y0, z1]
    c110 = g[x1, y1, z0]
    c111 = g[x1, y1, z1]

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx
