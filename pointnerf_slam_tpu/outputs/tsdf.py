"""Projective TSDF integration + convex-hull scene bound.

Capability of the reference's get_bound_from_frames
(src/utils/Mesher.py:214-279: Open3D ScalableTSDFVolume integration over all
keyframes, then the convex hull of the fused surface, scaled by
clean_mesh_bound_scale, used to mask mesh vertices).

TPU-native: the TSDF is a dense voxel grid; integration is a gather — every
voxel projects into every keyframe, samples the depth map bilinearly, and
accumulates truncated SDF + weight. One vmapped pass per keyframe; the hull
is a host-side scipy ConvexHull over the near-surface voxels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("nx", "ny", "nz"))
def tsdf_integrate(depths, c2ws, fx, fy, cx, cy, bound, nx: int, ny: int,
                   nz: int, trunc: float = 0.12):
    """Integrate K depth maps into a TSDF grid over `bound`.

    Args:
      depths: (K, H, W) depth maps (NeRF z-buffer convention).
      c2ws: (K, 4, 4) camera-to-world (NeRF -y/-z convention).
      bound: (3, 2) AABB.
    Returns: (tsdf (nx,ny,nz), weight (nx,ny,nz))
    """
    H, W = depths.shape[1:]
    xs = jnp.linspace(bound[0, 0], bound[0, 1], nx)
    ys = jnp.linspace(bound[1, 0], bound[1, 1], ny)
    zs = jnp.linspace(bound[2, 0], bound[2, 1], nz)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # (V, 3)

    def integrate_one(carry, inputs):
        tsdf_sum, w_sum = carry
        depth, c2w = inputs
        w2c = jnp.linalg.inv(c2w)
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = -pc[:, 2]
        zsafe = jnp.maximum(z, 1e-6)
        u = pc[:, 0] / zsafe * fx + cx
        v = -pc[:, 1] / zsafe * fy + cy
        inside = (z > 1e-6) & (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
        fu = u - u0
        fv = v - v0
        d = (depth[v0, u0] * (1 - fu) * (1 - fv)
             + depth[v0, u0 + 1] * fu * (1 - fv)
             + depth[v0 + 1, u0] * (1 - fu) * fv
             + depth[v0 + 1, u0 + 1] * fu * fv)
        sdf = d - z
        w = (inside & (d > 0) & (sdf > -trunc)).astype(jnp.float32)
        tsdf = jnp.clip(sdf / trunc, -1.0, 1.0)
        return (tsdf_sum + tsdf * w, w_sum + w), None

    init = (jnp.zeros((pts.shape[0],)), jnp.zeros((pts.shape[0],)))
    (tsdf_sum, w_sum), _ = jax.lax.scan(integrate_one, init, (depths, c2ws))
    tsdf = tsdf_sum / jnp.maximum(w_sum, 1e-6)
    return tsdf.reshape(nx, ny, nz), w_sum.reshape(nx, ny, nz)


def scene_bound_hull(depths, c2ws, fx, fy, cx, cy, bound,
                     resolution: int = 64, scale: float = 1.02):
    """Convex hull of the fused surface, enlarged by `scale` about its
    centroid (clean_mesh_bound_scale). Returns a containment test
    fn(points) -> bool mask, or None when too few surface voxels."""
    from scipy.spatial import Delaunay

    bound = np.asarray(bound)
    tsdf, w = tsdf_integrate(
        jnp.asarray(depths), jnp.asarray(c2ws), fx, fy, cx, cy,
        jnp.asarray(bound, jnp.float32), resolution, resolution, resolution)
    tsdf = np.asarray(tsdf)
    w = np.asarray(w)
    near = (np.abs(tsdf) < 0.5) & (w > 0)
    idx = np.argwhere(near)
    if len(idx) < 8:
        return None
    step = (bound[:, 1] - bound[:, 0]) / (resolution - 1)
    pts = bound[:, 0] + idx * step
    centroid = pts.mean(0)
    pts = centroid + (pts - centroid) * scale
    try:
        tri = Delaunay(pts[np.random.default_rng(0).permutation(len(pts))
                           [:4000]])
    except Exception:
        return None
    return lambda q: tri.find_simplex(np.asarray(q, np.float64)) >= 0
