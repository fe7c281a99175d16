"""Alpha compositing of raw field outputs along rays.

Numerical parity with the reference compositor (src/common.py:204-245) is
load-bearing for the acceptance metrics (SURVEY.md §7 "hard parts"):
  - last-interval distance sentinel 1e10
  - interval lengths scaled by ||rays_d||
  - occupancy mode: alpha = sigmoid(10 * raw)
  - density mode:   alpha = 1 - exp(-relu(raw) * dist)
  - transmittance epsilon 1e-10 inside the exclusive cumprod
  - depth variance = sum(w * (z - depth)^2)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                occupancy: bool = False):
    """Composite raw (N_rays, N_samples, 4) RGBA along rays.

    Returns:
      depth_map: (N_rays,) expected ray termination depth.
      depth_var: (N_rays,) depth variance (tracking-loss uncertainty weight).
      rgb_map:   (N_rays, 3).
      weights:   (N_rays, N_samples) per-sample compositing weights.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = raw[..., :-1]
    if occupancy:
        alpha = jax.nn.sigmoid(10.0 * raw[..., -1])
    else:
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., -1]) * dists)

    # exclusive cumprod of (1 - alpha + eps): transmittance up to each sample
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return depth_map, depth_var, rgb_map, weights
