"""Depth sampling along rays: stratified, surface-band, and importance.

Static-shape, jit-friendly equivalents of the reference's per-ray sampling
(src/utils/Renderer.py:63-201, src/common.py:19-63). All sample counts are
trace-time constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_far_bound(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  bound: jnp.ndarray) -> jnp.ndarray:
    """Per-ray exit distance from the scene AABB, + 0.01.

    Capability of src/utils/Renderer.py:98-105: t = (bound - o)/d per axis,
    take max over the two slab ends, min over axes. Non-differentiable by
    construction (the reference computes it under no_grad).

    Args:
      rays_o, rays_d: (N, 3).
      bound: (3, 2) scene AABB.
    Returns:
      (N,) far distances.
    """
    o = jax.lax.stop_gradient(rays_o)[..., None]   # (N, 3, 1)
    d = jax.lax.stop_gradient(rays_d)[..., None]   # (N, 3, 1)
    # Guard exact zeros so 0/0 does not yield NaN (reference rays always have
    # d_z = -1 so it never hits this; synthetic rays might).
    d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t = (bound[None] - o) / d                      # (N, 3, 2)
    far = jnp.min(jnp.max(t, axis=2), axis=1)      # (N,)
    return far + 0.01


def stratified_zvals(key, near: jnp.ndarray, far: jnp.ndarray, N_samples: int,
                     lindisp: bool = False, perturb: float = 0.0):
    """(N, N_samples) z values, linearly (or in disparity) spaced in [near, far].

    near/far broadcast against (N, 1). Optional stratified perturbation
    (src/utils/Renderer.py:157-171).
    """
    t_vals = jnp.linspace(0.0, 1.0, N_samples)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def surface_zvals(gt_depth: jnp.ndarray, N_surface: int):
    """(N, N_surface) surface-band z values around per-ray depth.

    For rays with depth > 0: linspace over [0.95 d, 1.05 d].
    For rays with depth == 0: linspace over [0.001, max(depth)] — the
    colorize-interpolated-geometry branch of src/utils/Renderer.py:117-155.
    """
    t = jnp.linspace(0.0, 1.0, N_surface)
    d = gt_depth[..., None]
    z_surf = 0.95 * d * (1.0 - t) + 1.05 * d * t
    far_zero = jnp.max(gt_depth)
    z_zero = 0.001 * (1.0 - t) + far_zero * t
    return jnp.where(d > 0, z_surf, z_zero[None])


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, N_samples: int,
               det: bool = False):
    """Inverse-CDF importance sampling (NeRF §5.2; src/common.py:19-63).

    Args:
      bins: (N, M) bin edges (z mid-points).
      weights: (N, M-1) un-normalized weights per bin.
      N_samples: number of importance samples.
      det: deterministic (linspace) u's instead of uniform randoms.
    Returns:
      (N, N_samples) sampled z values. Non-differentiable (caller detaches
      in the reference; we stop_gradient here).
    """
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, M)

    if det:
        u = jnp.linspace(0.0, 1.0, N_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,))

    # Batched searchsorted(side='right') as a dense comparison — M is tiny
    # (tens of samples), so the O(M*K) compare lowers to one vectorized op on
    # the VPU instead of a serial scan.
    inds = jnp.sum((cdf[..., :, None] <= u[..., None, :]).astype(jnp.int32),
                   axis=-2)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    # Gathers as one-hot contractions: TPU's irregular-gather path costs
    # ~15% of a whole mapping iteration (profiled); a (K, M) one-hot einsum
    # is dense VPU/MXU work instead.
    M = cdf.shape[-1]
    iota = jnp.arange(M)
    oh_below = (below[..., :, None] == iota).astype(cdf.dtype)  # (N, K, M)
    oh_above = (above[..., :, None] == iota).astype(cdf.dtype)
    cdf_below = jnp.einsum("...km,...m->...k", oh_below, cdf)
    cdf_above = jnp.einsum("...km,...m->...k", oh_above, cdf)
    bins_below = jnp.einsum("...km,...m->...k", oh_below, bins)
    bins_above = jnp.einsum("...km,...m->...k", oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    return jax.lax.stop_gradient(samples)
