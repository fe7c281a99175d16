"""Ray generation and static-shape pixel sampling.

Camera convention matches the reference exactly: pixel (i, j) maps to camera
ray direction [(i-cx)/fx, -(j-cy)/fy, -1] (the -y,-z OpenGL-style convention
of src/common.py:74-89,248-266), rotated into world by c2w[:3,:3].

Dynamic-shape pixel selection in the reference (all pixels with pseudo-depth
> 0.01, src/Tracker.py:206-225) is replaced by a *static* budget of `n`
samples drawn uniformly-with-replacement from the valid set via a masked
categorical — identical in distribution per-sample and jit-stable. The loss
is rescaled by (n_valid / n) by callers so the expected SUM-loss matches the
reference's sum over all valid pixels (documented in PARITY.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_dirs_from_uv(i: jnp.ndarray, j: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixel coords (i=column/x, j=row/y) -> camera-frame ray directions (..., 3)."""
    return jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1)


def rays_from_uv(i, j, c2w, fx, fy, cx, cy):
    """Rays for pixel coords under pose c2w (..., 3, 4) or (..., 4, 4).

    Differentiable w.r.t. c2w (the tracking path backprops pose gradients
    through here; capability of src/common.py:74-89).

    Returns:
      rays_o: (..., 3) world-space origins.
      rays_d: (..., 3) world-space directions (not normalized, z=-1 scaled).
    """
    dirs = ray_dirs_from_uv(i, j, fx, fy, cx, cy)
    R = c2w[..., :3, :3]
    rays_d = jnp.einsum("...ij,...j->...i", R, dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(H: int, W: int, fx, fy, cx, cy, c2w):
    """Rays for the full image (H, W, 3) each (src/common.py:248-266)."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return rays_from_uv(i, j, c2w, fx, fy, cx, cy)


def sample_uv_uniform(key, W: int, H0: int, H1: int, W0: int, W1: int, n: int):
    """n flat full-image indices uniform-with-replacement from [H0,H1)x[W0,W1).

    Matches the reference's torch.randint over the flattened crop region
    (src/common.py:92-122). `W` is the full image width (for row-major
    flattening).
    """
    h = H1 - H0
    w = W1 - W0
    flat = jax.random.randint(key, (n,), 0, h * w)
    jj = flat // w + H0
    ii = flat % w + W0
    return (jj * W + ii).astype(jnp.int32)


def sample_uv_valid(key, valid_mask: jnp.ndarray, n: int):
    """n flat indices uniform-with-replacement over True entries of valid_mask.

    Static-shape replacement for the reference's take-all-valid-pixels
    (src/Tracker.py:206-225). If no pixel is valid, falls back to uniform.

    Implementation: inclusive count-CDF + searchsorted on uniform ranks —
    distribution-identical to a categorical over equal valid logits (both
    are uniform-with-replacement over the True set), but one O(HW) cumsum
    (loop-invariant in the tracker/mapper scans, hoisted by XLA) plus an
    O(n log HW) binary search, instead of the categorical's O(n * HW)
    gumbel-argmax EVERY iteration. At the flagship 680x1200 resolution the
    categorical was ~1.5 s/iter inside the weak-mode tracking scan and
    dominated the round-4 oracle run (PERF.md round 4: tracking 884.7 s of
    a 1485 s compute total).

    Args:
      valid_mask: (H, W) or (HW,) boolean.
      n: static sample count.
    Returns:
      flat indices (n,) int32 into the flattened mask, and n_valid (scalar).
    """
    m = valid_mask.reshape(-1)
    cum = jnp.cumsum(m.astype(jnp.int32))   # cum[i] = #valid in [0, i]
    n_valid = cum[-1]
    k_rank, k_any = jax.random.split(key)
    # rank r in [0, n_valid) -> index of the (r+1)-th valid pixel: the
    # first i with cum[i] > r (side='right' on the non-decreasing cum)
    r = jax.random.randint(k_rank, (n,), 0, jnp.maximum(n_valid, 1))
    idx = jnp.searchsorted(cum, r, side="right").astype(jnp.int32)
    idx_any = jax.random.randint(k_any, (n,), 0, m.shape[0],
                                 dtype=jnp.int32)
    return jnp.where(n_valid > 0, idx, idx_any), n_valid


def gather_pixels(flat_idx: jnp.ndarray, W: int, depth: jnp.ndarray,
                  color: jnp.ndarray):
    """Gather (i, j, depth, color) for flat row-major pixel indices."""
    jj = flat_idx // W
    ii = flat_idx % W
    d = depth.reshape(-1)[flat_idx]
    c = color.reshape(-1, 3)[flat_idx]
    return ii.astype(jnp.float32), jj.astype(jnp.float32), d, c
