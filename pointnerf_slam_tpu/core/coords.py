"""Coordinate normalization and intrinsics helpers.

Capability of src/common.py:6-16 (intrinsics matrix) and
src/common.py:269-284 (normalize to [-1, 1] within the scene bound) — the
latter feeds the NICE feature-grid trilinear lookup.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def intrinsics_matrix(fx, fy, cx, cy) -> np.ndarray:
    """3x3 K from (fx, fy, cx, cy)."""
    K = np.eye(3)
    K[0, 0] = fx
    K[1, 1] = fy
    K[0, 2] = cx
    K[1, 2] = cy
    return K


def normalize_3d_coordinate(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Map points into [-1, 1]^3 w.r.t. the scene AABB.

    Args:
      p: (..., 3) points.
      bound: (3, 2) AABB [[x0,x1],[y0,y1],[z0,z1]].
    Returns:
      (..., 3) normalized points (pure; does not mutate like the reference).
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0
