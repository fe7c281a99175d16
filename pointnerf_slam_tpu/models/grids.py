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
