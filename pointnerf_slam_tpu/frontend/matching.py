"""Two-way nearest-neighbor descriptor matching.

Capability of the reference's nn_match_two_way (src/Tracker.py:398-440,
src/demo_superpoint.py:318-360): L2 distance on unit-normalized descriptors
via one dense matmul (already a dense O(N^2) dot in the reference — it maps
straight onto the MXU), mutual-NN check, distance threshold.

Static shapes: both sides padded to fixed K with validity masks; outputs a
fixed-length match table with a validity column.
"""

from __future__ import annotations

import jax.numpy as jnp


def match_two_way(desc1: jnp.ndarray, valid1: jnp.ndarray,
                  desc2: jnp.ndarray, valid2: jnp.ndarray,
                  nn_thresh: float = 0.7):
    """Mutual-NN matching.

    Args:
      desc1: (K1, D) unit-normalized descriptors; valid1: (K1,) bool.
      desc2: (K2, D); valid2: (K2,) bool.
      nn_thresh: descriptor L2 distance threshold (reference uses 0.7).
    Returns:
      idx2: (K1,) best match in 2 for each 1.
      match_valid: (K1,) bool — mutual NN, below threshold, both ends valid.
      scores: (K1,) distances.
    """
    sim = jnp.clip(desc1 @ desc2.T, -1.0, 1.0)
    dmat = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0))
    big = jnp.float32(1e6)
    dmat = jnp.where(valid1[:, None] & valid2[None, :], dmat, big)

    idx2 = jnp.argmin(dmat, axis=1)
    scores = jnp.take_along_axis(dmat, idx2[:, None], axis=1)[:, 0]
    idx1_back = jnp.argmin(dmat, axis=0)  # (K2,)
    mutual = idx1_back[idx2] == jnp.arange(desc1.shape[0])
    match_valid = mutual & (scores < nn_thresh) & valid1 & valid2[idx2]
    return idx2, match_valid, scores
