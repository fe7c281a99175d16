"""Orientation-consistency match filtering
(capability of src/rotation_histogram.py:24-88: 30-bin histogram of match
orientation deltas; only matches in the top-3 bins survive)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_BINS = 30


@jax.jit
def filter_matches_with_histogram_orientation(angles_ref, angles_cur,
                                              match_valid,
                                              num_valid_bins: int = 3):
    """Keep matches whose orientation delta falls in the top-k histogram
    bins.

    Args:
      angles_ref, angles_cur: (M,) keypoint orientations (radians).
      match_valid: (M,) bool.
    Returns: (M,) bool filtered validity.
    """
    two_pi = 2.0 * jnp.pi
    delta = jnp.mod(angles_cur - angles_ref, two_pi)
    bins = jnp.clip((delta / two_pi * NUM_BINS).astype(jnp.int32), 0,
                    NUM_BINS - 1)
    counts = jnp.zeros((NUM_BINS,), jnp.int32).at[bins].add(
        match_valid.astype(jnp.int32))
    top = jax.lax.top_k(counts, num_valid_bins)[0]
    thresh = top[-1]
    bin_ok = counts >= jnp.maximum(thresh, 1)
    return match_valid & bin_ok[bins]
