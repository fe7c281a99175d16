"""Orientation-consistency match filtering
(capability of src/rotation_histogram.py:24-88: 30-bin histogram of match
orientation deltas; only matches in the top-3 bins survive)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_BINS = 30


@partial(jax.jit,
         static_argnames=("num_valid_bins", "min_keep", "min_frac"))
def filter_matches_with_histogram_orientation(angles_ref, angles_cur,
                                              match_valid,
                                              num_valid_bins: int = 3,
                                              min_keep: int = 0,
                                              min_frac: float = 0.0):
    """Keep matches whose orientation delta falls in the top-k histogram
    bins.

    Args:
      angles_ref, angles_cur: (M,) keypoint orientations (radians).
      match_valid: (M,) bool.
      min_keep: starvation guard — if fewer than this many matches survive
        the gate, return match_valid unchanged instead. 0 = pure reference
        semantics (always apply).
      min_frac: informativeness guard — the gate assumes a consistent
        in-plane rotation, so with GOOD orientations the top-k bins capture
        most matches; a near-uniform histogram (top-k keeps ~k/NUM_BINS)
        means the orientation estimates are noise (e.g. intensity-centroid
        on smooth texture) and filtering by them destroys genuine matches.
        Apply the filter only when it keeps at least this fraction of the
        valid matches. 0 = always apply.
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
    filtered = match_valid & bin_ok[bins]
    if min_keep > 0 or min_frac > 0.0:
        kept = jnp.sum(filtered)
        starved = kept < min_keep
        if min_frac > 0.0:
            n_valid = jnp.maximum(jnp.sum(match_valid), 1)
            starved = starved | (kept < min_frac * n_valid)
        return jnp.where(starved, match_valid, filtered)
    return filtered
