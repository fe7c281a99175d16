"""Positional embeddings for the scene decoders.

Capabilities mirrored (behavior, not code) from the reference decoders
(src/conv_onet/models/decoder.py:7-67):
  - learnable Gaussian-Fourier features: sin(x @ B), B ~ N(0,1)*scale,
    default 93 dims / scale 25 (iMAP* uses this).
  - classic NeRF sin/cos positional embedding (pos_embedding_method='nerf').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_fourier(key, num_input_channels: int = 3, mapping_size: int = 93,
                 scale: float = 25.0):
    """Learnable Gaussian-Fourier projection matrix."""
    return {"B": jax.random.normal(key, (num_input_channels, mapping_size))
                 * scale}


def apply_fourier(params, x: jnp.ndarray) -> jnp.ndarray:
    """sin(x @ B). x: (N, d) -> (N, mapping_size).

    The matmul runs at HIGHEST precision: B's scale-25 entries amplify
    bf16 input rounding into ~0.05 rad phase errors through sin(); K=3 makes
    full precision free."""
    return jnp.sin(jnp.dot(x, params["B"],
                           precision=jax.lax.Precision.HIGHEST))


def nerf_positional_embedding(x: jnp.ndarray, multires: int,
                              log_sampling: bool = True) -> jnp.ndarray:
    """[x, sin(f_k x), cos(f_k x) ...] with multires frequency bands.

    Output dim = d * (2 * multires + 1).
    """
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    else:
        freqs = jnp.linspace(2.0 ** 0.0, 2.0 ** (multires - 1), multires)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)
