"""Probe: axon-tunnel H2D transfer cost for per-frame SLAM tensors.

Quantifies why the engine quantizes frame uploads (PARITY #24): times
f32 color+depth (the old path, ~13 MB/frame) vs u8+u16 (+on-device
decode) at Replica resolution, plus the raw dispatch floor.

Run ONLY when no other TPU job is live (single-client tunnel).
"""
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", _CACHE)
import jax.numpy as jnp
import numpy as np

H, W = 680, 1200
color = np.random.default_rng(0).random((H, W, 3), np.float32)
depth = np.random.default_rng(1).random((H, W), np.float32) * 4.0
color_u8 = np.clip(color * 255, 0, 255).astype(np.uint8)
depth_u16 = (depth / (4.0 / 65535.0)).astype(np.uint16)


@jax.jit
def decode(c_u8, d_u16, q):
    return c_u8.astype(jnp.float32) / 255.0, d_u16.astype(jnp.float32) * q


def timeit(label, fn, n=10):
    fn()  # warm (compile + first transfer)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    # force completion: float() of a small reduction (block_until_ready is
    # unreliable over axon)
    s = float(jnp.sum(out[-1]) if isinstance(out, tuple) else jnp.sum(out))
    dt = (time.time() - t0) / n
    print(f"{label:38s} {dt * 1e3:8.1f} ms/frame")
    return dt


print(f"frame {H}x{W}: f32 {color.nbytes + depth.nbytes:,} B, "
      f"u8+u16 {color_u8.nbytes + depth_u16.nbytes:,} B")
timeit("dispatch floor (1 f32 scalar)", lambda: jnp.asarray(1.0))
timeit("f32 color+depth (old path)",
       lambda: (jnp.asarray(color), jnp.asarray(depth)))
timeit("u8+u16 upload only",
       lambda: (jnp.asarray(color_u8), jnp.asarray(depth_u16)))
timeit("u8+u16 + on-device decode (new path)",
       lambda: decode(jnp.asarray(color_u8), jnp.asarray(depth_u16),
                      jnp.float32(4.0 / 65535.0)))
