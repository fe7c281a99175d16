"""Real-chip latency model for the v5e-8 ray-sharded mapping path.

The multi-chip design (parallel/make_sharded_mapping_step, engine shard_map)
splits the per-iteration ray batch across chips and psums gradients over ICI.
Multi-chip hardware is not reachable from this image, so the prediction is
built from measurements a single chip CAN make:

  1. Time the flagship fused-VG mapping iteration at ray counts
     R in {640, 1280, 2560, 5120} (TILE=128 -> 5/10/20/40 tiles).
  2. Fit t(R) = a + b*R  (a = fixed per-iteration cost: sampling, sort/CDF
     XLA middle, Adam, scan glue; b = per-ray kernel slope).
  3. Predict an n-chip iteration: t_n = a + b*(R/n) + t_psum(n), with
     t_psum bounded by the gradient pytree size over v5e ICI.

Prints the measured table, the fit, and the predicted v5e-8 mapping it/s +
bench-equivalent FPS. Results land in PERF.md (round 4).

Run ONLY with the TPU otherwise idle (single-client axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))


def main():
    from pointnerf_slam_tpu.engine.mapper import make_mapper_step
    from pointnerf_slam_tpu.engine.state import EngineConfig
    from pointnerf_slam_tpu.models import MLPConfig, init_mlp
    from pointnerf_slam_tpu.render import RenderConfig

    H, W = 680, 1200
    model_cfg = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256,
                          skips=(), n_blocks=4)
    rcfg = RenderConfig(N_samples=32, N_surface=0, N_importance=12)
    params = init_mlp(jax.random.PRNGKey(0), model_cfg)
    bound = jnp.asarray([[-3.5, 3.5]] * 3)
    key = jax.random.PRNGKey(1)
    color = jax.random.uniform(key, (H, W, 3))
    depth = jax.random.uniform(key, (H, W), minval=0.5, maxval=3.0)
    F = 6
    colors = jnp.broadcast_to((color * 255).astype(jnp.uint8), (F, H, W, 3))
    depths = jnp.broadcast_to(depth, (F, H, W))
    cams = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 2.5]), (F, 1))
    valid = jnp.ones((F,), bool)
    ba_mask = jnp.zeros((F,), bool)

    INNER = 100
    rows = []
    for rays in (640, 1280, 2560, 5120):
        ecfg = EngineConfig(H=H, W=W, fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                            mapping_pixels=rays, mapping_window_size=5,
                            weak_depth=False, depth_supervision=True)
        step = make_mapper_step(model_cfg, rcfg, ecfg, F)
        p, _, _, ls = step(params, {}, colors, depths, cams, valid, ba_mask,
                           bound, key, INNER)
        assert np.isfinite(float(ls[-1]))  # sync; compile excluded
        t0 = time.time()
        reps = 3
        for i in range(reps):
            p, _, _, ls = step(p, {}, colors, depths, cams, valid, ba_mask,
                               bound, jax.random.PRNGKey(2 + i), INNER)
            float(ls[-1])
        per_iter = (time.time() - t0) / (reps * INNER)
        rows.append((rays, per_iter))
        print(f"rays={rays:5d}  {per_iter*1e3:6.2f} ms/iter "
              f"({1/per_iter:5.1f} it/s)")

    R = np.array([r for r, _ in rows], float)
    T = np.array([t for _, t in rows], float)
    b, a = np.polyfit(R, T, 1)
    print(f"fit: t(R) = {a*1e3:.2f} ms + {b*1e6:.3f} us/ray  "
          f"(residual max {np.abs(a + b*R - T).max()*1e3:.2f} ms)")

    # psum bound: gradient pytree bytes, v5e all-reduce 2(n-1)/n * S / BW
    n_bytes = sum(x.size * 4 for x in jax.tree_util.tree_leaves(params))
    ici_bw = 45e9  # v5e per-direction ICI ~45 GB/s (public v5e spec, 1 axis)
    for n in (2, 4, 8):
        t_psum = 2 * (n - 1) / n * n_bytes / ici_bw + 5e-6 * np.log2(n)
        t_n = a + b * 5120 / n + t_psum
        print(f"predict n={n}: {t_n*1e3:6.2f} ms/iter ({1/t_n:5.1f} it/s), "
              f"psum {t_psum*1e6:.0f} us "
              f"[grad {n_bytes/1e6:.2f} MB]")
    # bench-equivalent cycle: 50 track iters + 300 map iters per 5 frames;
    # tracking shards the same way (same a+b structure, lighter loss)
    print("note: bench FPS = 5 / (50*t_track + 300*t_map); see PERF.md")


if __name__ == "__main__":
    main()
