"""TPU probe: fused-VG mapper/tracker ms/iter vs resample_every K.

Run ONLY with the chip idle (single-client axon tunnel):
    python scripts/_tpu_resample_probe.py

Measures the steady-state per-iteration cost of the engine mapper and
tracker steps at the flagship budget (bench.py workload: 680x1200,
5000+120-pad rays, 32+12 samples, 256x4 MLP) for K in {1, 2, 4[, 5]}.
PERF.md round-3 ablation: at K=1 the p1 kernel is ~1.1 ms and the XLA
middle ~1.0 ms of the 11.0 ms/iter; K=4 should remove ~3/4 of both plus
the per-frame sampling/gather.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)


def main():
    from pointnerf_slam_tpu.engine.mapper import make_mapper_step
    from pointnerf_slam_tpu.engine.state import EngineConfig
    from pointnerf_slam_tpu.engine.tracker import make_tracking_step
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
    cam0 = jnp.array([1.0, 0, 0, 0, 0, 0, 2.5])

    def base_ecfg(**kw):
        return EngineConfig(
            H=H, W=W, fx=600.0, fy=600.0, cx=599.5, cy=339.5,
            tracking_pixels=5000, num_cam_iters=50, cam_lr=1e-3,
            mapping_pixels=5000, mapping_window_size=5,
            weak_depth=False, depth_supervision=True, **kw)

    N_INNER = 100
    for k in (1, 2, 4):
        step = make_mapper_step(model_cfg, rcfg,
                                base_ecfg(map_resample_every=k), F)
        p, *_ = step(params, {}, colors, depths, cams, valid, ba_mask,
                     bound, jax.random.PRNGKey(2), N_INNER)
        float(jax.tree_util.tree_leaves(p)[0][0].sum())  # sync
        t0 = time.time()
        reps = 3
        for r in range(reps):
            p, _, _, ls = step(params, {}, colors, depths, cams, valid,
                               ba_mask, bound, jax.random.PRNGKey(3 + r),
                               N_INNER)
        _ = float(np.asarray(ls)[-1])
        dt = (time.time() - t0) / (reps * N_INNER)
        print(f"mapper  K={k}: {dt*1e3:6.2f} ms/iter  "
              f"({1.0/dt:6.1f} it/s)", flush=True)

    for k in (1, 5):
        tstep = make_tracking_step(model_cfg, rcfg,
                                   base_ecfg(track_resample_every=k))
        bc, bl, _ = tstep(params, {}, cam0, color, depth, bound,
                          jax.random.PRNGKey(4))
        float(bl)
        t0 = time.time()
        reps = 6
        for r in range(reps):
            bc, bl, _ = tstep(params, {}, cam0, color, depth, bound,
                              jax.random.PRNGKey(5 + r))
        _ = float(bl)
        dt = (time.time() - t0) / (reps * 50)
        print(f"tracker K={k}: {dt*1e3:6.2f} ms/iter  "
              f"({1.0/dt:6.1f} it/s)", flush=True)


if __name__ == "__main__":
    main()
