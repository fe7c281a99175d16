"""Fused outer mapping loop (round 5, PERF.md): mapper_multi_step with
one key must produce BIT-IDENTICAL params/losses to the host loop of
sequential mapper_step calls over split(key) — the dispatch-fusion is a
pure latency optimization, not a semantics change."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.engine.mapper import make_mapper_step
from pointnerf_slam_tpu.engine.state import EngineConfig
from pointnerf_slam_tpu.models import MLPConfig, init_mlp
from pointnerf_slam_tpu.render import RenderConfig


def test_fused_outer_equals_sequential():
    H, W, F, O = 24, 32, 3, 3
    model_cfg = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=32,
                          skips=(), n_blocks=2)
    rcfg = RenderConfig(N_samples=8, N_surface=0, N_importance=4)
    ecfg = EngineConfig(H=H, W=W, fx=20.0, fy=20.0, cx=15.5, cy=11.5,
                        mapping_pixels=48, weak_depth=False,
                        depth_supervision=True, megakernel="off")
    params = init_mlp(jax.random.PRNGKey(0), model_cfg)
    key = jax.random.PRNGKey(7)
    bound = jnp.asarray([[-4.0, 4.0]] * 3)
    kk = jax.random.PRNGKey(3)
    colors = (jax.random.uniform(kk, (O, F, H, W, 3)) * 255).astype(
        jnp.uint8)
    depths = jax.random.uniform(kk, (O, F, H, W), minval=0.5, maxval=3.0)
    cams = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 2.5]), (O, F, 1))
    valid = jnp.ones((O, F), bool)
    ba = jnp.zeros((O, F), bool)

    step = make_mapper_step(model_cfg, rcfg, ecfg, F)
    multi = make_mapper_step(model_cfg, rcfg, ecfg, F, outer_fused=True)

    p_m, _, _, losses_m = multi(params, {}, colors, depths, cams, valid,
                                ba, bound, key, 4)
    keys = jax.random.split(key, O)
    p_s = params
    losses_s = []
    for o in range(O):
        p_s, _, _, ls = step(p_s, {}, colors[o], depths[o], cams[o],
                             valid[o], ba[o], bound, keys[o], 4)
        losses_s.append(ls)
    losses_s = jnp.concatenate(losses_s)
    np.testing.assert_allclose(np.asarray(losses_m), np.asarray(losses_s),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_m),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_outer_engine_path():
    """The engine selects the fused path (mapping.fused_outer) and
    produces a working run on the tiny scene."""
    from tests.test_engine import tiny_cfg
    from pointnerf_slam_tpu.engine import PointNeRFSLAM
    cfg = tiny_cfg(tracking={"gt_camera": True},
                   data={"n_frames": 5,
                         "output": "/tmp/tpu_slam_fused_outer_test"},
                   mapping={"iters_first": 20, "iters": 12,
                            "fused_outer": True})
    slam = PointNeRFSLAM(cfg)
    for idx in range(5):
        _, color, depth, gt = slam.frame_reader[idx]
        slam.step(idx, color, depth, gt)
    # steady-state mapped frames (idx>=2) take the fused path: one loss
    # trace of 3*iters//3 entries per mapped frame
    assert any((3, 12 // 3) == (1, np.asarray(ls).size // (12 // 3))
               or np.asarray(ls).size == 3 * (12 // 3)
               for _, ls in slam.loss_log["mapping"])
    assert np.isfinite(slam.estimate_c2w_list[:5]).all()
