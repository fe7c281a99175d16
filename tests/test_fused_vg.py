"""Single-kernel fused value-and-grad vs autodiff of the (already verified)
two-kernel megakernel render path, interpret mode on CPU.

The megakernel's forward/VJP parity against the XLA renderer is established
in tests/test_megakernel.py; here the oracle is jax.value_and_grad over a
loss assembled from make_fused_render outputs with the exact engine loss
shapes (engine/mapper.py loss_fn, engine/tracker.py loss_fn)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.models.decoders import MLPConfig, init_mlp
from pointnerf_slam_tpu.ops.fused_vg import make_fused_vg, supports_fused_vg
from pointnerf_slam_tpu.ops.megakernel import make_fused_render
from pointnerf_slam_tpu.render.renderer import RenderConfig

CFG = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256, skips=(),
                n_blocks=4)
RCFG = RenderConfig(N_samples=32, N_surface=0, N_importance=12)
BOUND = jnp.array([[-4.0, 4.0], [-4.0, 4.0], [-4.0, 4.0]])
W_COLOR_M, W_REG = 0.05, 0.0005
W_COLOR_T = 0.5


def setup(n=260, seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    params = init_mlp(ks[0], CFG)
    rays_o = jax.random.uniform(ks[1], (n, 3), minval=-1.0, maxval=1.0)
    d = jax.random.normal(ks[2], (n, 3))
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    rays_d = rays_d * jax.random.uniform(ks[3], (n, 1), minval=0.9,
                                         maxval=1.3)
    gt_d = jax.random.uniform(ks[4], (n,), minval=0.5, maxval=2.5)
    # a few invalid-depth rays exercise the mask path
    gt_d = gt_d.at[::7].set(0.0)
    gt_c = jax.random.uniform(ks[5], (n, 3))
    t_reg = jax.random.uniform(ks[6], (n, RCFG.N_samples))
    ray_w = jnp.ones((n,)).at[1::5].set(1.5)   # frame-budget weights
    return params, rays_o, rays_d, gt_d, gt_c, t_reg, ray_w


def _cmp_trees(ga, gb, rtol=2e-2, atol=None):
    fa = jax.tree_util.tree_flatten_with_path(ga)[0]
    fb = jax.tree_util.tree_flatten_with_path(gb)[0]
    for (ka, a), (kb, b) in zip(sorted(fa, key=lambda kv: str(kv[0])),
                                sorted(fb, key=lambda kv: str(kv[0]))):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a, b, atol=rtol * scale, err_msg=str(ka))


def _cmp_rays(a, b, name):
    """Per-ray gradient comparison vs the two-kernel-megakernel oracle:
    that oracle is itself only cosine-verified against autodiff
    (test_megakernel.py cross-stack checks), so an elementwise bound would
    measure the ORACLE's noise. Global direction/magnitude + an outlier
    cap replace it."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    cos = (a.reshape(-1) @ b.reshape(-1)) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    ratio = np.linalg.norm(a) / (np.linalg.norm(b) + 1e-12)
    assert cos > 0.999 and 0.98 < ratio < 1.02, (name, cos, ratio)
    bad = np.abs(a - b) > 0.02 * (np.abs(b).max() + 1e-8)
    assert bad.mean() < 0.01, (name, bad.sum(), a.size)


def test_supports():
    assert supports_fused_vg(CFG, RCFG)
    assert not supports_fused_vg(CFG, RenderConfig(N_samples=128,
                                                   N_surface=0,
                                                   N_importance=128))


def test_mapper_mode_matches_megakernel_autodiff():
    params, ro, rd, gt_d, gt_c, t_reg, ray_w = setup()
    fused = make_fused_render(RCFG, with_reg=True)

    def loss_ref(p, ro_, rd_):
        dep, var, col, sig = fused(p, ro_, rd_, gt_d, t_reg, BOUND)
        mask = (gt_d > 0).astype(jnp.float32) * ray_w
        loss = jnp.sum(jnp.abs(gt_d - dep) * mask)
        loss += W_COLOR_M * jnp.sum(jnp.abs(gt_c - col).sum(-1) * ray_w)
        loss += W_REG * jnp.sum(jnp.abs(sig) * ray_w[:, None])
        return loss

    l_ref, (gp_ref, go_ref, gd_ref) = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2))(params, ro, rd)

    vg = make_fused_vg(RCFG, "mapper", W_COLOR_M, W_REG)
    l, gp, go, gd, (dep, var, col) = vg(params, ro, rd, gt_d, gt_c, ray_w,
                                        t_reg, BOUND)

    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-3)
    _cmp_trees(gp, gp_ref)
    _cmp_rays(go, go_ref, "rays_o")
    _cmp_rays(gd, gd_ref, "rays_d")
    # aux monitors equal the fused render outputs
    dep_f, var_f, col_f, _ = fused(params, ro, rd, gt_d, t_reg, BOUND)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(dep_f),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(col), np.asarray(col_f),
                               atol=1e-3)


def test_beyond_loss_mapper_step_parity():
    """w_beyond_loss > 0 (the flagship room_bench configs, PARITY #25) must
    run on the fused-VG path and match the XLA mapper step: the termination
    penalty sum((1 - in-band weight mass) * mask) is composite-level math,
    so the kernel derives its cotangent inside the autodiffed comp_fn.
    Before round 4 this config silently fell back to pure XLA
    (engine/mapper.py use_mega gate), costing the oracle runs the whole
    fused speedup."""
    from pointnerf_slam_tpu.engine.mapper import make_mapper_step
    from pointnerf_slam_tpu.engine.state import EngineConfig

    H, W, F = 16, 24, 2
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, CFG)
    colors = (jax.random.uniform(key, (F, H, W, 3)) * 255).astype(jnp.uint8)
    depths = jax.random.uniform(key, (F, H, W), minval=0.5, maxval=3.0)
    cams = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 2.5]), (F, 1))
    valid = jnp.ones((F,), bool)
    ba = jnp.zeros((F,), bool)

    outs = {}
    for mk in ("on", "off"):
        ecfg = EngineConfig(H=H, W=W, fx=12.0, fy=12.0, cx=11.5, cy=7.5,
                            mapping_pixels=128, weak_depth=False,
                            depth_supervision=True, megakernel=mk,
                            w_beyond_loss=0.7)
        step = make_mapper_step(CFG, RCFG, ecfg, F)
        p, _, _, losses = step(params, {}, colors, depths, cams, valid,
                               ba, BOUND, jax.random.PRNGKey(3), 2)
        delta = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a, np.float64) - np.asarray(b,
                                                               np.float64),
            p, params)
        outs[mk] = (delta, np.asarray(losses))

    np.testing.assert_allclose(outs["on"][1], outs["off"][1], rtol=5e-2)
    a = np.concatenate([v.reshape(-1) for v in
                        jax.tree_util.tree_leaves(outs["on"][0])])
    b = np.concatenate([v.reshape(-1) for v in
                        jax.tree_util.tree_leaves(outs["off"][0])])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.98, cos


def test_tracker_mode_matches_megakernel_autodiff():
    params, ro, rd, gt_d, gt_c, t_reg, _ = setup(seed=5)
    n = ro.shape[0]
    fused = make_fused_render(RCFG, with_reg=False)
    t0 = jnp.zeros((n, RCFG.N_samples))

    def loss_ref(p, ro_, rd_):
        dep, var, col, _ = fused(p, ro_, rd_, gt_d, t0, BOUND)
        var = jax.lax.stop_gradient(var)
        mask = (gt_d > 0).astype(jnp.float32)
        loss = jnp.sum(jnp.abs(gt_d - dep) / jnp.sqrt(var + 1e-10) * mask)
        loss += W_COLOR_T * jnp.sum(jnp.abs(gt_c - col).sum(-1) * mask)
        return loss

    l_ref, (gp_ref, go_ref, gd_ref) = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2))(params, ro, rd)

    vg = make_fused_vg(RCFG, "tracker", W_COLOR_T)
    ray_w = jnp.ones((n,))
    l, gp, go, gd, _ = vg(params, ro, rd, gt_d, gt_c, ray_w, t0, BOUND)

    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-3)
    _cmp_trees(gp, gp_ref)
    _cmp_rays(go, go_ref, "rays_o")
    _cmp_rays(gd, gd_ref, "rays_d")


def test_split_composition_equals_vg():
    """make_fused_vg_split: main(..., prepare(...)) must equal vg(...)
    exactly (same op sequence) — the resample_every=K engine schedule
    reuses prepare()'s z2 across K iterations and relies on K=1-equivalent
    composition semantics."""
    from pointnerf_slam_tpu.ops.fused_vg import make_fused_vg_split
    params, ro, rd, gt_d, gt_c, t_reg, ray_w = setup(n=140, seed=11)
    vg = make_fused_vg(RCFG, "mapper", W_COLOR_M, W_REG)
    prep, main = make_fused_vg_split(RCFG, "mapper", W_COLOR_M, W_REG)

    l_ref, gp_ref, go_ref, gd_ref, aux_ref = vg(
        params, ro, rd, gt_d, gt_c, ray_w, t_reg, BOUND)
    z2 = prep(params, ro, rd, gt_d, BOUND)
    l, gp, go, gd, aux = main(params, ro, rd, gt_d, gt_c, ray_w, t_reg,
                              z2, BOUND)

    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-6)
    _cmp_trees(gp, gp_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               atol=1e-5)
    for a, b in zip(aux, aux_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # a STALE z2 (from perturbed rays, as after K-1 camera updates) still
    # yields a finite, close loss: staleness shifts only the importance
    # distribution, never a gradient path
    z2_stale = prep(params, ro + 1e-3, rd, gt_d, BOUND)
    l2, *_ = main(params, ro, rd, gt_d, gt_c, ray_w, t_reg, z2_stale,
                  BOUND)
    assert np.isfinite(float(l2))
    np.testing.assert_allclose(float(l2), float(l_ref), rtol=5e-2)


def test_engine_resample_every_quality():
    """mapper/tracker resample_every=K path: runs, stays finite, and
    converges comparably to K=1 at the same iteration count (the schedule
    reuses one pixel batch + importance z2 per K Adam iterations)."""
    from pointnerf_slam_tpu.engine.mapper import make_mapper_step
    from pointnerf_slam_tpu.engine.state import EngineConfig
    from pointnerf_slam_tpu.engine.tracker import make_tracking_step
    from pointnerf_slam_tpu.models.decoders import MLPConfig, init_mlp

    H, W, F = 24, 32, 2
    mcfg = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=32,
                     skips=(), n_blocks=2)
    rcfg = RenderConfig(N_samples=12, N_surface=0, N_importance=4)
    bound = jnp.array([[-4.0, 4.0], [-4.0, 4.0], [-4.0, 4.0]])
    key = jax.random.PRNGKey(5)
    params = init_mlp(jax.random.PRNGKey(0), mcfg)
    colors = (jax.random.uniform(key, (F, H, W, 3)) * 255).astype(jnp.uint8)
    depths = jax.random.uniform(key, (F, H, W), minval=0.5, maxval=2.5)
    cams = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 1.5]), (F, 1))

    losses = {}
    for k in (1, 4):
        ecfg = EngineConfig(H=H, W=W, fx=20.0, fy=20.0, cx=15.5, cy=11.5,
                            mapping_pixels=128, weak_depth=False,
                            depth_supervision=True, megakernel="on",
                            map_resample_every=k)
        step = make_mapper_step(mcfg, rcfg, ecfg, F)
        _, _, _, ls = step(params, {}, colors, depths, cams,
                           jnp.ones((F,), bool), jnp.zeros((F,), bool),
                           bound, jax.random.PRNGKey(7), 16)
        ls = np.asarray(ls)
        assert ls.shape == (16,) and np.all(np.isfinite(ls))
        losses[k] = ls
    # same optimization problem, same budget: final losses comparable
    assert losses[4][-4:].mean() < 1.6 * losses[1][-4:].mean() + 1e-3

    # tracker: K=4 refines the camera about as well as K=1
    best = {}
    for k in (1, 4):
        ecfg = EngineConfig(H=H, W=W, fx=20.0, fy=20.0, cx=15.5, cy=11.5,
                            tracking_pixels=128, num_cam_iters=8,
                            weak_depth=False, depth_supervision=True,
                            megakernel="on", track_resample_every=k)
        tstep = make_tracking_step(mcfg, rcfg, ecfg)
        cam0 = jnp.array([1.0, 0, 0, 0, 0.02, 0, 1.5])
        bc, bl, _ = tstep(params, {}, cam0,
                          colors[0].astype(jnp.float32) / 255.0,
                          depths[0], bound, jax.random.PRNGKey(3))
        assert np.all(np.isfinite(np.asarray(bc)))
        best[k] = float(bl)
    assert best[4] < 1.6 * best[1] + 1e-3


def test_no_ba_fast_path_identical():
    """no_ba_fast (round 5): with BA off the cams are constants, so
    skipping the per-iteration ray vjp + the kernel dray block must be
    BIT-IDENTICAL in params/losses to the full path (cam grads were
    ba_mask-zeroed anyway). Covers both the K=1 body and the
    resample_every=K round path."""
    from pointnerf_slam_tpu.engine.mapper import make_mapper_step
    from pointnerf_slam_tpu.engine.state import EngineConfig

    H, W, F = 16, 24, 2
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, CFG)
    colors = (jax.random.uniform(key, (F, H, W, 3)) * 255).astype(jnp.uint8)
    depths = jax.random.uniform(key, (F, H, W), minval=0.5, maxval=3.0)
    cams = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 2.5]), (F, 1))
    valid = jnp.ones((F,), bool)
    ba = jnp.zeros((F,), bool)

    for k_every in (1, 2):
        outs = {}
        for fast in (False, True):
            ecfg = EngineConfig(H=H, W=W, fx=12.0, fy=12.0, cx=11.5,
                                cy=7.5, mapping_pixels=128,
                                weak_depth=False, depth_supervision=True,
                                megakernel="on", no_ba_fast=fast,
                                map_resample_every=k_every)
            step = make_mapper_step(CFG, RCFG, ecfg, F)
            p, _, _, losses = step(params, {}, colors, depths, cams,
                                   valid, ba, BOUND,
                                   jax.random.PRNGKey(3), 2)
            outs[fast] = (p, np.asarray(losses))
        np.testing.assert_array_equal(outs[True][1], outs[False][1])
        for a, b in zip(jax.tree_util.tree_leaves(outs[True][0]),
                        jax.tree_util.tree_leaves(outs[False][0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
