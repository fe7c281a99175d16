"""Renderer tests: analytic-scene golden checks + semantics parity probes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf_slam_tpu.models import MLPConfig, init_mlp
from pointnerf_slam_tpu.render import (RenderConfig, eval_points, render_rays,
                                       render_img, regulation)

BOUND = jnp.array([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
IMAP_CFG = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=32,
                     skips=(), n_blocks=2)


class _AnalyticWall:
    """A dense wall at z = -1 (camera at origin looking down -z hits it at
    depth 1). Mimics the decoder call signature via a params-free closure."""

    class Cfg(MLPConfig):
        pass

    @staticmethod
    def raw(pts):
        sigma = 200.0 * (pts[..., 2] < -1.0).astype(jnp.float32)
        rgb = jnp.stack([jnp.full_like(sigma, 0.8),
                         jnp.full_like(sigma, 0.2),
                         jnp.full_like(sigma, 0.1)], -1)
        return jnp.concatenate([rgb, sigma[..., None]], -1)


@pytest.fixture(scope="module")
def wall(monkeypatch_module=None):
    return _AnalyticWall()


def _render_wall(rcfg, rays_o, rays_d, gt_depth, key=None):
    """render_rays with the analytic wall patched in as the field."""
    import pointnerf_slam_tpu.render.renderer as R
    orig = R.eval_points

    def fake_eval(params, model_cfg, pts, bound, c_grid=None, stage="color"):
        raw = _AnalyticWall.raw(pts)
        inside = jnp.all((pts > bound[:, 0]) & (pts < bound[:, 1]), axis=-1)
        return raw.at[..., 3].set(jnp.where(inside, raw[..., 3], 100.0))

    R.eval_points = fake_eval
    try:
        return R.render_rays(None, IMAP_CFG, rcfg, rays_o, rays_d, BOUND,
                             key, gt_depth)
    finally:
        R.eval_points = orig


class TestRenderRays:
    def test_wall_depth_recovered(self):
        rcfg = RenderConfig(N_samples=64, N_surface=0, N_importance=32)
        n = 8
        rays_o = jnp.zeros((n, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1))
        gt_depth = jnp.full((n,), 1.0)
        depth, var, color, w = _render_wall(rcfg, rays_o, rays_d, gt_depth)
        np.testing.assert_allclose(depth, 1.0, atol=0.05)
        np.testing.assert_allclose(color[0], [0.8, 0.2, 0.1], atol=0.02)
        assert float(var.max()) < 0.01

    def test_importance_tightens_depth(self):
        coarse = RenderConfig(N_samples=16, N_importance=0)
        fine = RenderConfig(N_samples=16, N_importance=32)
        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (4, 1))
        gt = jnp.full((4,), 1.0)
        d0, *_ = _render_wall(coarse, rays_o, rays_d, gt)
        d1, *_ = _render_wall(fine, rays_o, rays_d, gt)
        assert abs(float(d1[0]) - 1.0) <= abs(float(d0[0]) - 1.0) + 1e-3

    def test_surface_samples_path(self):
        rcfg = RenderConfig(N_samples=8, N_surface=8, N_importance=0)
        rays_o = jnp.zeros((3, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (3, 1))
        gt = jnp.array([1.0, 0.0, 1.2])  # includes a zero-depth ray
        depth, var, color, w = _render_wall(rcfg, rays_o, rays_d, gt)
        assert w.shape == (3, 16)
        assert jnp.all(jnp.isfinite(depth))

    def test_no_depth_prior_branch(self):
        rcfg = RenderConfig(N_samples=24, N_surface=8, N_importance=8)
        rays_o = jnp.zeros((2, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (2, 1))
        depth, var, color, w = _render_wall(rcfg, rays_o, rays_d, None)
        # N_surface forced to 0 without a depth prior
        assert w.shape == (2, 24 + 8)
        np.testing.assert_allclose(depth, 1.0, atol=0.1)

    def test_perturb_uses_key(self):
        rcfg = RenderConfig(N_samples=16, N_importance=8, perturb=1.0)
        rays_o = jnp.zeros((2, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (2, 1))
        gt = jnp.ones((2,))
        d0, *_ = _render_wall(rcfg, rays_o, rays_d, gt, jax.random.PRNGKey(0))
        d1, *_ = _render_wall(rcfg, rays_o, rays_d, gt, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(d0), np.asarray(d1))


class TestEvalPoints:
    def test_out_of_bound_sentinel(self):
        params = init_mlp(jax.random.PRNGKey(0), IMAP_CFG)
        pts = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        raw = eval_points(params, IMAP_CFG, pts, BOUND)
        assert abs(float(raw[1, 3]) - 100.0) < 1e-6
        assert abs(float(raw[0, 3])) < 50.0

    def test_geometry_only_decoder_padded_to_rgba(self):
        cfg = MLPConfig(dim=3, c_dim=0, color=False, hidden_size=16,
                        skips=(), n_blocks=2)
        params = init_mlp(jax.random.PRNGKey(0), cfg)
        raw = eval_points(params, cfg, jnp.zeros((5, 3)), BOUND)
        assert raw.shape == (5, 4)
        np.testing.assert_allclose(raw[:, :3], 0.0)


class TestRenderImg:
    def test_tiled_image_render(self):
        params = init_mlp(jax.random.PRNGKey(0), IMAP_CFG)
        rcfg = RenderConfig(N_samples=8, N_importance=0)
        H, W = 12, 16
        c2w = jnp.eye(4)
        depth, var, color = render_img(
            params, IMAP_CFG, rcfg, H, W, 10.0, 10.0, 7.5, 5.5, c2w, BOUND,
            key=None, gt_depth=jnp.ones((H, W)), chunk=64)
        assert depth.shape == (H, W)
        assert color.shape == (H, W, 3)
        assert jnp.all(jnp.isfinite(depth))

    def test_chunking_invariance(self):
        params = init_mlp(jax.random.PRNGKey(0), IMAP_CFG)
        rcfg = RenderConfig(N_samples=8, N_importance=4)
        H, W = 8, 8
        c2w = jnp.eye(4)
        args = (params, IMAP_CFG, rcfg, H, W, 10.0, 10.0, 3.5, 3.5, c2w,
                BOUND)
        d1, _, c1 = render_img(*args, key=None, gt_depth=jnp.ones((H, W)),
                               chunk=16)
        d2, _, c2 = render_img(*args, key=None, gt_depth=jnp.ones((H, W)),
                               chunk=64)
        # chunk shape changes XLA reduction order -> tiny float noise
        np.testing.assert_allclose(d1, d2, atol=1e-4)
        np.testing.assert_allclose(c1, c2, atol=1e-4)


class TestRegulation:
    def test_free_space_sigma_shape(self):
        params = init_mlp(jax.random.PRNGKey(0), IMAP_CFG)
        rcfg = RenderConfig(N_samples=16)
        n = 6
        rays_o = jnp.zeros((n, 3))
        rays_d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1))
        sig = regulation(params, IMAP_CFG, rcfg, rays_o, rays_d,
                         jnp.ones((n,)), BOUND, jax.random.PRNGKey(0))
        assert sig.shape == (n * 16,)
        assert jnp.all(jnp.isfinite(sig))
