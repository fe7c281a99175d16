"""Decoder + grid-sampler tests. The trilinear sampler is validated against
torch.nn.functional.grid_sample (the exact native op the reference system
called), which is available CPU-side in this image."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.models import (
    MLPConfig, NICEConfig, init_mlp, apply_mlp, init_nice, apply_nice,
    get_model, init_fourier, apply_fourier, nerf_positional_embedding,
)
from pointnerf_slam_tpu.ops import trilinear_sample

IMAP_CFG = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256,
                     skips=(), n_blocks=4, pos_embedding_method="fourier")


class TestEmbeddings:
    def test_fourier_shapes_and_scale(self):
        p = init_fourier(jax.random.PRNGKey(0), 3, 93, 25.0)
        assert p["B"].shape == (3, 93)
        # std of entries should be ~25
        assert 20 < float(jnp.std(p["B"])) < 30
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
        out = apply_fourier(p, x)
        assert out.shape == (7, 93)
        assert float(jnp.abs(out).max()) <= 1.0

    def test_nerf_embedding_dims(self):
        x = jnp.ones((5, 3))
        assert nerf_positional_embedding(x, 10).shape == (5, 63)
        assert nerf_positional_embedding(x, 5, False).shape == (5, 33)


class TestIMAPDecoder:
    def test_param_shapes(self):
        p = init_mlp(jax.random.PRNGKey(0), IMAP_CFG)
        assert p["embedder"]["B"].shape == (3, 93)
        assert len(p["layers"]) == 4
        assert p["layers"][0]["w"].shape == (93, 256)
        for i in range(1, 4):
            assert p["layers"][i]["w"].shape == (256, 256)
        assert p["out"]["w"].shape == (256, 4)
        assert "fc_c" not in p

    def test_forward_shape_and_grad(self):
        p = init_mlp(jax.random.PRNGKey(0), IMAP_CFG)
        pts = jax.random.normal(jax.random.PRNGKey(1), (11, 3))
        out = apply_mlp(p, IMAP_CFG, pts)
        assert out.shape == (11, 4)

        def loss(p):
            return jnp.sum(apply_mlp(p, IMAP_CFG, pts) ** 2)
        g = jax.grad(loss)(p)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    def test_skip_layer_widths(self):
        cfg = MLPConfig(dim=3, c_dim=0, color=False, hidden_size=32,
                        skips=(1,), n_blocks=3)
        p = init_mlp(jax.random.PRNGKey(0), cfg)
        assert p["layers"][0]["w"].shape == (93, 32)
        assert p["layers"][1]["w"].shape == (32, 32)
        assert p["layers"][2]["w"].shape == (32 + 93, 32)  # after skip concat
        pts = jnp.zeros((4, 3))
        assert apply_mlp(p, cfg, pts).shape == (4,)

    def test_factory_imap(self):
        cfg = {"data": {"dim": 3},
               "model": {"c_dim": 32, "pos_embedding_method": "fourier"},
               "grid_len": {"coarse": 2, "middle": 0.32, "fine": 0.16,
                            "color": 0.16},
               "coarse": False}
        mcfg, init_fn = get_model(cfg, nice=False)
        assert mcfg.c_dim == 0 and mcfg.n_blocks == 4 and mcfg.color
        p = init_fn(jax.random.PRNGKey(0))
        assert p["layers"][0]["w"].shape == (93, 256)


class TestTrilinear:
    def _torch_reference(self, grid_xyzc, pts):
        import torch
        import torch.nn.functional as F
        # our layout (Dx, Dy, Dz, C); torch wants (1, C, D, H, W) where the
        # sample coord (x, y, z) indexes (W, H, D) -> put x last
        g = torch.from_numpy(np.asarray(grid_xyzc)).permute(3, 2, 1, 0)[None]
        v = torch.from_numpy(np.asarray(pts))[None, :, None, None, :]
        out = F.grid_sample(g, v, padding_mode="border", align_corners=True,
                            mode="bilinear")
        return out[0, :, :, 0, 0].T.numpy()

    def test_matches_torch_grid_sample(self):
        rng = np.random.default_rng(0)
        grid = rng.normal(size=(5, 6, 7, 4)).astype(np.float32)
        pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        ours = trilinear_sample(jnp.asarray(grid), jnp.asarray(pts))
        ref = self._torch_reference(grid, pts)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_border_clamp_matches_torch(self):
        rng = np.random.default_rng(1)
        grid = rng.normal(size=(4, 4, 4, 2)).astype(np.float32)
        pts = rng.uniform(-1.8, 1.8, size=(40, 3)).astype(np.float32)
        ours = trilinear_sample(jnp.asarray(grid), jnp.asarray(pts))
        ref = self._torch_reference(grid, pts)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_exact_at_voxel_centers(self):
        grid = jnp.arange(2 * 2 * 2 * 1, dtype=jnp.float32).reshape(2, 2, 2, 1)
        # corner (-1,-1,-1) -> voxel (0,0,0); (1,1,1) -> voxel (1,1,1)
        out = trilinear_sample(grid, jnp.array([[-1.0, -1, -1], [1, 1, 1]]))
        np.testing.assert_allclose(out[:, 0], [0.0, 7.0], atol=1e-6)

    def test_grad_flows_to_grid_and_points(self):
        grid = jnp.ones((3, 3, 3, 2))
        pts = jnp.array([[0.1, -0.2, 0.3]])
        g_grid = jax.grad(lambda g: trilinear_sample(g, pts).sum())(grid)
        assert float(jnp.abs(g_grid).sum()) > 0
        g_pts = jax.grad(
            lambda p: (trilinear_sample(grid * jnp.arange(2), p) ** 2).sum()
        )(pts)
        assert jnp.all(jnp.isfinite(g_pts))


class TestNICE:
    def _setup(self):
        cfg = NICEConfig(c_dim=8, hidden_size=8, coarse=True)
        params = init_nice(jax.random.PRNGKey(0), cfg)
        bound = jnp.array([[-1.0, 1], [-1, 1], [-1, 1]])
        key = jax.random.PRNGKey(1)
        c_grid = {
            "grid_coarse": jax.random.normal(key, (4, 4, 4, 8)) * 0.01,
            "grid_middle": jax.random.normal(key, (8, 8, 8, 8)) * 0.01,
            "grid_fine": jax.random.normal(key, (12, 12, 12, 8)) * 0.01,
            "grid_color": jax.random.normal(key, (12, 12, 12, 8)) * 0.01,
        }
        return cfg, params, c_grid, bound

    def test_stages(self):
        cfg, params, c_grid, bound = self._setup()
        pts = jax.random.uniform(jax.random.PRNGKey(2), (9, 3),
                                 minval=-0.9, maxval=0.9)
        for stage in ("coarse", "middle", "fine", "color"):
            out = apply_nice(params, cfg, pts, c_grid, stage, bound)
            assert out.shape == (9, 4), stage
            if stage != "color":
                np.testing.assert_allclose(out[:, :3], 0.0)

    def test_fine_is_sum_of_fine_and_middle(self):
        cfg, params, c_grid, bound = self._setup()
        pts = jnp.zeros((3, 3))
        mid = apply_nice(params, cfg, pts, c_grid, "middle", bound)[:, 3]
        fine = apply_nice(params, cfg, pts, c_grid, "fine", bound)[:, 3]
        from pointnerf_slam_tpu.models.decoders import apply_mlp as am
        fine_only = am(params["fine"], cfg.sub_configs["fine"], pts, c_grid,
                       bound)
        np.testing.assert_allclose(fine, fine_only + mid, atol=1e-6)

    def test_grid_gradients(self):
        cfg, params, c_grid, bound = self._setup()
        pts = jnp.array([[0.05, 0.0, -0.1]])

        def loss(c_grid):
            return apply_nice(params, cfg, pts, c_grid, "color", bound).sum()
        g = jax.grad(loss)(c_grid)
        assert float(jnp.abs(g["grid_color"]).sum()) > 0
        assert float(jnp.abs(g["grid_middle"]).sum()) > 0
