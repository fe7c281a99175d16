"""Fused Pallas iMAP-MLP kernel vs the plain JAX decoder (interpret mode on
CPU; the real TPU path is exercised by bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.models import MLPConfig, init_mlp
from pointnerf_slam_tpu.models.decoders import apply_mlp
from pointnerf_slam_tpu.ops.fused_mlp import (fused_imap_mlp, supports_fused,
                                              pad_params, unpad_grads, TILE)

CFG = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256, skips=(),
                n_blocks=4, fused=False)  # plain path for the reference


def setup():
    params = init_mlp(jax.random.PRNGKey(0), CFG)
    pts = jax.random.normal(jax.random.PRNGKey(1), (700, 3))  # non-multiple
    return params, pts


class TestFusedForward:
    def test_supports_flagship(self):
        assert supports_fused(CFG)
        assert not supports_fused(MLPConfig(c_dim=32))
        assert not supports_fused(MLPConfig(c_dim=0, color=True,
                                            hidden_size=128, skips=(),
                                            n_blocks=4))

    def test_matches_plain(self):
        params, pts = setup()
        ref = apply_mlp(params, CFG, pts)
        out = fused_imap_mlp(params, pts)
        assert out.shape == ref.shape == (700, 4)
        # bf16 matmuls in both paths differ only by reduction order wrt
        # XLA's bf16 lowering; tolerance covers that
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_tile_boundary_sizes(self):
        params, _ = setup()
        for n in (1, TILE - 1, TILE, TILE + 1, 2 * TILE):
            pts = jax.random.normal(jax.random.PRNGKey(n), (n, 3))
            out = fused_imap_mlp(params, pts)
            ref = apply_mlp(params, CFG, pts)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-2, rtol=2e-2)


class TestFusedBackward:
    def test_grads_match_plain(self):
        params, pts = setup()
        tgt = jax.random.normal(jax.random.PRNGKey(2), (700, 4))

        def loss_fused(p, x):
            return jnp.sum((fused_imap_mlp(p, x) - tgt) ** 2)

        def loss_plain(p, x):
            return jnp.sum((apply_mlp(p, CFG, x) - tgt) ** 2)

        gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, pts)
        gp_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(params, pts)

        def cos_and_ratio(a, b):
            a = np.asarray(a).reshape(-1)
            b = np.asarray(b).reshape(-1)
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            ratio = np.linalg.norm(a) / (np.linalg.norm(b) + 1e-12)
            return cos, ratio

        # bf16 matmul chains make elementwise comparison meaningless; what
        # Adam needs is direction + magnitude agreement
        cos, ratio = cos_and_ratio(gx_f, gx_p)
        assert cos > 0.99 and 0.9 < ratio < 1.1, (cos, ratio)
        fa = jax.tree_util.tree_flatten_with_path(gp_f)[0]
        fb = jax.tree_util.tree_flatten_with_path(gp_p)[0]
        for (ka, a), (kb, b) in zip(
                sorted(fa, key=lambda kv: str(kv[0])),
                sorted(fb, key=lambda kv: str(kv[0]))):
            cos, ratio = cos_and_ratio(a, b)
            assert cos > 0.99 and 0.9 < ratio < 1.1, (ka, cos, ratio)

    def test_pad_roundtrip(self):
        params, _ = setup()
        kp = pad_params(params)
        back = unpad_grads(kp)
        np.testing.assert_allclose(back["embedder"]["B"],
                                   params["embedder"]["B"])
        # weights are pre-cast to bf16 in the kernel layout (one cast per
        # step instead of per tile); biases and B stay f32
        np.testing.assert_allclose(
            np.asarray(back["layers"][0]["w"], np.float32),
            params["layers"][0]["w"], atol=0, rtol=8e-3)
        np.testing.assert_allclose(
            np.asarray(back["out"]["w"], np.float32), params["out"]["w"],
            atol=0, rtol=8e-3)
        np.testing.assert_allclose(back["out"]["b"], params["out"]["b"])
