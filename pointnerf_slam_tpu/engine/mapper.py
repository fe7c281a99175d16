"""Mapping step: keyframe-window joint optimization of the scene decoder
(and window poses when BA) — capability of src/Mapper.py:335-694.

TPU-native design:
  - the full `num_joint_iters` Adam loop runs on device in one lax.scan
    (never returning to the host between iterations — SURVEY §7 (c)); a
    fresh optimizer is created per call, as the reference builds a fresh
    torch Adam per optimize_map invocation.
  - the window has a STATIC max size; invalid slots are masked and per-frame
    loss contributions rescaled by (max_frames / n_valid) so the expected
    total pixel budget matches the reference's
    pixs_per_image = mapping_pixels // len(optimize_frame) (Mapper.py:397).
  - per iteration each frame contributes `pixs_per_frame` rays sampled
    uniformly-with-replacement (weak mode: among pseudo-depth > 0.01 pixels,
    matching Tracker-style select_uv; else uniform over the image).

Loss (iMAP* branch, Mapper.py:628-655):
  sum|D-D_hat| over D>0  +  w_color * sum|C-C_hat| (all rays)
  + 0.0005 * sum|sigma_free|  (regulation, density mode only)

Note on lr: the reference resets param_groups[0].lr = imap_decoders_lr every
iteration (Mapper.py:540), which makes its StepLR scheduler and lr_first
factor no-ops in iMAP* mode — we intentionally replicate the effective
constant-lr behavior (see PARITY.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..core.rays import gather_pixels, rays_from_uv, sample_uv_uniform, \
    sample_uv_valid
from ..core.se3 import camera_from_tensor
from ..render.renderer import RenderConfig, regulation, render_rays
from .state import EngineConfig


def make_mapper_step(model_cfg, rcfg: RenderConfig, ecfg: EngineConfig,
                     max_frames: int):
    """Build the jitted mapping update.

    max_frames includes the current frame (window_size-2 selected + last kf +
    current, reference Mapper.py:362-380)."""

    H, W = ecfg.H, ecfg.W
    pixs_per_frame = max(ecfg.mapping_pixels // max_frames, 1)

    def sample_frame_rays(key, color_u8, depth, c2w34):
        """Sample pixs_per_frame rays for ONE window frame."""
        if ecfg.weak_depth:
            idx, _ = sample_uv_valid(key, depth > 0.01, pixs_per_frame)
        else:
            idx = sample_uv_uniform(key, W, 0, H, 0, W, pixs_per_frame)
        i, j, d, c = gather_pixels(idx, W, depth,
                                   color_u8.astype(jnp.float32) / 255.0)
        rays_o, rays_d = rays_from_uv(i, j, c2w34, ecfg.fx, ecfg.fy,
                                      ecfg.cx, ecfg.cy)
        return rays_o, rays_d, d, c

    def loss_fn(opt_vars, fixed_cams, frame_valid, ba_mask, colors, depths,
                bound, key, n_valid_frames):
        params = opt_vars["params"]
        cams = jnp.where(ba_mask[:, None], opt_vars["cams"], fixed_cams)
        c2w = camera_from_tensor(cams)  # (F, 3, 4)

        keys = jax.random.split(key, max_frames + 1)
        rays_o, rays_d, gt_d, gt_c = jax.vmap(sample_frame_rays)(
            keys[:max_frames], colors, depths, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        gt_d = gt_d.reshape(-1)
        gt_c = gt_c.reshape(-1, 3)
        ray_w = jnp.repeat(frame_valid.astype(jnp.float32), pixs_per_frame)
        # budget parity: expected effective ray count == mapping_pixels
        ray_w = ray_w * (max_frames / jnp.maximum(n_valid_frames, 1))

        k_render, k_reg = jax.random.split(keys[-1])
        depth, var, color, _ = render_rays(
            params, model_cfg, rcfg, rays_o, rays_d, bound, k_render, gt_d)
        depth_mask = (gt_d > 0).astype(jnp.float32) * ray_w
        loss = jnp.sum(jnp.abs(gt_d - depth) * depth_mask)
        color_loss = jnp.sum(jnp.abs(gt_c - color).sum(-1) * ray_w)
        loss = loss + ecfg.w_color_loss_m * color_loss
        if not ecfg.occupancy:
            sigma = regulation(params, model_cfg, rcfg, rays_o, rays_d, gt_d,
                               bound, k_reg)
            sigma = sigma.reshape(rays_o.shape[0], -1)
            loss = loss + 0.0005 * jnp.sum(jnp.abs(sigma) * ray_w[:, None])
        return loss

    @partial(jax.jit, static_argnames=("num_iters",))
    def mapper_step(params, colors, depths, fixed_cams, frame_valid, ba_mask,
                    bound, key, num_iters: int):
        """Run num_iters mapping iterations on device.

        Args:
          params: decoder pytree.
          colors: (F, H, W, 3) uint8.
          depths: (F, H, W) float32 — the supervising depth (pseudo-depth in
            weak mode, sensor depth otherwise).
          fixed_cams: (F, 7) est_c2w camera tensors.
          frame_valid: (F,) bool window-slot validity.
          ba_mask: (F,) bool — poses to optimize (BA; excludes oldest kf).
          bound: (3, 2) scene AABB.
        Returns: (params, cams, losses(num_iters,))
        """
        opt_vars = {"params": params, "cams": fixed_cams}
        tx = optax.multi_transform(
            {"dec": optax.adam(ecfg.imap_decoders_lr),
             "cam": optax.adam(ecfg.BA_cam_lr)},
            {"params": "dec", "cams": "cam"})
        opt_state = tx.init(opt_vars)
        n_valid_frames = jnp.sum(frame_valid)

        def body(carry, k):
            opt_vars, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                opt_vars, fixed_cams, frame_valid, ba_mask, colors, depths,
                bound, k, n_valid_frames)
            grads["cams"] = grads["cams"] * ba_mask[:, None]
            updates, opt_state = tx.update(grads, opt_state)
            opt_vars = optax.apply_updates(opt_vars, updates)
            return (opt_vars, opt_state), loss

        keys = jax.random.split(key, num_iters)
        (opt_vars, _), losses = jax.lax.scan(body, (opt_vars, opt_state),
                                             keys)
        cams = jnp.where(ba_mask[:, None], opt_vars["cams"], fixed_cams)
        return opt_vars["params"], cams, losses

    return mapper_step
