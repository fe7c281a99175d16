"""Tracking step: per-frame camera pose refinement by gradient descent
through the renderer — capability of src/Tracker.py:253-335,845-921.

The 50-iteration Adam loop runs on device in one lax.scan, carrying the
min-loss candidate selection (Tracker.py:912-914) as part of the scan state.
The candidate recorded for a given loss is the PRE-step camera tensor (the
tensor the loss was evaluated at); the reference stores the post-step tensor
because torch Adam mutates in place — an off-by-one we fix (PARITY.md).

Loss per iteration (Tracker.py:304-331):
  weak/depth mode:  sum(|D - D_hat| / sqrt(Var + 1e-10))[mask]
                    + w_color * sum(|C - C_hat|)[mask]
  color-only mode:  sum(|C - C_hat|)[mask]
  mask = D > 0 (handle_dynamic: additionally err < 10 * median(err)).

Pixel sampling: weak mode samples among pseudo-depth > 0.01 pixels
(Tracker.py:206-225); otherwise uniform over the edge-cropped image
(common.py:92-134). Static budget with replacement (see core/rays.py).

`seperate_LR` (Tracker.py:857-868): quaternion gets lr * 0.2, translation lr.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..core.rays import gather_pixels, rays_from_uv, sample_uv_uniform, \
    sample_uv_valid
from ..core.se3 import camera_from_tensor
from ..render.renderer import RenderConfig, render_rays
from .state import EngineConfig


def make_tracking_step(model_cfg, rcfg: RenderConfig, ecfg: EngineConfig):
    H, W = ecfg.H, ecfg.W
    He, We = ecfg.ignore_edge_H, ecfg.ignore_edge_W
    n_rays = ecfg.tracking_pixels

    # fused full-render Pallas megakernel (ops/megakernel.py), reg pass
    # skipped — tracking has no free-space regulation (Tracker.py:304-331)
    from ..models.decoders import NICEConfig
    from ..ops.megakernel import make_fused_render, supports_megakernel
    nice = isinstance(model_cfg, NICEConfig)
    use_mega = (ecfg.megakernel != "off" and not nice
                and supports_megakernel(model_cfg, rcfg)
                and (ecfg.megakernel == "on"
                     or jax.default_backend() == "tpu"))
    fused_render = (make_fused_render(rcfg, with_reg=False)
                    if use_mega else None)
    # single-kernel loss value-and-grad (ops/fused_vg.py): camera-only
    # gradients (param_grads=False skips the weight contractions). The
    # handle_dynamic median mask is cross-ray state the kernel can't see,
    # so that (non-flagship) config keeps the two-kernel path.
    from ..ops.fused_vg import make_fused_vg, supports_fused_vg
    use_vg = (use_mega and supports_fused_vg(model_cfg, rcfg)
              and ecfg.depth_supervision and not ecfg.handle_dynamic)
    vg_fn = (make_fused_vg(rcfg, "tracker", ecfg.w_color_loss_t,
                           with_color=ecfg.use_color_in_tracking,
                           param_grads=False)
             if use_vg else None)
    # resample-every-K (see mapper.py): one pixel batch + one importance
    # z2 per K camera-Adam iterations; rays re-derived from the live cam
    # each iteration (the camera is the thing being optimized). z2 is
    # prepared at the round-start camera — at tracking step sizes the
    # importance distribution shifts negligibly within a round.
    resample_k = max(int(ecfg.track_resample_every), 1)
    vg_prep = vg_main = None
    if use_vg and resample_k > 1:
        from ..ops.fused_vg import make_fused_vg_split
        vg_prep, vg_main = make_fused_vg_split(
            rcfg, "tracker", ecfg.w_color_loss_t,
            with_color=ecfg.use_color_in_tracking, param_grads=False)

    def sample_rays(key, color, depth, c2w34):
        if ecfg.weak_depth:
            idx, _ = sample_uv_valid(key, depth > 0.01, n_rays)
        else:
            idx = sample_uv_uniform(key, W, He, H - He, We, W - We, n_rays)
        i, j, d, c = gather_pixels(idx, W, depth, color)
        rays_o, rays_d = rays_from_uv(i, j, c2w34, ecfg.fx, ecfg.fy,
                                      ecfg.cx, ecfg.cy)
        return rays_o, rays_d, d, c

    def loss_fn(cam_tensor, params, c_grid, color, depth_sup, bound, key):
        c2w = camera_from_tensor(cam_tensor)
        k_s, k_r = jax.random.split(key)
        rays_o, rays_d, gt_d, gt_c = sample_rays(k_s, color, depth_sup, c2w)
        if use_mega:
            # perturb=0 => the XLA path never consumes k_r; draws identical
            t_reg = jnp.zeros((n_rays, rcfg.N_samples))
            dep, var, col, _ = fused_render(params, rays_o, rays_d, gt_d,
                                            t_reg, bound)
        else:
            dep, var, col, _ = render_rays(params, model_cfg, rcfg,
                                           rays_o, rays_d, bound, k_r, gt_d,
                                           c_grid=c_grid, stage="color")
        var = jax.lax.stop_gradient(var)
        if ecfg.handle_dynamic:
            tmp = jnp.abs(gt_d - dep) / jnp.sqrt(var + 1e-10)
            mask = (tmp < 10 * jnp.median(tmp)) & (gt_d > 0)
        else:
            mask = gt_d > 0
        mask = mask.astype(jnp.float32)
        if not ecfg.depth_supervision:
            loss = jnp.sum(jnp.abs(gt_c - col).sum(-1) * mask)
        else:
            loss = jnp.sum(
                jnp.abs(gt_d - dep) / jnp.sqrt(var + 1e-10) * mask)
            if ecfg.use_color_in_tracking:
                loss = loss + ecfg.w_color_loss_t * jnp.sum(
                    jnp.abs(gt_c - col).sum(-1) * mask)
        return loss

    @jax.jit
    def tracking_step(params, c_grid, cam_tensor, color, depth_sup, bound,
                      key):
        """Refine one camera. Returns (best_cam, best_loss, first_loss)."""
        if ecfg.seperate_LR:
            tx = optax.multi_transform(
                {"quad": optax.adam(ecfg.cam_lr * 0.2),
                 "t": optax.adam(ecfg.cam_lr)},
                {"quad": "quad", "t": "t"})
            split = lambda c: {"quad": c[:4], "t": c[4:]}
            join = lambda d: jnp.concatenate([d["quad"], d["t"]])
        else:
            tx = optax.adam(ecfg.cam_lr)
            split = lambda c: c
            join = lambda d: d

        opt_vars = split(cam_tensor)
        opt_state = tx.init(opt_vars)

        def vg_loss(cam, k):
            """loss_fn's fused single-kernel twin (use_vg): identical RNG
            draws and loss; camera gradient = kernel d(loss)/d(rays)
            chained through jax.vjp of ray generation."""
            k_s, _ = jax.random.split(k)
            if ecfg.weak_depth:
                idx, _ = sample_uv_valid(k_s, depth_sup > 0.01, n_rays)
            else:
                idx = sample_uv_uniform(k_s, W, He, H - He, We, W - We,
                                        n_rays)
            i, j, gt_d, gt_c = gather_pixels(idx, W, depth_sup, color)

            def rays_fn(c):
                return rays_from_uv(i, j, camera_from_tensor(c), ecfg.fx,
                                    ecfg.fy, ecfg.cx, ecfg.cy)

            (ro, rd), rays_vjp = jax.vjp(rays_fn, cam)
            t0 = jnp.zeros((n_rays, rcfg.N_samples))
            loss, _dp, dro, drd, _aux = vg_fn(params, ro, rd, gt_d, gt_c,
                                              jnp.ones_like(gt_d), t0,
                                              bound)
            (dcam,) = rays_vjp((dro, drd))
            return loss, dcam

        def apply_update(loss, grads, carry):
            opt_vars, opt_state, best_cam, best_loss = carry
            cam = join(opt_vars)
            improved = loss < best_loss
            best_cam = jnp.where(improved, cam, best_cam)
            best_loss = jnp.where(improved, loss, best_loss)
            updates, opt_state = tx.update(split(grads), opt_state)
            opt_vars = optax.apply_updates(opt_vars, updates)
            return (opt_vars, opt_state, best_cam, best_loss), loss

        def body(carry, k):
            opt_vars = carry[0]
            cam = join(opt_vars)
            if use_vg:
                loss, grads = vg_loss(cam, k)
            else:
                loss, grads = jax.value_and_grad(
                    lambda c: loss_fn(c, params, c_grid, color, depth_sup,
                                      bound, k)
                )(cam)
            return apply_update(loss, grads, carry)

        def round_body(carry, k):
            """One resample round (resample_every schedule): sample the
            pixel batch + prepare z2 once at the round-start camera, then
            K fused-VG Adam iterations re-deriving rays from the live
            camera each time."""
            k_s, k_in = jax.random.split(k)
            if ecfg.weak_depth:
                idx, _ = sample_uv_valid(k_s, depth_sup > 0.01, n_rays)
            else:
                idx = sample_uv_uniform(k_s, W, He, H - He, We, W - We,
                                        n_rays)
            i, j, gt_d, gt_c = gather_pixels(idx, W, depth_sup, color)

            def rays_fn(c):
                return rays_from_uv(i, j, camera_from_tensor(c), ecfg.fx,
                                    ecfg.fy, ecfg.cx, ecfg.cy)

            cam0 = join(carry[0])
            ro0, rd0 = rays_fn(cam0)
            z2 = vg_prep(params, ro0, rd0, gt_d, bound)
            t0 = jnp.zeros((n_rays, rcfg.N_samples))

            def inner(carry2, _kk):
                # _kk unused: the tracker consumes no per-iteration
                # randomness on the fused path (t_reg is zeros)
                cam = join(carry2[0])
                (ro, rd), rays_vjp = jax.vjp(rays_fn, cam)
                loss, _dp, dro, drd, _aux = vg_main(
                    params, ro, rd, gt_d, gt_c, jnp.ones_like(gt_d), t0,
                    z2, bound)
                (dcam,) = rays_vjp((dro, drd))
                return apply_update(loss, dcam, carry2)

            inner_keys = jax.random.split(k_in, resample_k)
            return jax.lax.scan(inner, carry, inner_keys)

        init = (opt_vars, opt_state, cam_tensor, jnp.float32(1e10))
        if vg_main is not None and ecfg.num_cam_iters % resample_k == 0:
            keys = jax.random.split(key, ecfg.num_cam_iters // resample_k)
            (_, _, best_cam, best_loss), losses = jax.lax.scan(
                round_body, init, keys)
            losses = losses.reshape(-1)
        else:
            keys = jax.random.split(key, ecfg.num_cam_iters)
            (_, _, best_cam, best_loss), losses = jax.lax.scan(body, init,
                                                               keys)
        return best_cam, best_loss, losses[0]

    return tracking_step
