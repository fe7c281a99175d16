"""Mapping step: keyframe-window joint optimization of the scene
representation (and window poses when BA) — capability of
src/Mapper.py:335-694, both iMAP* (single MLP) and NICE (feature grids +
staged decoders) modes.

TPU-native design:
  - the full `num_joint_iters` Adam loop runs on device in one lax.scan
    (never returning to the host between iterations — SURVEY §7 (c)); a
    fresh optimizer is created per call, as the reference builds a fresh
    torch Adam per optimize_map invocation.
  - the window has a STATIC max size; invalid slots are masked and per-frame
    loss contributions rescaled by (max_frames / n_valid) so the expected
    total pixel budget matches the reference's
    pixs_per_image = mapping_pixels // len(optimize_frame) (Mapper.py:397).
  - NICE stage scheduling (middle/fine/color with per-stage lrs,
    Mapper.py:520-543) maps to one compiled step per (stage, lr) pair; the
    host calls them in sequence.

Loss (Mapper.py:628-655):
  sum|D-D_hat| over D>0
  + w_color * sum|C-C_hat|          (iMAP always; NICE only at 'color')
  + 0.0005 * sum|sigma_free|        (density mode only)

Note on lr: the reference resets param_groups[0].lr = imap_decoders_lr every
iteration (Mapper.py:540), making its StepLR scheduler and lr_first factor
no-ops in iMAP* mode — we replicate the effective constant-lr behavior
(PARITY.md #10).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..core.rays import gather_pixels, rays_from_uv, sample_uv_uniform, \
    sample_uv_valid
from ..core.se3 import camera_from_tensor
from ..models.decoders import NICEConfig
from ..render.renderer import RenderConfig, regulation, render_rays
from .state import EngineConfig


def make_mapper_step(model_cfg, rcfg: RenderConfig, ecfg: EngineConfig,
                     max_frames: int, stage: str = "color",
                     grid_lrs: Optional[dict] = None,
                     decoders_lr: Optional[float] = None,
                     mesh=None, use_grid_masks: bool = False,
                     outer_fused: bool = False):
    """Build the jitted mapping update.

    Args:
      max_frames: static window size incl. the current frame
        (window_size-2 selected + last kf + current, Mapper.py:362-380).
      stage: NICE stage ('middle'/'fine'/'color'); ignored for iMAP.
      grid_lrs: NICE per-level lrs, e.g. {'grid_middle': 0.1, ...}.
      decoders_lr: decoder lr (NICE stage decoders_lr; iMAP uses
        ecfg.imap_decoders_lr).
      use_grid_masks: NICE frustum_feature_selection (reference
        Mapper.py:129-200, 395-460): the step gains a trailing `grid_masks`
        argument ({grid name: (Dx,Dy,Dz,1) float mask}); grid gradients are
        multiplied by the mask each iteration, freezing cells outside the
        current frame's frustum (zero grad => zero Adam update, exactly the
        reference's extract-optimize-scatter of masked values).
      mesh: optional jax.sharding.Mesh with a 'data' axis. When it has >1
        device the whole scanned loop runs SPMD under jax.shard_map: each
        device samples its own 1/n_dev slice of the per-frame ray budget
        (RNG key folded with the device index), renders it, and the
        per-iteration gradients are psum-reduced over ICI before the
        (replicated) Adam update — dp over rays, decoder replicated
        (SURVEY §2.4 P6/comm, §5.7). Loss returned is the psum total, so
        multi-chip semantics match single-device at the same total budget.
    """
    nice = isinstance(model_cfg, NICEConfig)
    H, W = ecfg.H, ecfg.W
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if n_dev <= 1:
        mesh = None
    pixs_per_frame = max(ecfg.mapping_pixels // max_frames // n_dev, 1)

    # fused full-render Pallas megakernel (ops/megakernel.py): one kernel
    # pair per iteration instead of 3 render/regulation boundaries
    from ..ops.fused_vg import (_BEYOND_HI, _BEYOND_LO, make_fused_vg,
                                supports_fused_vg)
    from ..ops.megakernel import make_fused_render, supports_megakernel
    # the beyond-surface termination term (PARITY #25) runs INSIDE the
    # fused-VG kernel since round 4 (its weight-mass cotangent flows
    # through the autodiffed composite VJP); the two-kernel megakernel
    # path still lacks per-sample weights, so w_beyond_loss > 0 without
    # fused-VG support falls all the way back to pure XLA
    use_mega = (ecfg.megakernel != "off" and not nice
                and supports_megakernel(model_cfg, rcfg)
                and (ecfg.w_beyond_loss == 0.0
                     or supports_fused_vg(model_cfg, rcfg))
                and (ecfg.megakernel == "on"
                     or jax.default_backend() == "tpu"))
    fused_render = (make_fused_render(rcfg, with_reg=not ecfg.occupancy)
                    if use_mega else None)
    dec_lr = (decoders_lr if decoders_lr is not None
              else ecfg.imap_decoders_lr)
    color_in_loss = (not nice) or stage == "color"
    # ... and past that, the single-kernel value-and-grad (ops/fused_vg.py)
    # computes loss + all gradients in ONE pallas call with zero backward
    # recompute (activations stay VMEM-resident)
    use_vg = use_mega and supports_fused_vg(model_cfg, rcfg)
    # no-BA fast path (ecfg.no_ba_fast): cams are constants inside the
    # call, so skip per-iteration ray vjp + the kernel's dray block.
    # Numerics identical (cam grads were ba_mask-zeroed anyway).
    no_cam = bool(ecfg.no_ba_fast and not ecfg.BA)
    vg_fn = (make_fused_vg(rcfg, "mapper", ecfg.w_color_loss_m, 0.0005,
                           with_color=color_in_loss,
                           w_beyond=ecfg.w_beyond_loss,
                           with_ray_grads=not no_cam)
             if use_vg else None)
    # resample-every-K schedule (PERF.md round 4): reuse one pixel batch +
    # one importance z2 across K consecutive Adam iterations — the
    # (K-1)/K share of the p1 kernel, the XLA middle, and the per-frame
    # sampling/gather drops out of the per-iteration cost. Rays are
    # re-derived from the LIVE BA cams every iteration, so camera
    # gradients stay exact; only the (stop-gradient) importance
    # distribution is up to K iterations stale.
    resample_k = max(int(ecfg.map_resample_every), 1)
    vg_prep = vg_main = None
    if use_vg and resample_k > 1:
        from ..ops.fused_vg import make_fused_vg_split
        vg_prep, vg_main = make_fused_vg_split(
            rcfg, "mapper", ecfg.w_color_loss_m, 0.0005,
            with_color=color_in_loss, w_beyond=ecfg.w_beyond_loss,
            with_ray_grads=not no_cam)

    def sample_frame_rays(key, color_u8, depth, c2w34):
        if ecfg.weak_depth:
            idx, _ = sample_uv_valid(key, depth > 0.01, pixs_per_frame)
        else:
            idx = sample_uv_uniform(key, W, 0, H, 0, W, pixs_per_frame)
        i, j, d, c = gather_pixels(idx, W, depth,
                                   color_u8.astype(jnp.float32) / 255.0)
        rays_o, rays_d = rays_from_uv(i, j, c2w34, ecfg.fx, ecfg.fy,
                                      ecfg.cx, ecfg.cy)
        return rays_o, rays_d, d, c

    def sample_frame_pixels(key, color_u8, depth):
        """sample_frame_rays minus ray generation (identical RNG draws);
        rays are built separately under jax.vjp so the fused-VG kernel's
        d(loss)/d(rays) chains to the BA camera tensors."""
        if ecfg.weak_depth:
            idx, _ = sample_uv_valid(key, depth > 0.01, pixs_per_frame)
        else:
            idx = sample_uv_uniform(key, W, 0, H, 0, W, pixs_per_frame)
        return gather_pixels(idx, W, depth,
                             color_u8.astype(jnp.float32) / 255.0)

    def vg_loss(opt_vars, fixed_cams, frame_valid, ba_mask, colors, depths,
                bound, key, n_valid_frames):
        """loss_fn's fused single-kernel twin (use_vg): identical RNG draws
        and loss value; gradients come from ops/fused_vg, with the camera
        chain rule closed through a jax.vjp over ray generation."""
        params = opt_vars["params"]
        keys = jax.random.split(key, max_frames + 1)
        i_pix, j_pix, gt_d, gt_c = jax.vmap(sample_frame_pixels)(
            keys[:max_frames], colors, depths)

        def rays_fn(cams_opt):
            cams = jnp.where(ba_mask[:, None], cams_opt, fixed_cams)
            c2w = camera_from_tensor(cams)              # (F, 3, 4)
            ro, rd = jax.vmap(lambda i, j, c: rays_from_uv(
                i, j, c, ecfg.fx, ecfg.fy, ecfg.cx, ecfg.cy))(
                    i_pix, j_pix, c2w)
            return ro.reshape(-1, 3), rd.reshape(-1, 3)

        if no_cam:
            rays_o, rays_d = rays_fn(opt_vars["cams"])
            rays_vjp = None
        else:
            (rays_o, rays_d), rays_vjp = jax.vjp(rays_fn,
                                                 opt_vars["cams"])
        ray_w = jnp.repeat(frame_valid.astype(jnp.float32), pixs_per_frame)
        ray_w = ray_w * (max_frames / jnp.maximum(n_valid_frames, 1))
        _, k_reg = jax.random.split(keys[-1])   # k_render never consumed
        t_reg = jax.random.uniform(k_reg, (rays_o.shape[0], rcfg.N_samples))
        loss, dparams, dro, drd, _aux = vg_fn(
            params, rays_o, rays_d, gt_d.reshape(-1), gt_c.reshape(-1, 3),
            ray_w, t_reg, bound)
        dcams = (jnp.zeros_like(opt_vars["cams"]) if no_cam
                 else rays_vjp((dro, drd))[0])
        return loss, {"params": dparams, "cams": dcams, "grids": {}}

    def vg_round(carry, k, make_update, fixed_cams, frame_valid, ba_mask,
                 colors, depths, bound, n_valid_frames):
        """One resample round: sample pixels + prepare z2 once, then K
        fused-VG Adam iterations on that batch (resample_every schedule).
        make_update(loss, grads, opt_vars, opt_state) applies the shared
        psum/mask/Adam tail of the K=1 body."""
        opt_vars, opt_state = carry
        keys = jax.random.split(k, max_frames + 1)
        i_pix, j_pix, gt_d, gt_c = jax.vmap(sample_frame_pixels)(
            keys[:max_frames], colors, depths)
        gt_d_f = gt_d.reshape(-1)
        gt_c_f = gt_c.reshape(-1, 3)
        ray_w = jnp.repeat(frame_valid.astype(jnp.float32), pixs_per_frame)
        ray_w = ray_w * (max_frames / jnp.maximum(n_valid_frames, 1))

        def rays_fn(cams_opt):
            cams = jnp.where(ba_mask[:, None], cams_opt, fixed_cams)
            c2w = camera_from_tensor(cams)              # (F, 3, 4)
            ro, rd = jax.vmap(lambda i, j, c: rays_from_uv(
                i, j, c, ecfg.fx, ecfg.fy, ecfg.cx, ecfg.cy))(
                    i_pix, j_pix, c2w)
            return ro.reshape(-1, 3), rd.reshape(-1, 3)

        ro0, rd0 = rays_fn(opt_vars["cams"])
        z2 = vg_prep(opt_vars["params"], ro0, rd0, gt_d_f, bound)

        def inner(carry2, kk):
            opt_vars, opt_state = carry2
            if no_cam:
                # cams are constants (BA off): the round's rays are the
                # iteration's rays — no per-iteration vjp re-derivation
                ro, rd, rays_vjp = ro0, rd0, None
            else:
                (ro, rd), rays_vjp = jax.vjp(rays_fn, opt_vars["cams"])
            t_reg = jax.random.uniform(kk,
                                       (ro.shape[0], rcfg.N_samples))
            loss, dparams, dro, drd, _aux = vg_main(
                opt_vars["params"], ro, rd, gt_d_f, gt_c_f, ray_w, t_reg,
                z2, bound)
            dcams = (jnp.zeros_like(opt_vars["cams"]) if no_cam
                     else rays_vjp((dro, drd))[0])
            grads = {"params": dparams, "cams": dcams, "grids": {}}
            return make_update(loss, grads, opt_vars, opt_state)

        inner_keys = jax.random.split(keys[-1], resample_k)
        return jax.lax.scan(inner, (opt_vars, opt_state), inner_keys)

    def loss_fn(opt_vars, fixed_cams, frame_valid, ba_mask, colors, depths,
                bound, key, n_valid_frames):
        params = opt_vars["params"]
        c_grid = opt_vars["grids"] if nice else None
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
        weights = z_vals = None
        if use_mega:
            # identical draws to the XLA regulation path: stratified_zvals
            # consumes uniform(k_reg, (N, N_samples)) (core/sampling.py:54)
            t_reg = jax.random.uniform(k_reg,
                                       (rays_o.shape[0], rcfg.N_samples))
            depth, var, color, sigma = fused_render(
                params, rays_o, rays_d, gt_d, t_reg, bound)
        else:
            depth, var, color, weights, z_vals, sig_samples = render_rays(
                params, model_cfg, rcfg, rays_o, rays_d, bound, k_render,
                gt_d, c_grid=c_grid, stage=stage, with_zvals=True)
        depth_mask = (gt_d > 0).astype(jnp.float32) * ray_w
        loss = jnp.sum(jnp.abs(gt_d - depth) * depth_mask)
        if ecfg.w_beyond_loss > 0:
            # beyond-surface weight-mass penalty — a DEVIATION from the
            # reference loss (PARITY.md #25): the reference's L1-of-mean
            # admits a degenerate partially-opaque optimum (surface spike
            # + leftover transmittance parked on the far 1e10-sentinel
            # sample, spike shifted so the MEAN still equals gt). It fits
            # the training view exactly yet mis-renders under any
            # viewpoint shift, freezing the tracker. Penalizing the
            # compositing mass past 1.05*gt forces the ray to terminate
            # at the observed surface; occluded geometry is untouched
            # (weights, not densities, are penalized). A sqrt(Var[z])
            # penalty was tried first and has its own trivial optimum
            # (ALL mass on the sentinel: var=0) — this one penalizes
            # exactly that mass. Default 0.0 = exact reference loss.
            # absolute margin: a relative band (1.05*gt, the reference's
            # N_surface convention) grows to ~20 cm at far walls and lets
            # the out-of-AABB sentinel backstop escape the penalty there
            # termination (line-of-sight) form — one term, 1 - in-band
            # mass. A beyond-mass-only penalty was measured too weak live:
            # its gradient reaches the surface sigma only through the
            # transmittance chain (raise alpha before the leak), while this
            # form ALSO has the direct d(w_in)/d(sigma_in) > 0 path; in the
            # free-parameter equilibrium at matched budgets it reaches
            # in-band mass 0.92 vs 0.18 (same Adam steps). Same family as
            # the published URF/DS-NeRF line-of-sight depth losses. Band is
            # asymmetric [gt-0.10, gt+0.05]: the stratified spacing
            # (~(gt+0.14)/31 <= 0.13 m at room scale) guarantees a sample
            # inside, and the out-of-AABB backstop sample (>= 0.14 m past
            # the wall with the room_bench bound) always falls OUTSIDE.
            # A relu(sigma) density-release companion term was tried and
            # HURTS (MLP smoothness drags the adjacent surface down).
            in_band = ((z_vals > gt_d[:, None] - _BEYOND_LO)
                       & (z_vals < gt_d[:, None] + _BEYOND_HI)
                       ).astype(jnp.float32)
            m_in = jnp.sum(weights * in_band, axis=-1)
            loss = loss + ecfg.w_beyond_loss * jnp.sum(
                (1.0 - m_in) * depth_mask)
            del sig_samples
        if color_in_loss:
            color_loss = jnp.sum(jnp.abs(gt_c - color).sum(-1) * ray_w)
            loss = loss + ecfg.w_color_loss_m * color_loss
        if not ecfg.occupancy:
            if not use_mega:
                sigma = regulation(params, model_cfg, rcfg, rays_o, rays_d,
                                   gt_d, bound, k_reg, c_grid=c_grid,
                                   stage=stage)
                sigma = sigma.reshape(rays_o.shape[0], -1)
            loss = loss + 0.0005 * jnp.sum(jnp.abs(sigma) * ray_w[:, None])
        return loss

    def make_tx():
        txs = {"dec": optax.adam(dec_lr), "cam": optax.adam(ecfg.BA_cam_lr),
               "frozen": optax.set_to_zero()}
        if nice:
            for name, lr in (grid_lrs or {}).items():
                txs[name] = optax.adam(lr)

        def dec_label(name):
            # upstream trains only the fine/color decoders, gated by
            # fix_fine/fix_color (Mapper.py:447-453); middle/coarse stay at
            # their (pretrained) init
            if not nice:
                return "dec"
            if name == "fine" and not ecfg.fix_fine:
                return "dec"
            if name == "color" and not ecfg.fix_color:
                return "dec"
            return "frozen"

        def label_fn(opt_vars):
            if nice:
                p_labels = {
                    name: jax.tree_util.tree_map(lambda _: dec_label(name),
                                                 sub)
                    for name, sub in opt_vars["params"].items()}
            else:
                p_labels = jax.tree_util.tree_map(lambda _: "dec",
                                                  opt_vars["params"])
            return {
                "params": p_labels,
                "cams": "cam",
                "grids": {name: name for name in opt_vars["grids"]},
            }

        return optax.multi_transform(txs, label_fn)

    def _run_iters(params, c_grid, colors, depths, fixed_cams, frame_valid,
                   ba_mask, bound, key, grid_masks, num_iters: int):
        """The full num_iters scanned loop (runs per-device under shard_map
        when mesh is set; all carried state stays replicated)."""
        opt_vars = {"params": params, "grids": c_grid if nice else {},
                    "cams": fixed_cams}
        tx = make_tx()
        opt_state = tx.init(opt_vars)
        n_valid_frames = jnp.sum(frame_valid)

        def apply_update(loss, grads, opt_vars, opt_state):
            """Shared psum/mask/Adam tail of one iteration."""
            if mesh is not None:
                grads = jax.lax.psum(grads, "data")   # all-reduce over ICI
                loss = jax.lax.psum(loss, "data")
            grads["cams"] = grads["cams"] * ba_mask[:, None]
            if use_grid_masks:
                grads["grids"] = {name: g * grid_masks[name]
                                  for name, g in grads["grids"].items()}
            updates, opt_state = tx.update(grads, opt_state)
            opt_vars = optax.apply_updates(opt_vars, updates)
            return (opt_vars, opt_state), loss

        def body(carry, k):
            opt_vars, opt_state = carry
            if mesh is not None:
                k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            if use_vg:
                loss, grads = vg_loss(
                    opt_vars, fixed_cams, frame_valid, ba_mask, colors,
                    depths, bound, k, n_valid_frames)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(
                    opt_vars, fixed_cams, frame_valid, ba_mask, colors,
                    depths, bound, k, n_valid_frames)
            return apply_update(loss, grads, opt_vars, opt_state)

        if vg_main is not None and num_iters % resample_k == 0:
            # resample-every-K: scan over rounds of K iterations sharing
            # one pixel batch + z2 (keys fold per device, as in body)
            def round_body(carry, k):
                if mesh is not None:
                    k = jax.random.fold_in(k, jax.lax.axis_index("data"))
                return vg_round(carry, k, apply_update, fixed_cams,
                                frame_valid, ba_mask, colors, depths,
                                bound, n_valid_frames)

            keys = jax.random.split(key, num_iters // resample_k)
            (opt_vars, _), losses = jax.lax.scan(
                round_body, (opt_vars, opt_state), keys)
            losses = losses.reshape(-1)
        else:
            keys = jax.random.split(key, num_iters)
            (opt_vars, _), losses = jax.lax.scan(
                body, (opt_vars, opt_state), keys)
        cams = jnp.where(ba_mask[:, None], opt_vars["cams"], fixed_cams)
        grids_out = opt_vars["grids"] if nice else c_grid
        return opt_vars["params"], grids_out, cams, losses

    @partial(jax.jit, static_argnames=("num_iters",))
    def _mapper_step_masked(params, c_grid, colors, depths, fixed_cams,
                            frame_valid, ba_mask, bound, key, grid_masks,
                            num_iters: int):
        run = partial(_run_iters, num_iters=num_iters)
        if mesh is not None:
            run = jax.shard_map(run, mesh=mesh, in_specs=(P(),) * 10,
                                out_specs=(P(),) * 4, check_vma=False)
        return run(params, c_grid, colors, depths, fixed_cams, frame_valid,
                   ba_mask, bound, key, grid_masks)

    @partial(jax.jit, static_argnames=("num_iters",))
    def mapper_step(params, c_grid, colors, depths, fixed_cams, frame_valid,
                    ba_mask, bound, key, num_iters: int):
        """Run num_iters mapping iterations on device.

        Returns (params, c_grid, cams, losses)."""
        run = partial(_run_iters, grid_masks={}, num_iters=num_iters)
        if mesh is not None:
            run = jax.shard_map(run, mesh=mesh, in_specs=(P(),) * 9,
                                out_specs=(P(),) * 4, check_vma=False)
        return run(params, c_grid, colors, depths, fixed_cams, frame_valid,
                   ba_mask, bound, key)

    @partial(jax.jit, static_argnames=("num_iters",))
    def mapper_multi_step(params, c_grid, colors, depths, fixed_cams,
                          frame_valid, ba_mask, bound, key, num_iters: int):
        """Fused outer loop (round 5): the reference's 3-outer x num_iters
        schedule (Mapper.py:788-814) as ONE device dispatch — lax.scan over
        pre-gathered keyframe WINDOWS (leading axis O on colors/depths/
        cams/valid/ba_mask), params carried across outers. Exactly the
        host loop's semantics for the no-BA single-stage (iMAP*) path:
        window re-selection stays per-outer (the host pre-draws the same
        np_rng sequence), cams are pass-through, only the device PRNG
        stream differs (one key split O ways). Saves (O-1) host dispatch
        round-trips (~34 ms each over the axon tunnel) plus per-call glue.

        Returns (params, c_grid, cams_last, losses (O*num_iters,))."""
        def outer_body(carry, xs):
            p, g = carry
            col, dep, cams, val, bam, k = xs
            run = partial(_run_iters, grid_masks={}, num_iters=num_iters)
            if mesh is not None:
                run = jax.shard_map(run, mesh=mesh, in_specs=(P(),) * 9,
                                    out_specs=(P(),) * 4, check_vma=False)
            p2, g2, cams_out, losses = run(p, g, col, dep, cams, val, bam,
                                           bound, k)
            return (p2, g2), (cams_out, losses)

        keys = jax.random.split(key, colors.shape[0])
        (params, c_grid), (cams_o, losses) = jax.lax.scan(
            outer_body, (params, c_grid),
            (colors, depths, fixed_cams, frame_valid, ba_mask, keys))
        return params, c_grid, cams_o[-1], losses.reshape(-1)

    if use_grid_masks:
        return _mapper_step_masked
    return mapper_multi_step if outer_fused else mapper_step
