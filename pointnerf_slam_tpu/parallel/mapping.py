"""Multi-chip scale-out of the mapping workload.

The reference has no collectives at all (two processes + shared memory,
SURVEY §2.4); its de-facto parallel dimension is the ray batch
(Renderer chunking, §5.7). The TPU-native equivalent: shard the ray batch
over the device mesh ('data' axis), replicate the decoder params (256-hidden
MLP replicates trivially), and let XLA insert the psum for the gradient
all-reduce over ICI. This is plain pjit-style sharding — no hand-written
collectives needed for this model family.

Used by __graft_entry__.dryrun_multichip and by the engine when
jax.device_count() > 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.renderer import RenderConfig, regulation, render_rays


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_sharded_mapping_step(model_cfg, rcfg: RenderConfig, mesh: Mesh,
                              lr: float = 2e-4, occupancy: bool = False,
                              w_color: float = 0.05):
    """Build a jitted, ray-sharded mapping train step.

    The step consumes pre-sampled rays (origin, direction, gt depth, gt
    color) sharded along the mesh 'data' axis; params/opt state replicate.
    Returns (step_fn, shard_rays) where shard_rays places host arrays with
    the right sharding.
    """
    tx = optax.adam(lr)
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def loss_fn(params, rays_o, rays_d, gt_d, gt_c, bound, key):
        k_r, k_reg = jax.random.split(key)
        depth, var, color, _ = render_rays(params, model_cfg, rcfg, rays_o,
                                           rays_d, bound, k_r, gt_d)
        mask = (gt_d > 0).astype(jnp.float32)
        loss = jnp.sum(jnp.abs(gt_d - depth) * mask)
        loss = loss + w_color * jnp.sum(jnp.abs(gt_c - color).sum(-1))
        if not occupancy:
            sig = regulation(params, model_cfg, rcfg, rays_o, rays_d, gt_d,
                             bound, k_reg)
            loss = loss + 0.0005 * jnp.sum(jnp.abs(sig))
        return loss

    @partial(jax.jit,
             in_shardings=(repl, repl, data_sharding, data_sharding,
                           data_sharding, data_sharding, repl, repl),
             out_shardings=(repl, repl, repl),
             donate_argnums=(0, 1))
    def step(params, opt_state, rays_o, rays_d, gt_d, gt_c, bound, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, rays_o, rays_d,
                                                  gt_d, gt_c, bound, key)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_opt(params):
        return tx.init(params)

    def shard_rays(x):
        return jax.device_put(x, data_sharding)

    return step, init_opt, shard_rays


def make_shardmap_mapper_step(model_cfg, rcfg: RenderConfig, mesh: Mesh,
                              ecfg, max_frames: int):
    """FULL mapping train step under shard_map: every device samples its own
    slice of the ray budget from the (replicated) keyframe window, renders,
    and contributes psum-reduced gradients; params/opt-state replicate.

    This is the engine's mapper_step body running SPMD — the multi-chip
    configuration the driver dry-runs (dp over rays; the 256-wide decoder
    replicates, SURVEY §5.7)."""
    from functools import partial as _partial

    from jax.experimental.shard_map import shard_map

    from ..core.rays import gather_pixels, rays_from_uv, sample_uv_uniform, \
        sample_uv_valid
    from ..core.se3 import camera_from_tensor

    n_dev = mesh.devices.size
    H, W = ecfg.H, ecfg.W
    pixs_per_frame = max(ecfg.mapping_pixels // max_frames // n_dev, 1)
    tx = optax.adam(ecfg.imap_decoders_lr)

    def local_loss(params, colors, depths, cams, frame_valid, bound, key):
        """Per-shard loss over this device's ray slice."""
        dev = jax.lax.axis_index("data")
        key = jax.random.fold_in(key, dev)
        c2w = camera_from_tensor(cams)

        def sample_frame(k, col, dep, c2w34):
            if ecfg.weak_depth:
                idx, _ = sample_uv_valid(k, dep > 0.01, pixs_per_frame)
            else:
                idx = sample_uv_uniform(k, W, 0, H, 0, W, pixs_per_frame)
            i, j, d, c = gather_pixels(idx, W, dep,
                                       col.astype(jnp.float32) / 255.0)
            o, dd = rays_from_uv(i, j, c2w34, ecfg.fx, ecfg.fy, ecfg.cx,
                                 ecfg.cy)
            return o, dd, d, c

        keys = jax.random.split(key, max_frames + 1)
        o, dd, d, c = jax.vmap(sample_frame)(keys[:max_frames], colors,
                                             depths, c2w)
        o = o.reshape(-1, 3)
        dd = dd.reshape(-1, 3)
        d = d.reshape(-1)
        c = c.reshape(-1, 3)
        w = jnp.repeat(frame_valid.astype(jnp.float32), pixs_per_frame)

        k_r, k_reg = jax.random.split(keys[-1])
        dep, var, col, _ = render_rays(params, model_cfg, rcfg, o, dd,
                                       bound, k_r, d)
        loss = jnp.sum(jnp.abs(d - dep) * (d > 0) * w)
        loss = loss + ecfg.w_color_loss_m * jnp.sum(
            jnp.abs(c - col).sum(-1) * w)
        if not ecfg.occupancy:
            sig = regulation(params, model_cfg, rcfg, o, dd, d, bound,
                             k_reg).reshape(o.shape[0], -1)
            loss = loss + 0.0005 * jnp.sum(jnp.abs(sig) * w[:, None])
        return loss

    def spmd_step(params, opt_state, colors, depths, cams, frame_valid,
                  bound, key):
        loss, grads = jax.value_and_grad(local_loss)(
            params, colors, depths, cams, frame_valid, bound, key)
        grads = jax.lax.psum(grads, "data")   # all-reduce over ICI
        loss = jax.lax.psum(loss, "data")
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    repl = P()
    sharded = jax.jit(shard_map(
        spmd_step, mesh=mesh,
        in_specs=(repl, repl, repl, repl, repl, repl, repl, repl),
        out_specs=(repl, repl, repl),
        check_rep=False))

    return sharded, (lambda params: tx.init(params))
