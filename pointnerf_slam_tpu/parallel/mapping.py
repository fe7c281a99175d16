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
    """FULL mapping train step under shard_map — thin adapter over the
    engine's own `make_mapper_step(mesh=...)` (engine/mapper.py), which IS
    the SPMD configuration: every device samples its own slice of the ray
    budget from the (replicated) keyframe window, renders, and contributes
    psum-reduced gradients over ICI; params/opt-state replicate (dp over
    rays; the 256-wide decoder replicates, SURVEY §5.7).

    Kept as an API shim for the driver dryrun / benchmarks; the live engine
    calls make_mapper_step(mesh=...) directly. The returned step runs ONE
    Adam iteration (a fresh optimizer per call, matching the reference's
    fresh torch Adam per optimize_map invocation, Mapper.py:499-505); the
    opt_state argument is accepted and threaded for signature compatibility.
    """
    from ..engine.mapper import make_mapper_step

    step = make_mapper_step(model_cfg, rcfg, ecfg, max_frames, mesh=mesh)

    def run(params, opt_state, colors, depths, cams, frame_valid, bound,
            key, num_iters: int = 1):
        ba_mask = jnp.zeros((max_frames,), bool)
        params, _, _, losses = step(params, {}, colors, depths, cams,
                                    frame_valid, ba_mask, bound, key,
                                    num_iters)
        return params, opt_state, losses[-1]

    return run, (lambda params: None)
