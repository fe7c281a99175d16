"""Multi-scene batched mapping: one device program optimizes N independent
scenes at once (SURVEY §7 step 7 — throughput scale-up by batching scenes
along a leading axis; on a pod slice, combine with a scene-sharded mesh
axis for linear scale-out).

Every scene carries its own decoder params, keyframe window, poses, and
bound; the whole mapper step (sampling -> render -> loss -> Adam) vmaps
over the scene axis, turning the 256-wide MLP matmuls into
(scenes * points)-row matmuls that feed the MXU far better than a single
scene's ray budget."""

from __future__ import annotations

from functools import partial

import jax

from ..engine.mapper import make_mapper_step


def make_multiscene_mapper_step(model_cfg, rcfg, ecfg, max_frames: int):
    """Returns step(params_stack, c_grid_stack, colors, depths, cams,
    valid, ba_mask, bounds, keys, num_iters) where every array has a
    leading scene axis. params_stack is a pytree whose leaves are stacked
    along axis 0."""
    base = make_mapper_step(model_cfg, rcfg, ecfg, max_frames)

    @partial(jax.jit, static_argnames=("num_iters",))
    def step(params_stack, c_grid_stack, colors, depths, cams, valid,
             ba_mask, bounds, keys, num_iters: int):
        return jax.vmap(
            lambda p, g, c, d, cm, v, b, bd, k: base(
                p, g, c, d, cm, v, b, bd, k, num_iters),
        )(params_stack, c_grid_stack, colors, depths, cams, valid, ba_mask,
          bounds, keys)

    return step


def stack_scenes(trees):
    """Stack a list of per-scene pytrees along a new leading axis."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
