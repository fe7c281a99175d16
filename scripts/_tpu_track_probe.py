"""Probe: does the tracker recover a known pose perturbation on real TPU?

A/B of the fused-VG camera-gradient path vs the pure-XLA path, on a
converged field (the room_bench final checkpoint) against a real dataset
frame. Diagnoses the room_bench frozen-pose failure (estimates stuck at
frame 0 while gt moved 30 cm).
"""
import os, time
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", _CACHE)
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnerf_slam_tpu.io.config import load_config
from pointnerf_slam_tpu.io.datasets import get_dataset
from pointnerf_slam_tpu.engine.state import EngineConfig
from pointnerf_slam_tpu.engine.tracker import make_tracking_step
from pointnerf_slam_tpu.models import MLPConfig
from pointnerf_slam_tpu.render import RenderConfig
from pointnerf_slam_tpu.core.se3 import rot_to_quat

cfg = load_config("configs/Synthetic/room_bench.yaml")
ds = get_dataset(cfg)
H, W = cfg["cam"]["H"], cfg["cam"]["W"]
fx, fy, cx, cy = (cfg["cam"][k] for k in ("fx", "fy", "cx", "cy"))

# field params from the completed run
z = np.load("output/Synthetic/room_bench/ckpts/00499.npz")
n = int(z["n_params"])
leaves = [jnp.asarray(z[f"param_{i}"]) for i in range(n)]
model_cfg = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256,
                      skips=(), n_blocks=4)
from pointnerf_slam_tpu.models import init_mlp
import jax.tree_util as jtu
ref = init_mlp(jax.random.PRNGKey(0), model_cfg)
treedef = jtu.tree_structure(ref)
params = jtu.tree_unflatten(treedef, leaves)

rcfg = RenderConfig(N_samples=32, N_surface=0, N_importance=12)
bound = jnp.asarray(cfg["mapping"]["bound"], jnp.float32)

def cam7(c2w):
    q = rot_to_quat(jnp.asarray(c2w[:3, :3]))
    return jnp.concatenate([q, jnp.asarray(c2w[:3, 3])])

# frame 0: the field is anchored there (est pose == gt pose at frame 0)
idx, color, depth, c2w_gt = ds[0]
color = jnp.asarray(color)
depth = jnp.asarray(depth)

results = {}
for mk in ("auto", "off"):   # auto -> fused VG on TPU; off -> XLA path
    ecfg = EngineConfig(
        H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
        tracking_pixels=5000, num_cam_iters=50, cam_lr=1e-3,
        weak_depth=False, depth_supervision=True, gt_camera=False,
        megakernel=mk)
    step = make_tracking_step(model_cfg, rcfg, ecfg)
    for pert in (0.0, 0.02, 0.05):
        c2w0 = np.asarray(c2w_gt).copy()
        c2w0[1, 3] += pert  # translate along +y (the orbit direction)
        cam0 = cam7(c2w0)
        best, best_loss, first_loss = step(params, {}, cam0, color, depth,
                                           bound, jax.random.PRNGKey(5))
        best = np.asarray(best)
        gtc = np.asarray(cam7(np.asarray(c2w_gt)))
        err0 = np.linalg.norm(np.asarray(cam0)[4:] - gtc[4:])
        err1 = np.linalg.norm(best[4:] - gtc[4:])
        moved = np.linalg.norm(best - np.asarray(cam0))
        print(f"mk={mk} pert={pert*100:.0f}cm: loss {float(first_loss):.2f}"
              f" -> {float(best_loss):.2f}; t-err {err0*100:.2f}"
              f" -> {err1*100:.2f} cm; |dcam| {moved:.5f}", flush=True)
        results[(mk, pert)] = err1
print("done")
