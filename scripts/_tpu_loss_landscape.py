"""Probe: tracking-loss landscape for a NOVEL view on a frame-0 field.

Trains the room_bench field on frame 0 only (live engine flow), then
evaluates the tracking loss for frame 1's image at cameras swept along
the true motion direction: c(t) = pose0 + t * (pose1_gt - pose0),
t in [-1, 3] (t=0 init, t=1 gt). Key-averaged to kill sampling noise.

If the minimum is NOT at t=1, the field/renderer systematically
mis-localizes novel views -> explains the room_bench frozen trajectory
(scripts/_tpu_engine_track_probe.py: frame-1 err 7.6 -> 9.0 mm).
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
_CACHE = os.path.join(_REPO, ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", _CACHE)
import jax.numpy as jnp
import numpy as np

from pointnerf_slam_tpu.io.config import load_config
from pointnerf_slam_tpu.engine import PointNeRFSLAM

N = 12
cfg = load_config(os.path.join(_REPO, "configs/Synthetic/room_bench.yaml"))
cfg["verbose"] = False
cfg["data"]["n_frames"] = N
cfg["data"]["orbit"] = 0.5 * N / 500.0   # true ~7.5 mm/frame speed
cfg["data"]["output"] = "/tmp/diag_ll"
cfg["mapping"]["iters_first"] = int(os.environ.get("ITERS_FIRST", "1500"))
if os.environ.get("PROBE_BEYOND"):           # w_beyond_loss sharpness penalty
    cfg["mapping"]["w_beyond_loss"] = float(os.environ["PROBE_BEYOND"])
slam = PointNeRFSLAM(cfg)

_, c0, d0, p0 = slam.frame_reader[0]
slam.step(0, c0, d0, p0)
print("frame-0 field trained", flush=True)

_, c1, d1, p1 = slam.frame_reader[1]

from pointnerf_slam_tpu.core.rays import gather_pixels, rays_from_uv, \
    sample_uv_uniform
from pointnerf_slam_tpu.core.se3 import camera_from_tensor
from pointnerf_slam_tpu.render.renderer import render_rays

e = slam.ecfg
rcfg = slam.rcfg
model_cfg = slam.model_cfg
n_rays = e.tracking_pixels

color_dev = jnp.asarray(c1)
depth_dev = jnp.asarray(d1)


@jax.jit
def loss_at(cam_tensor, key):
    c2w = camera_from_tensor(cam_tensor)
    k_s, k_r = jax.random.split(key)
    idx = sample_uv_uniform(k_s, e.W, e.ignore_edge_H, e.H - e.ignore_edge_H,
                            e.ignore_edge_W, e.W - e.ignore_edge_W, n_rays)
    i, j, gt_d, gt_c = gather_pixels(idx, e.W, depth_dev, color_dev)
    rays_o, rays_d = rays_from_uv(i, j, c2w, e.fx, e.fy, e.cx, e.cy)
    dep, var, col, _ = render_rays(slam.params, model_cfg, rcfg, rays_o,
                                   rays_d, slam.bound, k_r, gt_d,
                                   c_grid=slam.c_grid, stage="color")
    var = jax.lax.stop_gradient(var)
    mask = (gt_d > 0).astype(jnp.float32)
    tmp = jnp.abs(gt_d - dep) / jnp.sqrt(var + 1e-10)
    dloss = jnp.sum(tmp * mask)
    closs = jnp.sum(jnp.abs(gt_c - col).sum(-1) * mask)
    # handle_dynamic variant (reference Tracker.py:307, nice_slam True):
    # mask rays whose weighted depth error exceeds 10x the median —
    # rejects disocclusion/untrained-region outliers
    rmask = ((tmp < 10 * jnp.median(tmp)) & (gt_d > 0)).astype(jnp.float32)
    rd = jnp.sum(tmp * rmask)
    rc = jnp.sum(jnp.abs(gt_c - col).sum(-1) * rmask)
    return dloss, closs, rd, rc


cam0 = slam._cam7(p0)          # init (= frame-0 pose)
cam1 = slam._cam7(np.asarray(p1))  # gt frame-1 pose
keys = [jax.random.PRNGKey(100 + i) for i in range(8)]

print(" t      depth_loss     color_loss    robust_d      robust_c"
      "   (t=0 init, t=1 gt)", flush=True)
for t in (-1.0, -0.5, 0.0, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 3.0):
    cam = (1 - t) * cam0 + t * cam1
    dl = cl = rd = rc = 0.0
    for k in keys:
        a, b, c, d = loss_at(jnp.asarray(cam), k)
        dl += float(a); cl += float(b); rd += float(c); rc += float(d)
    n = len(keys)
    print(f"{t:5.2f}  {dl/n:12.2f}  {cl/n:12.2f}  {rd/n:12.2f}  {rc/n:12.2f}",
          flush=True)

# gradient direction check at init: key-averaged d(loss)/d(cam) vs the
# true direction (cam1 - cam0)
total = jnp.asarray(cam1) - jnp.asarray(cam0)


def full_loss(cam, key):
    a, b, _, _ = loss_at(cam, key)
    return a + e.w_color_loss_t * b


g = np.zeros(7)
for k in keys:
    g += np.asarray(jax.grad(full_loss)(jnp.asarray(cam0), k))
g /= len(keys)
tn = np.asarray(total)
print("avg grad:", np.round(g, 3), flush=True)
print("true dir:", np.round(tn, 5), flush=True)
co = -float(np.dot(g, tn) / (np.linalg.norm(g) * np.linalg.norm(tn) + 1e-12))
print(f"cos(-grad, true step) = {co:.3f}  (want ~ +1)", flush=True)
