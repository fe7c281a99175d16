"""Probe: novel-view generalization of the frame-0 field.

Trains the room_bench field on frame 0 only, then renders depth at a
fixed pixel grid from: pose0 (training view), pose1 (7.6 mm away), and
pose5 (38 mm away) — comparing each against the ANALYTIC scene depth for
that pose. A correct field has novel-view depth error comparable to its
training-view fit; the frozen-trajectory failure implies it does not
(loss landscape: frame-1 data fits pose0 renders 10x better than pose1
renders, scripts/_tpu_loss_landscape.py).
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
cfg["data"]["orbit"] = 0.5 * N / 500.0
cfg["data"]["output"] = "/tmp/diag_nv"
cfg["mapping"]["iters_first"] = int(os.environ.get("ITERS_FIRST", "1500"))
if os.environ.get("PROBE_MEGA"):          # "off" -> pure XLA path
    cfg["rendering"]["megakernel"] = os.environ["PROBE_MEGA"]
if os.environ.get("PROBE_PERTURB"):
    cfg["rendering"]["perturb"] = float(os.environ["PROBE_PERTURB"])
if os.environ.get("PROBE_BEYOND"):           # w_beyond_loss sharpness penalty
    cfg["mapping"]["w_beyond_loss"] = float(os.environ["PROBE_BEYOND"])
slam = PointNeRFSLAM(cfg)

_, c0, d0, p0 = slam.frame_reader[0]
slam.step(0, c0, d0, p0)
print("frame-0 field trained", flush=True)

from pointnerf_slam_tpu.core.rays import rays_from_uv
from pointnerf_slam_tpu.render.renderer import render_rays

e = slam.ecfg
scene = slam.frame_reader.scene

jj, ii = np.meshgrid(np.arange(20, e.H - 20, 8), np.arange(20, e.W - 20, 8),
                     indexing="ij")
jjf = jnp.asarray(jj.reshape(-1), jnp.float32)
iif = jnp.asarray(ii.reshape(-1), jnp.float32)
n_pix = int(jjf.shape[0])
print(f"grid: {n_pix} pixels", flush=True)


@jax.jit
def render_depth(c2w34, gt_d, key):
    """Render with depth-guided sampling, exactly as the tracker's loss
    sees it (gt_d places the z_vals band per ray)."""
    rays_o, rays_d = rays_from_uv(iif, jjf, c2w34, e.fx, e.fy, e.cx, e.cy)
    dep, var, col, _ = render_rays(slam.params, slam.model_cfg, slam.rcfg,
                                   rays_o, rays_d, slam.bound, key,
                                   gt_d, c_grid=slam.c_grid, stage="color")
    return dep, var


def analytic_depth(c2w):
    dirs = np.stack([(ii.reshape(-1) - e.cx) / e.fx,
                     -(jj.reshape(-1) - e.cy) / e.fy,
                     -np.ones(n_pix)], -1)
    R = c2w[:3, :3]
    rd = dirs @ R.T
    ro = np.broadcast_to(c2w[:3, 3], rd.shape)
    t, _, _ = scene.ray_cast(ro, rd)
    return t


poses = {"pose0 (train)": np.asarray(p0)}
_, _, _, p1 = slam.frame_reader[1]
_, _, _, p5 = slam.frame_reader[5]
poses["pose1 (7.6mm)"] = np.asarray(p1)
poses["pose5 (38mm)"] = np.asarray(p5)
pz = np.asarray(p0).copy()
pz[1, 3] += 0.0076
poses["pose0+7.6mm y"] = pz

key = jax.random.PRNGKey(7)
for name, p in poses.items():
    gt = analytic_depth(p)
    dep, var = render_depth(jnp.asarray(p[:3, :4]),
                            jnp.asarray(gt, jnp.float32), key)
    err = np.abs(np.asarray(dep) - gt)
    print(f"{name:16s} |render-analytic| mean {err.mean()*1000:8.2f} mm  "
          f"p90 {np.percentile(err,90)*1000:8.2f} mm  "
          f"sqrt(var) mean {np.sqrt(np.asarray(var)).mean()*1000:7.2f} mm",
          flush=True)

# weight-mass profile at the training view: where does the compositing
# weight actually sit relative to gt depth?
@jax.jit
def weight_profile(c2w34, gt_d, key):
    rays_o, rays_d = rays_from_uv(iif, jjf, c2w34, e.fx, e.fy, e.cx, e.cy)
    dep, var, col, w = render_rays(slam.params, slam.model_cfg, slam.rcfg,
                                   rays_o, rays_d, slam.bound, key,
                                   gt_d, c_grid=slam.c_grid, stage="color")
    return dep, w


gt0 = analytic_depth(np.asarray(p0))
dep0, w0 = weight_profile(jnp.asarray(np.asarray(p0)[:3, :4]),
                          jnp.asarray(gt0, jnp.float32), key)
w0 = np.asarray(w0)
print(f"weights: sum mean {w0.sum(1).mean():.4f}  "
      f"last-sample mean {w0[:, -1].mean():.4f}  "
      f"max-sample mean {w0.max(1).mean():.4f}", flush=True)

# tracking semantics: gt_d is FRAME 1's depth at the grid pixels,
# rendered from candidate poses -> which pose fits frame-1 data best?
d1g = jnp.asarray(analytic_depth(np.asarray(p1)), jnp.float32)
for name in ("pose0 (train)", "pose1 (7.6mm)"):
    p = poses[name]
    dep, var = render_depth(jnp.asarray(p[:3, :4]), d1g, key)
    err = np.abs(np.asarray(dep) - np.asarray(d1g))
    nl = np.abs(np.asarray(dep) - np.asarray(d1g)) / np.sqrt(
        np.asarray(var) + 1e-10)
    print(f"track@{name:16s} |render-d1| mean {err.mean()*1000:8.2f} mm  "
          f"normalized-loss mean {nl.mean():10.4f}", flush=True)
