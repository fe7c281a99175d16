"""Probe: does the ENGINE's tracking follow real motion from a fresh field?

Replicates the live room_bench flow at diagnostic speed: PointNeRFSLAM on
the synthetic dataset at Replica resolution, verbose, 12 frames — printing
per-frame camera error vs gt BEFORE and AFTER tracking. Diagnoses the
frozen-trajectory failure (estimates stuck at frame 0 across two full
500-frame runs while an isolated tracking step recovers perturbations).
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
_CACHE = os.path.join(_REPO, ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", _CACHE)
import numpy as np

from pointnerf_slam_tpu.io.config import load_config
from pointnerf_slam_tpu.engine import PointNeRFSLAM

N_FRAMES = int(os.environ.get("PROBE_FRAMES", "12"))
cfg = load_config(os.path.join(
    _REPO, os.environ.get("PROBE_CFG", "configs/Synthetic/room_bench.yaml")))
cfg["verbose"] = False  # keep defer_commit semantics identical to the run
cfg["data"]["n_frames"] = N_FRAMES
# per-frame motion = 2*pi*orbit/n * 1.2m: rescale orbit so the 12-frame
# diagnostic moves at the SAME ~7.5 mm/frame as the 500-frame run
cfg["data"]["orbit"] = 0.5 * N_FRAMES / 500.0
cfg["data"]["output"] = "/tmp/diag_rb"
cfg["mapping"]["iters_first"] = 500   # fast but usable frame-0 field
if os.environ.get("PROBE_MEGA"):          # "off" -> pure XLA path
    cfg["rendering"]["megakernel"] = os.environ["PROBE_MEGA"]
if os.environ.get("PROBE_BEYOND"):           # w_beyond_loss sharpness penalty
    cfg["mapping"]["w_beyond_loss"] = float(os.environ["PROBE_BEYOND"])
if os.environ.get("PROBE_FRAMES_ITERS"):
    cfg["mapping"]["iters_first"] = int(os.environ["PROBE_FRAMES_ITERS"])
slam = PointNeRFSLAM(cfg)

orig_track = slam._track_frame


def spy_track(idx, color, sensor_depth, gt_c2w, defer_commit=False):
    init_err_src = (slam.estimate_c2w_list[idx - 1] if idx >= 1
                    else gt_c2w)
    out = orig_track(idx, color, sensor_depth, gt_c2w,
                     defer_commit=defer_commit)
    slam._commit_pending_pose()
    est = slam.estimate_c2w_list[idx]
    gt_t = gt_c2w[:3, 3]
    e_after = np.linalg.norm(est[:3, 3] - gt_t) * 1000
    e_before = np.linalg.norm(init_err_src[:3, 3] - gt_t) * 1000
    fl, bl = slam.loss_log["tracking"][-1][1:]
    print(f"frame {idx}: |t err| {e_before:7.2f} -> {e_after:7.2f} mm   "
          f"loss {float(fl):9.2f} -> {float(bl):9.2f}", flush=True)
    return out


slam._track_frame = spy_track
slam.run()
gt = slam.gt_c2w_list
est = slam.estimate_c2w_list
d = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
print("per-frame |t| err (mm):", np.round(d * 1000, 2), flush=True)
