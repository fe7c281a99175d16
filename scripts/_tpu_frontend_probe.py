"""Probe: weak-mode front-end bootstrap internals on the room_bench_weak
sequence (diagnoses 'only 0 accepted triangulations' at every attempt).

Prints per-pair telemetry: keypoints, matches, inliers, accepted
triangulations, scale — for growing baselines.
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
from pointnerf_slam_tpu.io.datasets import get_dataset
from pointnerf_slam_tpu.frontend import SparseFrontend

N = int(os.environ.get("PROBE_FRAMES", "40"))
cfg = load_config(os.path.join(
    _REPO, os.environ.get("PROBE_CFG",
                          "configs/Synthetic/room_bench_weak.yaml")))
cfg["data"]["n_frames"] = N
cfg["data"]["orbit"] = 0.5 * N / 500.0
ds = get_dataset(cfg)
H, W = ds.H, ds.W
fe = SparseFrontend(cfg, H, W, ds.fx, ds.fy, ds.cx, ds.cy)

_, c0, d0, p0 = ds[0]
feats0 = fe._extract(c0)
print(f"frame 0: {int(np.asarray(feats0[2]).sum())} keypoints", flush=True)

from pointnerf_slam_tpu.frontend.frontend import nerf_c2w_to_cv_w2c
z = np.sort(np.asarray(d0).reshape(-1))
fe.median_gt_depth = float(z[(len(z) - 1) // 2])
Tcw0 = nerf_c2w_to_cv_w2c(p0)

for cur in (5, 10, 20, 35):
    _, cc, _, pc = ds[cur]
    feats = fe._extract(cc)
    nkp = int(np.asarray(feats[2]).sum())
    try:
        r = fe._two_view(feats0, feats, Tcw0, set_scale=False)
        print(f"pair (0,{cur}): kps {nkp}  matches {r['n_matches']}  "
              f"inliers {r['n_inliers']}  n_cand {r['n_cand']}  "
              f"n_accept {r['n_accept']}  scale {float(r['scale']):.4f}",
              flush=True)
        # where do candidates die? re-run pieces if exposed
        for k in ("score_med", "score_mad"):
            if k in r:
                print(f"   {k}: {float(r[k]):.4f}", flush=True)
    except Exception as e:
        print(f"pair (0,{cur}): kps {nkp}  FAILED: {e}", flush=True)
