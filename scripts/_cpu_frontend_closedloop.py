"""Closed-loop CPU sim of the weak-mode front-end chain (no NeRF refine).

Replays the ENGINE's weak-tracking loop (system.py weak branch) against
the real flagship sequence on CPU: bootstrap-with-parallax-wait, motion
model prediction, track_continuous (reference-keyframe two-view + map
bookkeeping + map-anchored scale), pose back-fill — with the front-end
pose taken verbatim (the NeRF tracker normally refines it; this isolates
the front-end's contribution to the trajectory error).

Usage (CPU-safe next to a live TPU job):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/_cpu_frontend_closedloop.py [n_frames]

Prints per-tracked-frame telemetry and the run-3 health metrics
(scripts/check_run_health.py): step ratios + frame-0-anchored ATE proxy.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache_cpu"))

import numpy as np

from pointnerf_slam_tpu.core.se3_np import interp_c2w_np
from pointnerf_slam_tpu.frontend import SparseFrontend
from pointnerf_slam_tpu.frontend.frontend import nerf_c2w_to_cv_w2c  # noqa
from pointnerf_slam_tpu.io.config import load_config
from pointnerf_slam_tpu.io.datasets import get_dataset


def main(n_frames: int = 200, track_every: int = 5):
    cfg = load_config(os.path.join(
        _REPO, "configs/Synthetic/room_bench_weak.yaml"))
    cfg["data"]["n_frames"] = n_frames
    # same per-frame motion as the 500-frame flagship (a(i) ~ i*orbit/n)
    cfg["data"]["orbit"] = 0.5 * n_frames / 500.0
    ds = get_dataset(cfg)
    fe = SparseFrontend(cfg, ds.H, ds.W, ds.fx, ds.fy, ds.cx, ds.cy)

    gt = np.stack([np.asarray(ds[i][3]) for i in range(n_frames)])
    est = np.zeros_like(gt)
    est[0] = gt[0]

    bootstrapped = False
    for idx in range(1, n_frames):
        if idx % track_every:
            est[idx] = est[idx - 1]
            continue
        if not bootstrapped:
            try:
                e, _, _ = fe.bootstrap(ds, 0, idx, est[0])
                est[idx] = e
                for k in range(1, idx):
                    est[k] = interp_c2w_np(est[0], est[idx], k / idx)
                bootstrapped = True
                print(f"bootstrap at {idx}", flush=True)
            except RuntimeError as ex:
                print(f"bootstrap deferred at {idx}: {ex}", flush=True)
                est[idx] = est[idx - 1]
            continue
        # engine motion model (system._frontend_frame)
        if idx - 2 * track_every >= 0:
            pre = est[idx - track_every]
            prepre = est[idx - 2 * track_every]
            est[idx] = pre @ np.linalg.inv(prepre) @ pre
        else:
            est[idx] = est[idx - 1]
        e, _ = fe.track_continuous(ds, idx, est)
        if e is not None:
            est[idx] = e
        t = fe.telemetry[-1]
        err = np.linalg.norm(est[idx][:3, 3] - gt[idx][:3, 3])
        print(f"f{idx:3d} ref={t.get('ref_idx', '?')} "
              f"par={t.get('parallax', float('nan')):5.2f} "
              f"acc={t.get('n_accept', -1):4d} "
              f"f_map={t.get('f_map', float('nan')):5.3f}"
              f"({t.get('n_map_anchor', 0):3d}) "
              f"solved={'y' if e is not None else 'N'} "
              f"err={err * 1e3:6.1f} mm", flush=True)
        lo = idx - track_every
        for k in range(lo + 1, idx):
            est[k] = interp_c2w_np(est[lo], est[idx],
                                   (k - lo) / track_every)

    te, tg = est[:, :3, 3], gt[:, :3, 3]
    ate = np.sqrt(np.mean(np.sum((te - tg) ** 2, axis=1)))
    d_est = np.linalg.norm(np.diff(te[::track_every], axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(tg[::track_every], axis=0), axis=1)
    ratio = d_est / np.maximum(d_gt, 1e-9)
    print(f"\nALL-FRAME ATE proxy (frame-0 anchored): {ate * 1e3:.1f} mm; "
          f"final drift {np.linalg.norm(te[-1] - tg[-1]) * 1e3:.1f} mm")
    print(f"tracked-step est/gt ratio: med {np.median(ratio):.3f} "
          f"p10 {np.percentile(ratio, 10):.2f} "
          f"p90 {np.percentile(ratio, 90):.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
