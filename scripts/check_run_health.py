"""Live-run trajectory health check — numpy-only, axon-safe.

Reads the latest checkpoint of a running (or finished) oracle run and
reports the statistics the round-4 run-1 forensics used to find the scale
blow-up (RESULTS.md): per-tracked-frame step lengths est vs gt, their
ratio, and a frame-0-anchored ATE proxy. No jax import, so it can run
next to a live TPU job as long as the interpreter skips the axon
sitecustomize:

    PYTHONPATH=/opt/venv/lib/python3.12/site-packages \
        python -S scripts/check_run_health.py output/Synthetic/room_bench_weak

(`python -S` skips site.py -> skips the axon client registration that can
kill the single-client tunnel; PYTHONPATH restores numpy. PERF.md round 4,
operational note.)
"""

import glob
import os
import sys

import numpy as np


def main(out_dir: str, track_every: int = 5):
    ckpts = sorted(glob.glob(os.path.join(out_dir, "ckpts", "*.npz")))
    if not ckpts:
        print(f"no checkpoints under {out_dir}/ckpts yet")
        return
    path = ckpts[-1]
    z = np.load(path)
    idx = int(z["idx"])
    est = z["estimate_c2w_list"][: idx + 1 : track_every, :3, 3]
    gt = z["gt_c2w_list"][: idx + 1 : track_every, :3, 3]
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]
    print(f"ckpt {os.path.basename(path)}  frame {idx}  "
          f"({n} tracked poses)")
    if n < 3:
        return

    d_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1)
    ratio = d_est / np.maximum(d_gt, 1e-9)
    print(f"step est: med {np.median(d_est)*1e3:.1f} mm  "
          f"max {d_est.max()*1e3:.1f} mm")
    print(f"step gt : med {np.median(d_gt)*1e3:.1f} mm")
    print(f"est/gt step ratio: med {np.median(ratio):.2f}  "
          f"p90 {np.percentile(ratio, 90):.2f}  max {ratio.max():.2f}")

    # frame-0-anchored ATE proxy (no Horn: both trajectories share the
    # gt frame-0 pose by construction, so raw RMSE is an upper bound)
    ate = np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1)))
    drift = np.linalg.norm(est[-1] - gt[-1])
    print(f"ATE proxy (frame-0 anchored RMSE): {ate*1e3:.1f} mm;  "
          f"final-pose drift {drift*1e3:.1f} mm")
    bad = np.where(ratio > 3.0)[0]
    if len(bad):
        print(f"WARNING: {len(bad)} tracked steps exceed 3x gt "
              f"(first at tracked-pose #{bad[0]}) — run-1 failure mode")
    fe_scale = z.get("fe_depth_scale")
    if fe_scale is not None:
        print(f"carried depth_scale {float(fe_scale):.4f}  "
              f"median_gt_depth {float(z['fe_median_gt_depth']):.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "output/Synthetic/room_bench_weak")
