"""Distillation sweep for the SuperPoint checkpoint (VERDICT r3 next #5).

Each config: train -> homography match precision -> the gating metric, the
weak-pipeline bootstrap's median relative pseudo-depth error (the number
that kept Harris the live default: Harris ~0.12, round-3 distilled ~0.28).
Target: <= 0.15. The winner is saved to pretrained/superpoint_synthetic.npz
and the live default flips to the CNN.

Run with the TPU otherwise idle (or force CPU first, slow):
  python scripts/sweep_superpoint.py [--quick]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bootstrap_metric(ckpt_path: str) -> float:
    """Median relative pseudo-depth error of the weak bootstrap at frame 5
    (tests/test_frontend.py::TestSuperPointWeakPipeline's assertion)."""
    from tests.test_weak_pipeline import weak_cfg
    from pointnerf_slam_tpu.engine import PointNeRFSLAM

    cfg = weak_cfg()
    cfg["superpoint_weights"] = ckpt_path
    cfg["data"]["n_frames"] = 11
    slam = PointNeRFSLAM(cfg)
    slam.run()
    if 5 not in slam.pseudo_depths:
        return float("inf")
    p5 = np.asarray(slam.pseudo_depths[5])
    m = p5 > 0.01
    if m.sum() < 50:
        return float("inf")
    _, _, d5, _ = slam.frame_reader[5]
    rel = np.abs(p5[m] - np.asarray(d5)[m]) / np.asarray(d5)[m]
    return float(np.median(rel))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out_json", default="/tmp/sp_sweep.json")
    args = ap.parse_args()

    from pointnerf_slam_tpu.tools.train_superpoint import (evaluate,
                                                           render_corpus,
                                                           train)
    from pointnerf_slam_tpu.frontend.features import save_superpoint_npz

    steps = 1500 if args.quick else 4000
    n_img = 48 if args.quick else 128
    corpus = render_corpus(n_img, seed=0, match_run_scale=True)

    grid = [
        dict(name="run_scale", m_neg=0.2, lambda_d=250.0, mag=0.15),
        dict(name="hard_neg", m_neg=0.3, lambda_d=250.0, mag=0.15),
        dict(name="wide_homo", m_neg=0.2, lambda_d=250.0, mag=0.25),
        dict(name="bal_desc", m_neg=0.2, lambda_d=400.0, mag=0.15),
    ]
    results = []
    tdir = tempfile.mkdtemp(prefix="sp_sweep_")
    for g in grid:
        print(f"=== {g['name']} ===")
        params, _ = train(steps=steps, batch=4, lr=1e-3, corpus=corpus,
                          m_neg=g["m_neg"], lambda_d=g["lambda_d"],
                          mag=g["mag"], log_every=max(steps // 8, 1))
        ck = os.path.join(tdir, g["name"] + ".npz")
        save_superpoint_npz(ck, params)
        acc, tot = evaluate(params, corpus)
        tri = bootstrap_metric(ck)
        print(f"{g['name']}: homography {acc:.3f} ({tot}), "
              f"bootstrap median rel err {tri:.3f}")
        results.append({**g, "homography": acc, "tri": tri, "ckpt": ck})

    results.sort(key=lambda r: r["tri"])
    with open(args.out_json, "w") as f:
        json.dump(results, f, indent=1)
    best = results[0]
    print(f"best: {best['name']} tri={best['tri']:.3f} -> {best['ckpt']}")
    print(f"(promote with: cp {best['ckpt']} pretrained/"
          f"superpoint_synthetic.npz)")


if __name__ == "__main__":
    main()
