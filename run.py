"""CLI entry point (capability of the reference run.py).

Usage: python run.py configs/Replica/room0.yaml [--input_folder X --output Y]
"""

import argparse
import random

import numpy as np

from pointnerf_slam_tpu.engine import PointNeRFSLAM
from pointnerf_slam_tpu.io.config import load_config


def setup_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def main():
    parser = argparse.ArgumentParser(
        description="TPU-native pointNeRF-SLAM.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str,
                        help="input folder, overrides the config.")
    parser.add_argument("--output", type=str,
                        help="output folder, overrides the config.")
    parser.add_argument("--n_frames", type=int, default=None,
                        help="cap the number of processed frames.")
    args = parser.parse_args()

    setup_seed(1219)
    cfg = load_config(args.config)
    slam = PointNeRFSLAM(cfg, args, n_frames_cap=args.n_frames)

    from pointnerf_slam_tpu.outputs import attach_outputs
    attach_outputs(slam)

    est, gt = slam.run()
    t = slam.timings
    n = max(t["frames"], 1)
    total = t["tracking"] + t["mapping"] + t["frontend"]
    print(f"Done: {n} frames; tracking {t['tracking']:.1f}s, mapping "
          f"{t['mapping']:.1f}s, frontend {t['frontend']:.1f}s "
          f"-> {n / max(total, 1e-9):.3f} FPS")


if __name__ == "__main__":
    main()
