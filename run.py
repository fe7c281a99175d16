"""CLI entry point (capability of the reference run.py).

Usage: python run.py configs/Replica/room0.yaml [--input_folder X --output Y]
"""

import argparse
import os
import random

import numpy as np

# reuse compiled programs across processes (first compiles are ~minutes)
os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

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
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint npz to resume from.")
    parser.add_argument("--profile", type=str, default=None,
                        help="dump a JAX profiler trace to this directory.")
    args = parser.parse_args()

    setup_seed(1219)
    cfg = load_config(args.config)
    slam = PointNeRFSLAM(cfg, args, n_frames_cap=args.n_frames)

    from pointnerf_slam_tpu.outputs import attach_outputs
    attach_outputs(slam)

    start_idx = 0
    if args.resume:
        from pointnerf_slam_tpu.outputs.logger import resume_slam
        start_idx = resume_slam(slam, args.resume)
        print(f"Resumed from {args.resume}; continuing at frame {start_idx}")

    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            est, gt = slam.run(start_idx)
    else:
        est, gt = slam.run(start_idx)
    t = slam.timings
    n = max(t["frames"], 1)
    total = t["tracking"] + t["mapping"] + t["frontend"]
    print(f"Done: {n} frames; tracking {t['tracking']:.1f}s, mapping "
          f"{t['mapping']:.1f}s, frontend {t['frontend']:.1f}s "
          f"-> {n / max(total, 1e-9):.3f} FPS")


if __name__ == "__main__":
    main()
