"""Shared weak-pipeline runs: the full 16-frame weak run is the most
expensive fixture in the suite (~3 min each on this 1-core box), and three
test files assert different properties of the SAME run — run each mode once
per process and share the result."""

from functools import lru_cache

import numpy as np

from pointnerf_slam_tpu.engine import PointNeRFSLAM
from tests.test_weak_pipeline import weak_cfg


@lru_cache(maxsize=None)
def weak_run(map_points: bool = True):
    """One full weak-mode run; cached per map_points mode."""
    cfg = weak_cfg()
    cfg["map_points"] = map_points
    cfg["map_proj_budget"] = 512
    slam = PointNeRFSLAM(cfg)
    est, gt = slam.run()
    return slam, est, gt


def pseudo_depth_accuracy(slam):
    """{frame: (coverage_px, median relative error)} for every pseudo-depth
    vs the (unobserved) sensor depth."""
    out = {}
    for i in sorted(slam.pseudo_depths):
        p = np.asarray(slam.pseudo_depths[i])
        _, _, d, _ = slam.frame_reader[i]
        m = p > 0.01
        if m.sum() == 0:
            continue
        rel = np.abs(p[m] - np.asarray(d)[m]) / np.asarray(d)[m]
        out[i] = (int(m.sum()), float(np.median(rel)))
    return out
