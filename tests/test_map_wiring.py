"""Live persistent-map wiring in the sparse front-end (weak mode).

The reference's live bootstrap registers triangulations as map points with
per-frame observations (src/Tracker.py:491-502 -> src/map.py:191-287); here
the Map is wired into SparseFrontend.pseudo_depth_for: accepted points
become MapPoints (fused with existing ones by descriptor+pixel
association), re-project into later frames once corroborated by >= 3
observations, and a scene-scale z gate rejects the small-baseline DLT
degeneracy (pose noise ~ baseline fabricates points floating next to the
camera that pass every classical gate — VERDICT round-1 weak #7/#8)."""

import numpy as np

from pointnerf_slam_tpu.engine import PointNeRFSLAM
from tests.test_weak_pipeline import weak_cfg


def _run(map_points: bool):
    cfg = weak_cfg()
    # frontend options live at the top level of the config tree
    # (configs/pointnerf_slam.yaml: depth_patch, num_features, ...)
    cfg["map_points"] = map_points
    cfg["map_proj_budget"] = 512
    cfg["data"]["n_frames"] = 16
    slam = PointNeRFSLAM(cfg)
    slam.run()
    return slam


def _accuracy(slam):
    """(frame, coverage, median relative error) for every pseudo-depth."""
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


def test_no_poisoned_pseudo_depth_either_mode():
    """THE guarantee: every pseudo-depth map that reaches the mapper is
    scene-consistent. Before the z gate, continuous-mode frames carried
    depths ~40x too small (baseline-scale DLT junk) straight into the
    mapping loss."""
    for mode in (False, True):
        acc = _accuracy(_run(mode))
        assert acc, "no pseudo-depth at all"
        for i, (cov, rel) in acc.items():
            assert rel < 0.2, (mode, i, cov, rel)


def test_map_populated_and_bounded():
    slam = _run(True)
    fe = slam.frontend
    assert fe.map is not None and len(fe.map.points) > 0
    assert len(fe.map.keyframes) >= 2
    assert len(fe._kfs) <= fe.map.frames.maxlen
    assert len(fe.map.points) <= fe.map_max_points
    # association happened: some points carry > 2 observations or the
    # per-pair duplicates were fused/culled to a bounded set
    nobs = [len(mp.observations) for mp in fe.map.points]
    assert max(nobs) >= 2
