"""Checkpoint logger + resume (capability of src/utils/Logger.py:21-32,
extended per SURVEY §5.4: the reference writes checkpoints but never reads
them back into the SLAM loop — we support actual resume).

Checkpoint content ({output}/ckpts/{idx:05d}.npz):
  decoder params, NICE grids, gt/estimated pose lists, keyframe frame
  indices + est/gt camera tensors, sparse pseudo-depth maps (weak mode),
  current idx. Keyframe images are NOT stored — resume reloads them from
  the dataset by frame index (they are deterministic reader outputs).
"""

from __future__ import annotations

import os

import numpy as np


def _tree_to_arrays(tree, prefix):
    import jax
    flat, _ = jax.tree_util.tree_flatten(tree)
    return {f"{prefix}{i}": np.asarray(p) for i, p in enumerate(flat)}, \
        len(flat)


def _arrays_to_tree(z, prefix, n, template):
    import jax
    _, treedef = jax.tree_util.tree_flatten(template)
    return jax.tree_util.tree_unflatten(
        treedef, [z[f"{prefix}{i}"] for i in range(n)])


class Logger:
    def __init__(self, output: str, ckpt_freq: int, n_img: int,
                 no_log_on_first_frame: bool = True):
        self.output = output
        self.ckpt_freq = ckpt_freq
        self.n_img = n_img
        self.no_log_on_first_frame = no_log_on_first_frame
        os.makedirs(os.path.join(output, "ckpts"), exist_ok=True)

    def maybe_log(self, slam, idx: int):
        want = ((idx % self.ckpt_freq == 0
                 and not (idx == 0 and self.no_log_on_first_frame))
                or idx == self.n_img - 1)
        if idx % slam.ecfg.every_frame != 0 and idx != self.n_img - 1:
            want = False
        if not want:
            return
        self.log(slam, idx)

    def log(self, slam, idx: int):
        data = {"idx": idx,
                "estimate_c2w_list": slam.estimate_c2w_list,
                "gt_c2w_list": slam.gt_c2w_list,
                "keyframe_list": np.asarray(slam.keyframes.frame_idx,
                                            np.int64),
                "kf_est_c2w": np.asarray(slam.keyframes.est_c2w),
                "kf_gt_c2w": np.asarray(slam.keyframes.gt_c2w)}
        p_arrays, n_p = _tree_to_arrays(slam.params, "param_")
        data.update(p_arrays)
        data["n_params"] = n_p
        if slam.nice:
            g_arrays, n_g = _tree_to_arrays(slam.c_grid, "grid_")
            data.update(g_arrays)
            data["n_grids"] = n_g
        # sparse pseudo-depth maps (weak mode): ~1% density
        for i, (fidx, pd) in enumerate(sorted(slam.pseudo_depths.items())):
            pd = np.asarray(pd)
            nz = np.flatnonzero(pd > 0)
            data[f"pseudo_idx_{i}"] = np.asarray([fidx], np.int64)
            data[f"pseudo_nz_{i}"] = nz.astype(np.int64)
            data[f"pseudo_val_{i}"] = pd.reshape(-1)[nz]
        data["n_pseudo"] = len(slam.pseudo_depths)
        # front-end metric-scale state (weak mode): without these a resumed
        # run falls back to depth_scale=1.0 — which chains the E-matrix's
        # UNIT-norm baseline (~23x true camera speed here) the moment the
        # field-anchored scale loses confidence. That exact failure walked
        # the round-4 oracle run 40 m out of a 4 m room (PERF.md round 4).
        fe = getattr(slam, "frontend", None)
        if fe is not None:
            data["fe_median_gt_depth"] = np.float64(fe.median_gt_depth or 0)
            data["fe_depth_scale"] = np.float64(fe.depth_scale or 0)
            data["fe_step_hist"] = np.asarray(fe._step_hist, np.float64)
            # reference-keyframe identity: resume must re-anchor on the
            # SAME reference (run 2 reseeded it 45 frames stale via
            # max(pseudo_depths) — RESULTS.md forensics #3)
            data["fe_ref_idx"] = np.int64(
                fe.prev["frame_idx"] if fe.prev is not None else -1)
            data["fe_last_tracked_idx"] = np.int64(
                fe._last_tracked_idx
                if fe._last_tracked_idx is not None else -1)
            # FULL front-end state (round-5): the persistent map is the
            # metric-scale memory; without it a resume rebuilds the map at
            # whatever scale the first post-resume solves carry (run-3
            # forensics: the frame-100 resume kicked off a 7x scale
            # excursion, RESULTS.md round 5)
            data.update(fe.state_arrays())
        # per-stage scale decomposition telemetry (VERDICT r4 #1)
        if getattr(slam, "scale_telemetry", None):
            import json
            data["scale_telemetry"] = np.str_(
                json.dumps(slam.scale_telemetry))

        path = os.path.join(self.output, "ckpts", f"{idx:05d}.npz")
        np.savez_compressed(path, **data)
        if slam.verbose:
            print(f"Saved checkpoint {path}")


def load_checkpoint(path: str, params_template):
    """Restore (params, estimate_c2w_list, gt_c2w_list, keyframe_list, idx)."""
    z = np.load(path)
    params = _arrays_to_tree(z, "param_", int(z["n_params"]),
                             params_template)
    return (params, z["estimate_c2w_list"], z["gt_c2w_list"],
            z["keyframe_list"], int(z["idx"]))


def resume_slam(slam, path: str) -> int:
    """Restore a PointNeRFSLAM from a checkpoint; returns the next frame
    index to process."""
    import jax.numpy as jnp

    z = np.load(path)
    slam.params = _arrays_to_tree(z, "param_", int(z["n_params"]),
                                  slam.params)
    if slam.nice and "n_grids" in z:
        slam.c_grid = _arrays_to_tree(z, "grid_", int(z["n_grids"]),
                                      slam.c_grid)
    idx = int(z["idx"])
    n = min(len(z["estimate_c2w_list"]), slam.n_img)
    slam.estimate_c2w_list[:n] = z["estimate_c2w_list"][:n]
    slam.gt_c2w_list[:n] = z["gt_c2w_list"][:n]

    # pseudo depths (sparse)
    H, W = slam.H, slam.W
    for i in range(int(z.get("n_pseudo", 0))):
        fidx = int(z[f"pseudo_idx_{i}"][0])
        pd = np.zeros(H * W, np.float32)
        pd[z[f"pseudo_nz_{i}"]] = z[f"pseudo_val_{i}"]
        slam.pseudo_depths[fidx] = jnp.asarray(pd.reshape(H, W))
    if slam.pseudo_depths:
        slam._bootstrapped = True
        if slam.frontend is not None:
            # FULL front-end restore (map + reference features) when the
            # checkpoint carries it (round-5 fe2_ fields) — the persistent
            # map is the metric-scale memory (run-3 forensics). Legacy
            # checkpoints fall back to the round-4 reference reseed.
            if not slam.frontend.load_state_arrays(z):
                # reseed the frontend's REFERENCE keyframe: the persisted
                # identity when available (run-2 forensics #3: the old
                # max(pseudo_depths) guess reseeded 45 frames stale), else
                # the most recent tracked frame before the resume point
                last = int(z.get("fe_ref_idx", -1))
                if last < 0:
                    tef = slam.ecfg.track_every_frame
                    last = max(tef, (idx // tef) * tef - tef)
                _, color, _, _ = slam.frame_reader[last]
                slam.frontend.prev = {
                    "frame_idx": last,
                    "feats": slam.frontend._extract(color)}
            lt = int(z.get("fe_last_tracked_idx", -1))
            slam.frontend._last_tracked_idx = lt if lt >= 0 else \
                slam.frontend.prev["frame_idx"]
            # restore the metric-scale anchors (NEVER default to 1.0 —
            # see Logger.log). Older checkpoints lack the fields; derive
            # them from the data instead: the carried per-pair scale IS
            # the recent tracked-frame baseline (readable off the restored
            # trajectory), and the gt-median anchor is the median of the
            # restored pseudo-depth values.
            mgd = float(z.get("fe_median_gt_depth", 0.0))
            dsc = float(z.get("fe_depth_scale", 0.0))
            if dsc <= 0:
                tef = slam.ecfg.track_every_frame
                tr = z["estimate_c2w_list"][:idx + 1:tef][-6:, :3, 3]
                if len(tr) >= 2:
                    d = np.linalg.norm(np.diff(tr, axis=0), axis=1)
                    dsc = float(np.median(d))
            if mgd <= 0:
                vals = np.concatenate(
                    [np.asarray(pd).reshape(-1)
                     for pd in slam.pseudo_depths.values()])
                vals = vals[vals > 0.01]
                if len(vals):
                    mgd = float(np.median(vals))
            if mgd > 0:
                slam.frontend.median_gt_depth = mgd
            if dsc > 0:
                slam.frontend.depth_scale = dsc
                # the restored value is already cadence-correct: do not let
                # the next field anchor re-snap it wholesale
                slam.frontend._scale_anchored = True
            if "fe_step_hist" in z:
                slam.frontend._step_hist = list(
                    np.asarray(z["fe_step_hist"], np.float64))

    # per-stage scale telemetry continues across the resume
    if "scale_telemetry" in z:
        import json
        try:
            slam.scale_telemetry = json.loads(str(z["scale_telemetry"]))
        except Exception:
            pass

    # keyframes: reload images from the dataset by frame index
    for slot, fidx in enumerate(z["keyframe_list"].tolist()):
        _, color, depth, _ = slam.frame_reader[fidx]
        color_u8 = np.clip(np.asarray(color) * 255, 0, 255).astype(np.uint8)
        slam.keyframes.insert(
            fidx, color_u8, jnp.asarray(depth),
            jnp.asarray(z["kf_est_c2w"][slot]),
            jnp.asarray(z["kf_gt_c2w"][slot]),
            pseudo_depth=slam.pseudo_depths.get(fidx))
    slam.mapping_first_frame_done = len(slam.keyframes) > 0
    return idx + 1


def attach_outputs(slam):
    """Wire logger, mesher, and visualizer into a PointNeRFSLAM."""
    cfg = slam.cfg
    slam.logger = Logger(slam.output, cfg["mapping"]["ckpt_freq"],
                         slam.n_img,
                         cfg["mapping"]["no_log_on_first_frame"])
    try:
        from .mesher import Mesher
        slam.mesher = Mesher(slam.cfg, slam)
    except Exception as e:
        print(f"mesher unavailable ({e}); meshing disabled")
        slam.mesher = None
    from .visualizer import Visualizer
    slam.visualizer = Visualizer(
        cfg["mapping"]["vis_freq"],
        os.path.join(slam.output, "mapping_vis"), slam.verbose)
    # tracking-residual panels (reference src/Tracker.py:186-188,888 writes
    # tracking_vis via its own Visualizer at tracking.vis_freq)
    slam.tracking_visualizer = Visualizer(
        cfg["tracking"]["vis_freq"],
        os.path.join(slam.output, "tracking_vis"), slam.verbose)
    if slam.frontend is not None:
        from .draw import MatchVisualizer
        slam.match_visualizer = MatchVisualizer(
            cfg["tracking"]["vis_freq"],
            os.path.join(slam.output, "matches_vis"), slam.verbose)
    # offline stand-ins for the reference's interactive viewer3D /
    # mplot_thread windows (headless image): top-down trajectory+map view
    # and optimization loss curves, at the mapping vis cadence
    from .draw import LossCurveWriter, TrajectoryWriter
    slam.aux_visualizers = [
        TrajectoryWriter(cfg["mapping"]["vis_freq"],
                         os.path.join(slam.output, "traj_vis"),
                         slam.verbose),
        LossCurveWriter(cfg["mapping"]["vis_freq"],
                        os.path.join(slam.output, "loss_vis"),
                        slam.verbose),
    ]
    return slam
