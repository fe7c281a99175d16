"""YAML config system with `inherit_from` chaining.

Same semantics as the reference loader (src/config.py:10-59): a config may
name a parent via `inherit_from`; parents resolve recursively, then the child
overlays recursively (dicts merge, scalars replace). A built-in default dict
(mirroring configs/pointnerf_slam.yaml of the reference) backs everything so
partial configs always resolve.
"""

from __future__ import annotations

import copy
import os
from typing import Optional

import yaml

# Defaults mirror the reference project config (configs/pointNeRF_slam.yaml)
# plus the keys NICE_SLAM.py reads. Values are the iMAP*/pointNeRF mode.
DEFAULT_CONFIG: dict = {
    "depth_supervision": True,
    "bundle_loss": True,
    "weak_depth": True,
    "depth_patch": 5,
    "viewer_show": False,
    "debug": False,
    "track_every_frame": 5,
    "coarse": False,
    "sync_method": "loose",
    "scale": 0.1,
    "verbose": True,
    "occupancy": False,
    "low_gpu_mem": True,
    "device": "tpu",
    "grid_len": {
        "coarse": 2,
        "middle": 0.32,
        "fine": 0.16,
        "color": 0.16,
        "bound_divisible": 0.32,
    },
    "pretrained_decoders": {
        "coarse": "pretrained/coarse.pt",
        "middle_fine": "pretrained/middle_fine.pt",
    },
    "meshing": {
        "level_set": 10,
        "resolution": 256,
        "eval_rec": False,
        "clean_mesh": True,
        "depth_test": False,
        "mesh_coarse_level": False,
        "clean_mesh_bound_scale": 1.02,
        "get_largest_components": False,
        "color_mesh_extraction_method": "render_ray_along_normal",
        "remove_small_geometry_threshold": 0.2,
    },
    "tracking": {
        "gt_camera": False,
        "ignore_edge_W": 0,
        "ignore_edge_H": 0,
        "use_color_in_tracking": True,
        "device": "tpu",
        "handle_dynamic": False,
        "vis_freq": 50,
        "vis_inside_freq": 25,
        "w_color_loss": 0.5,
        "seperate_LR": False,
        "const_speed_assumption": True,
        "no_vis_on_first_frame": True,
        "lr": 0.001,
        "pixels": 5000,
        "iters": 50,
    },
    "mapping": {
        "device": "tpu",
        "color_refine": True,
        "middle_iter_ratio": 0.4,
        "fine_iter_ratio": 0.6,
        "every_frame": 5,
        "BA": False,
        "BA_cam_lr": 0.0002,
        "fix_fine": True,
        "fix_color": False,
        "no_vis_on_first_frame": True,
        "no_log_on_first_frame": True,
        "vis_freq": 50,
        "vis_inside_freq": 25,
        "mesh_freq": 50,
        "ckpt_freq": 500,
        "keyframe_every": 50,
        "mapping_window_size": 5,
        "w_color_loss": 0.05,
        "frustum_feature_selection": False,
        "keyframe_selection_method": "global",
        "save_selected_keyframes_info": True,
        "lr_first_factor": 5,
        "lr_factor": 1,
        "pixels": 5000,
        "iters_first": 1500,
        "iters": 300,
        "imap_decoders_lr": 0.0002,
        "bound": [[-1, 1], [-1, 1], [-1, 1]],
        "marching_cubes_bound": [[-1, 1], [-1, 1], [-1, 1]],
        "stage": {
            "coarse": {"decoders_lr": 0.0, "coarse_lr": 0.001,
                       "middle_lr": 0.0, "fine_lr": 0.0, "color_lr": 0.0},
            "middle": {"decoders_lr": 0.0, "coarse_lr": 0.0,
                       "middle_lr": 0.1, "fine_lr": 0.0, "color_lr": 0.0},
            "fine": {"decoders_lr": 0.0, "coarse_lr": 0.0,
                     "middle_lr": 0.005, "fine_lr": 0.005, "color_lr": 0.0},
            "color": {"decoders_lr": 0.005, "coarse_lr": 0.0,
                      "middle_lr": 0.005, "fine_lr": 0.005,
                      "color_lr": 0.005},
        },
    },
    "cam": {
        "H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
        "cx": 599.5, "cy": 339.5,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
        "png_depth_scale": 6553.5,
        "crop_edge": 0,
    },
    "rendering": {
        "N_samples": 32, "N_surface": 0, "N_importance": 12,
        "lindisp": False, "perturb": 0.0,
    },
    "data": {"dim": 3, "input_folder": "", "output": "output/run",
             "dataset": "synthetic"},
    "model": {"c_dim": 32, "coarse_bound_enlarge": 2,
              "pos_embedding_method": "fourier"},
}


def update_recursive(dict1: dict, dict2: dict) -> None:
    """Overlay dict2 onto dict1 in place (dicts merge, scalars replace)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            if not isinstance(dict1.get(k), dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: Optional[str], default: Optional[dict] = None) -> dict:
    """Load a YAML config, resolving `inherit_from` chains.

    Relative `inherit_from` paths resolve against the repo cwd first, then
    against the including file's directory (the reference runs from repo
    root, so its inherit paths are cwd-relative)."""
    cfg = copy.deepcopy(DEFAULT_CONFIG if default is None else default)
    if path is None:
        return cfg

    chain = []
    p = path
    while p is not None:
        with open(p, "r") as f:
            spec = yaml.safe_load(f) or {}
        chain.append(spec)
        parent = spec.get("inherit_from")
        if parent is not None and not os.path.exists(parent):
            alt = os.path.join(os.path.dirname(p), parent)
            parent = alt if os.path.exists(alt) else parent
        p = parent

    for spec in reversed(chain):
        spec.pop("inherit_from", None)
        update_recursive(cfg, spec)
    return cfg
