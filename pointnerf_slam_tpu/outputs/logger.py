"""Checkpoint logger (capability of src/utils/Logger.py:21-32).

Writes {decoder params, gt/estimated pose lists, keyframe index list,
current idx} every ckpt_freq frames + at the final frame, to
{output}/ckpts/{idx:05d}.npz — same cadence and content as the reference's
.tar checkpoints (plus optimizer-free resume data). eval tools read these.
"""

from __future__ import annotations

import os

import numpy as np


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
        # match the reference cadence: only on mapping frames
        if idx % slam.ecfg.every_frame != 0 and idx != self.n_img - 1:
            want = False
        if not want:
            return
        self.log(slam, idx)

    def log(self, slam, idx: int):
        import jax
        flat, treedef = jax.tree_util.tree_flatten(slam.params)
        path = os.path.join(self.output, "ckpts", f"{idx:05d}.npz")
        np.savez_compressed(
            path,
            idx=idx,
            estimate_c2w_list=slam.estimate_c2w_list,
            gt_c2w_list=slam.gt_c2w_list,
            keyframe_list=np.asarray(slam.keyframes.frame_idx, np.int64),
            n_params=len(flat),
            **{f"param_{i}": np.asarray(p) for i, p in enumerate(flat)},
        )
        if slam.verbose:
            print(f"Saved checkpoint {path}")


def load_checkpoint(path: str, params_template):
    """Restore (params, estimate_c2w_list, gt_c2w_list, keyframe_list, idx)."""
    import jax
    z = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(params_template)
    n = int(z["n_params"])
    assert n == len(flat), f"param count mismatch {n} != {len(flat)}"
    params = jax.tree_util.tree_unflatten(
        treedef, [z[f"param_{i}"] for i in range(n)])
    return (params, z["estimate_c2w_list"], z["gt_c2w_list"],
            z["keyframe_list"], int(z["idx"]))


def attach_outputs(slam):
    """Wire logger, mesher, and visualizer into a PointNeRFSLAM."""
    import os

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
    return slam
