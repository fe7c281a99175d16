"""Per-event render panels (capability of src/utils/Visualizer.py).

Renders the full image at the current pose and saves a 2x3 matplotlib panel
(gt depth / rendered depth / depth residual; gt color / rendered color /
color residual) under {output}/{tracking_vis,mapping_vis}.

Cadence note: the reference renders panels every `vis_inside_freq`
optimizer iterations (Visualizer.py:24-107) — our inner loops run fused on
device, so panels render per tracking/mapping EVENT at `vis_freq` frame
cadence instead (same artifact, coarser cadence; PARITY.md #16).
"""

from __future__ import annotations

import os

import numpy as np


class Visualizer:
    def __init__(self, freq: int, vis_dir: str, verbose: bool = False):
        self.freq = max(int(freq), 1)
        self.vis_dir = vis_dir
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)

    def vis(self, slam, idx: int, gt_depth, gt_color, c2w44):
        if idx % self.freq != 0:
            return
        import jax.numpy as jnp
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..render.renderer import render_img

        depth, var, color = render_img(
            slam.params, slam.model_cfg, slam.rcfg, slam.H, slam.W,
            slam.fx, slam.fy, slam.cx, slam.cy, jnp.asarray(c2w44),
            slam.bound, gt_depth=jnp.asarray(gt_depth),
            c_grid=slam.c_grid if slam.nice else None)
        depth = np.asarray(depth)
        color = np.clip(np.asarray(color), 0, 1)
        gt_depth = np.asarray(gt_depth)
        gt_color = np.asarray(gt_color)
        depth_res = np.abs(gt_depth - depth)
        depth_res[gt_depth == 0] = 0
        color_res = np.abs(gt_color - color).mean(-1)

        vmax = max(float(gt_depth.max()), 1e-6)
        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        for ax, (img, title, kw) in zip(axs.flat, [
            (gt_depth, "Input Depth", {"cmap": "plasma", "vmax": vmax}),
            (depth, "Generated Depth", {"cmap": "plasma", "vmax": vmax}),
            (depth_res, "Depth Residual", {"cmap": "plasma", "vmax": vmax}),
            (gt_color, "Input RGB", {}),
            (color, "Generated RGB", {}),
            (color_res, "RGB Residual", {"cmap": "plasma", "vmax": 1.0}),
        ]):
            ax.imshow(img, **kw)
            ax.set_title(title)
            ax.axis("off")
        out = os.path.join(self.vis_dir, f"{idx:05d}.jpg")
        fig.savefig(out, dpi=100, bbox_inches="tight")
        plt.close(fig)
        if self.verbose:
            print(f"Visualizer: saved {out}")
