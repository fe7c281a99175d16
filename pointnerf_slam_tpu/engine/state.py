"""Engine state: static config + the device-resident keyframe ring buffer.

The reference shares keyframe images between two OS processes through
share_memory_() tensors and .npy files on disk (src/NICE_SLAM.py:125-153,
src/Tracker.py:788-789, src/Mapper.py:737-758 — SURVEY §2.4 P2/P3). Here the
keyframe store is a set of HBM-resident arrays owned by the single-controller
host loop; insertion is a donated jitted scatter, and the mapper gathers its
window on device — no host<->device image traffic after frame upload.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (trace-time) engine parameters distilled from the YAML config."""
    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float
    # tracking
    tracking_pixels: int = 5000
    num_cam_iters: int = 50
    cam_lr: float = 1e-3
    seperate_LR: bool = False
    w_color_loss_t: float = 0.5
    ignore_edge_W: int = 0
    ignore_edge_H: int = 0
    handle_dynamic: bool = False
    use_color_in_tracking: bool = True
    depth_supervision: bool = True
    weak_depth: bool = True
    gt_camera: bool = False
    const_speed_assumption: bool = True
    # mapping
    mapping_pixels: int = 5000
    mapping_window_size: int = 5
    w_color_loss_m: float = 0.05
    # beyond-surface weight-mass penalty (PARITY.md #25); 0 = reference loss
    w_beyond_loss: float = 0.0
    imap_decoders_lr: float = 2e-4
    BA: bool = False
    BA_cam_lr: float = 2e-4
    keyframe_every: int = 50
    every_frame: int = 5
    track_every_frame: int = 5
    iters: int = 300
    iters_first: int = 1500
    color_refine: bool = True
    keyframe_selection_method: str = "global"
    frustum_feature_selection: bool = False
    occupancy: bool = False
    # fused full-render Pallas kernel (ops/megakernel.py):
    # "auto" = on when the flagship config runs on a real TPU backend,
    # "on" = force (interpret mode off-TPU; used by tests), "off" = never.
    megakernel: str = "auto"
    sync_method: str = "loose"
    fix_fine: bool = True
    fix_color: bool = False
    middle_iter_ratio: float = 0.4
    fine_iter_ratio: float = 0.6
    # resample-every-K schedule (fused-VG path only): reuse one pixel batch
    # + one importance z2 for K consecutive Adam iterations; rays are still
    # re-derived from the live cameras each iteration, so BA/tracking
    # gradients stay exact. K=1 == the reference per-iteration resampling.
    map_resample_every: int = 1
    track_resample_every: int = 1
    # ABLATION ONLY (error-budget decomposition, BASELINE.md §Acceptance
    # bar): replace the solved two-view baseline scale with the true one;
    # residual ATE isolates the non-scale drift sources.
    gt_scale_injection: bool = False
    # fused outer mapping loop (round 5): run the reference's 3-outer
    # schedule as ONE device dispatch (lax.scan over pre-gathered windows)
    # on the no-BA iMAP* path — saves (outer-1) host round-trips (~34 ms
    # each over the axon tunnel) per mapped frame. Exact semantics of the
    # host loop (fresh Adam + fresh random window per outer).
    fused_outer: bool = False
    # no-BA mapping fast path (round 5): with BA off the window cameras
    # are constants inside the mapping call, so per-iteration ray
    # re-derivation + the kernel's d(loss)/d(rays) contractions are pure
    # waste — skip both (rays built once per resample round; cam grads
    # identically zero, exactly what the ba_mask produced anyway).
    no_ba_fast: bool = False

    @classmethod
    def from_cfg(cls, cfg: dict, H: int, W: int, fx, fy, cx, cy):
        t = cfg["tracking"]
        m = cfg["mapping"]
        return cls(
            H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
            tracking_pixels=t["pixels"], num_cam_iters=t["iters"],
            cam_lr=t["lr"], seperate_LR=t["seperate_LR"],
            w_color_loss_t=t["w_color_loss"],
            ignore_edge_W=t["ignore_edge_W"], ignore_edge_H=t["ignore_edge_H"],
            handle_dynamic=t["handle_dynamic"],
            use_color_in_tracking=t["use_color_in_tracking"],
            depth_supervision=cfg["depth_supervision"],
            weak_depth=cfg["weak_depth"], gt_camera=t["gt_camera"],
            const_speed_assumption=t["const_speed_assumption"],
            mapping_pixels=m["pixels"],
            mapping_window_size=m["mapping_window_size"],
            w_color_loss_m=m["w_color_loss"],
            w_beyond_loss=m.get("w_beyond_loss", 0.0),
            imap_decoders_lr=m["imap_decoders_lr"], BA=m["BA"],
            BA_cam_lr=m["BA_cam_lr"], keyframe_every=m["keyframe_every"],
            every_frame=m["every_frame"],
            track_every_frame=cfg.get("track_every_frame", 1),
            iters=m["iters"], iters_first=m["iters_first"],
            color_refine=m["color_refine"],
            keyframe_selection_method=m["keyframe_selection_method"],
            frustum_feature_selection=m.get("frustum_feature_selection",
                                            False),
            occupancy=cfg["occupancy"], sync_method=cfg["sync_method"],
            megakernel=cfg["rendering"].get("megakernel", "auto"),
            fix_fine=m["fix_fine"], fix_color=m["fix_color"],
            middle_iter_ratio=m["middle_iter_ratio"],
            fine_iter_ratio=m["fine_iter_ratio"],
            map_resample_every=m.get("resample_every", 1),
            track_resample_every=t.get("resample_every", 1),
            gt_scale_injection=t.get("gt_scale_injection", False),
            fused_outer=m.get("fused_outer", False),
            no_ba_fast=m.get("no_ba_fast", False),
        )


@jax.jit
def _insert(buf: jnp.ndarray, slot: jnp.ndarray, frame: jnp.ndarray):
    # NOTE: donation deliberately NOT used — donated updates followed by a
    # gather + large jit execution reproducibly fault the experimental axon
    # PJRT runtime (use-after-free flavored "TPU worker crashed"); the copy
    # costs ~35 MB per keyframe insert, once per every_frame frames.
    return jax.lax.dynamic_update_index_in_dim(buf, frame, slot, 0)


class KeyframeBuffer:
    """Fixed-capacity device-resident keyframe store.

    Arrays:
      color: (K, H, W, 3) uint8
      depth: (K, H, W) float32 (sensor depth, scaled)
      pseudo_depth: (K, H, W) float32 (sparse splatted; 0 where absent)
      est_c2w: (K, 7) camera tensors, gt_c2w: (K, 7)
    Host keeps the frame-index list (tiny python ints, like the reference's
    keyframe_list at src/Mapper.py:707).
    """

    def __init__(self, capacity: int, H: int, W: int):
        self.capacity = capacity
        self.color = jnp.zeros((capacity, H, W, 3), jnp.uint8)
        self.depth = jnp.zeros((capacity, H, W), jnp.float32)
        self.pseudo_depth = jnp.zeros((capacity, H, W), jnp.float32)
        self.est_c2w = jnp.zeros((capacity, 7), jnp.float32)
        self.gt_c2w = jnp.zeros((capacity, 7), jnp.float32)
        self.frame_idx: list = []  # host-side frame indices

    def __len__(self):
        return len(self.frame_idx)

    def insert(self, frame_idx: int, color_u8, depth, est_c2w7, gt_c2w7,
               pseudo_depth=None):
        slot = len(self.frame_idx)
        if slot >= self.capacity:
            raise RuntimeError(
                f"keyframe buffer full ({self.capacity}); raise "
                f"data.keyframe_capacity")
        self.frame_idx.append(int(frame_idx))
        s = jnp.int32(slot)
        self.color = _insert(self.color, s, jnp.asarray(color_u8, jnp.uint8))
        self.depth = _insert(self.depth, s, jnp.asarray(depth, jnp.float32))
        if pseudo_depth is not None:
            self.pseudo_depth = _insert(
                self.pseudo_depth, s, jnp.asarray(pseudo_depth, jnp.float32))
        self.est_c2w = _insert(self.est_c2w, s,
                               jnp.asarray(est_c2w7, jnp.float32))
        self.gt_c2w = _insert(self.gt_c2w, s, jnp.asarray(gt_c2w7, jnp.float32))

    def set_est_c2w(self, slot: int, est_c2w7):
        self.est_c2w = _insert(self.est_c2w, jnp.int32(slot),
                               jnp.asarray(est_c2w7, jnp.float32))

    def gather_window(self, slots: np.ndarray):
        """Device gather of a window of keyframes by slot index."""
        s = jnp.asarray(slots, jnp.int32)
        return (jnp.take(self.color, s, axis=0),
                jnp.take(self.depth, s, axis=0),
                jnp.take(self.pseudo_depth, s, axis=0),
                jnp.take(self.est_c2w, s, axis=0))
