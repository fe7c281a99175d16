"""Single-controller SLAM system: deterministic tracker/mapper schedule.

Replaces the reference's two-OS-process + shared-memory + disk-polling
architecture (src/NICE_SLAM.py:117-160,355-376; SURVEY §2.4) with one host
loop driving two jitted device programs. `sync_method` semantics collapse to
a deterministic interleave: the mapper runs (strict: before the tracker may
advance past idx; loose: within the every_frame window; free: whenever) —
in a single-controller loop all three produce the same schedule: track(idx)
-> map(idx) every `every_frame` frames, which is the fixed point the
reference's polling converges to.

Per-frame schedule (capability of src/Tracker.py:651-948, src/Mapper.py:700-934):
  idx == 0: adopt gt pose; insert first keyframe; (non-weak) init-map
            with iters_first.
  weak mode, idx == track_every_frame: sparse-front-end bootstrap
            (essential matrix pose + triangulated pseudo-depth), then
            init-map over frames {0, idx} with iters_first.
  tracking frames: Adam pose refinement through the renderer
            (every frame in sensor-depth mode; every track_every_frame in
            weak mode).
  mapping frames (idx % every_frame == 0): window select -> mapper_step
            outer x inner iterations; BA when >4 keyframes and enabled;
            keyframe insertion per keyframe_every (weak: every mapped frame).
  final frame: color-refine (5x iters, doubled window).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import camera_from_tensor, tensor_from_camera, to_homogeneous
from ..io.config import load_config
from ..io.datasets import get_dataset
from ..models.decoders import get_model
from ..render.renderer import RenderConfig
from .mapper import make_mapper_step
from .state import EngineConfig, KeyframeBuffer
from .tracker import make_tracking_step


def random_select(length, k, rng: np.random.Generator):
    """k distinct indices from range(length) (src/common.py:66-71)."""
    return list(rng.permutation(np.arange(length))[: min(length, k)])


class PointNeRFSLAM:
    def __init__(self, cfg: dict | str, args=None, n_frames_cap=None):
        if isinstance(cfg, str):
            cfg = load_config(cfg)
        self.cfg = cfg
        self.args = args
        self.verbose = cfg["verbose"]
        self.scale = cfg["scale"]
        self.output = cfg["data"]["output"]
        if args is not None and getattr(args, "output", None):
            self.output = args.output
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, "ckpts"), exist_ok=True)
        os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)

        self._update_cam()
        self._load_bound()

        self.nice = cfg.get("nice", False)
        self.model_cfg, init_fn = get_model(cfg, nice=self.nice)
        self.params = init_fn(jax.random.PRNGKey(cfg.get("seed", 1219)))
        if self.nice:
            from ..models.grids import init_grids
            self.c_grid = init_grids(
                jax.random.PRNGKey(cfg.get("seed", 1219) + 7), cfg,
                np.array(cfg["mapping"]["bound"], np.float32)
                * cfg["scale"])
        else:
            self.c_grid = {}

        self.rcfg = RenderConfig.from_cfg(cfg)
        self.ecfg = EngineConfig.from_cfg(cfg, self.H, self.W, self.fx,
                                          self.fy, self.cx, self.cy)

        self.frame_reader = get_dataset(cfg, args, self.scale)
        self.n_img = len(self.frame_reader)
        if n_frames_cap is not None:
            self.n_img = min(self.n_img, n_frames_cap)

        cap = cfg["data"].get(
            "keyframe_capacity",
            min(self.n_img // max(self.ecfg.every_frame, 1) + 4, 512))
        self.keyframes = KeyframeBuffer(cap, self.H, self.W)

        self.max_window = self.ecfg.mapping_window_size + 1  # + current
        # multi-chip: shard the mapping ray batch over all local devices
        # (SURVEY §2.4 P6; decoder replicates, grads psum over ICI).
        # parallel.data_devices: "auto" (default, all devices), an int, or
        # 0/1 to force single-device.
        par = cfg.get("parallel", {}) or {}
        want = par.get("data_devices", "auto")
        n_par = jax.device_count() if want == "auto" else int(want)
        n_par = min(n_par, jax.device_count())
        if n_par > 1:
            from ..parallel import make_mesh
            self.mesh = make_mesh(n_par)
        else:
            self.mesh = None
        self._mapper_steps = {}
        # NICE frustum_feature_selection (reference Mapper.py:129-200)
        self._use_grid_masks = bool(self.nice
                                    and self.ecfg.frustum_feature_selection)
        self._frustum_mask_fns = {}
        self.tracking_step = make_tracking_step(self.model_cfg, self.rcfg,
                                                self.ecfg)

        # pose tables (host, numpy 4x4 like the reference's shared lists)
        self.estimate_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        self.gt_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)

        self.key = jax.random.PRNGKey(cfg.get("seed", 1219) + 1)
        self.np_rng = np.random.default_rng(cfg.get("seed", 1219))
        self.mapping_first_frame_done = False
        self.frontend = None
        if self.ecfg.weak_depth and not self.ecfg.gt_camera:
            from ..frontend import SparseFrontend
            self.frontend = SparseFrontend(cfg, self.H, self.W, self.fx,
                                           self.fy, self.cx, self.cy)
        self._pose_init_override = None
        self._pending_pose = None  # (idx, device cam7) deferred track pose
        self._frame_dev = None  # (idx, color_f32, depth_f32, color_u8) dev
        self._decode_frame = None
        self._bootstrapped = not self.ecfg.weak_depth or self.ecfg.gt_camera
        self.pseudo_depths = {}  # frame idx -> device (H, W) pseudo depth
        self.logger = None
        self.mesher = None
        # per-phase loss traces for the offline curve writer
        # (outputs/draw.py LossCurveWriter — the mplot_thread capability);
        # device arrays are appended WITHOUT a host sync and only pulled at
        # the writer's cadence
        self.loss_log = {"mapping": [], "tracking": []}
        self.scale_telemetry = []  # per-tracked-frame stage decomposition
        self.timings = {"tracking": 0.0, "mapping": 0.0, "frontend": 0.0,
                        "frames": 0}

    # -- setup ------------------------------------------------------------
    def _update_cam(self):
        """Intrinsics rescale for crop_size / crop_edge
        (src/NICE_SLAM.py:176-198)."""
        c = self.cfg["cam"]
        self.H, self.W = c["H"], c["W"]
        self.fx, self.fy, self.cx, self.cy = c["fx"], c["fy"], c["cx"], c["cy"]
        if "crop_size" in c:
            ch, cw = c["crop_size"]
            sx = cw / self.W
            sy = ch / self.H
            self.fx *= sx
            self.fy *= sy
            self.cx *= sx
            self.cy *= sy
            self.W, self.H = cw, ch
        edge = c["crop_edge"]
        if edge > 0:
            self.H -= 2 * edge
            self.W -= 2 * edge
            self.cx -= edge
            self.cy -= edge

    def _load_bound(self):
        """Scene bound * scale, rounded up to bound_divisible
        (src/NICE_SLAM.py:200-213)."""
        b = np.array(self.cfg["mapping"]["bound"], np.float32) * self.scale
        div = self.cfg["grid_len"]["bound_divisible"]
        b[:, 1] = (np.ceil((b[:, 1] - b[:, 0]) / div) * div) + b[:, 0]
        self.bound = jnp.asarray(b)

    # -- helpers ----------------------------------------------------------
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _cam7(self, c2w44: np.ndarray) -> np.ndarray:
        from ..core.se3_np import tensor_from_camera_np
        return tensor_from_camera_np(
            np.asarray(c2w44, np.float32)).astype(np.float32)

    def _c2w44(self, cam7) -> np.ndarray:
        from ..core.se3_np import camera_from_tensor_np, to_homogeneous_np
        return to_homogeneous_np(camera_from_tensor_np(
            np.asarray(cam7, np.float32))).astype(np.float32)

    def _upload_frame(self, idx: int, color, sensor_depth):
        """ONE quantized host->device transfer per frame (PARITY.md #24).

        The reference keeps frames f32 on a local PCIe GPU; here every
        tensor crosses the axon tunnel, and the f32 design re-uploaded the
        same frame up to 3x (tracker, mapper, keyframe insert). Uploads u8
        color (the keyframe buffer's storage format) + u16 depth
        (step = depth_max/65535 ~ 0.06 mm at room scale — the same
        quantization Replica/ScanNet/TUM accept at the PNG file layer,
        src/utils/datasets.py:113-120) and decodes to f32 on device.
        Invalid depth (exactly 0) survives quantization exactly.

        Returns (color_f32_dev, depth_f32_dev, color_u8_dev); repeated
        calls for the same idx return the cached device arrays."""
        cached = getattr(self, "_frame_dev", None)
        if cached is not None and cached[0] == idx:
            return cached[1], cached[2], cached[3]
        color_u8 = np.clip(np.asarray(color) * 255, 0, 255).astype(np.uint8)
        d = np.asarray(sensor_depth, np.float32)
        dmax = float(d.max())
        q = dmax / 65535.0 if dmax > 0 else 1.0
        d_u16 = np.round(d / q).astype(np.uint16)
        if self._decode_frame is None:
            @jax.jit
            def _decode(c_u8, d_u16, q):
                return (c_u8.astype(jnp.float32) / 255.0,
                        d_u16.astype(jnp.float32) * q)
            self._decode_frame = _decode
        u8_dev = jnp.asarray(color_u8)
        c_dev, d_dev = self._decode_frame(u8_dev, jnp.asarray(d_u16),
                                          jnp.float32(q))
        self._frame_dev = (idx, c_dev, d_dev, u8_dev)
        return c_dev, d_dev, u8_dev

    def _supervising_depth(self, idx: int, sensor_depth):
        if self.ecfg.weak_depth:
            if idx in self.pseudo_depths:
                return self.pseudo_depths[idx]
            # stale fallback: the latest available pseudo-depth (the
            # reference tracks against depth_cur_weak of the last tracked
            # frame, Tracker.py:891-895)
            if self.pseudo_depths:
                return self.pseudo_depths[max(self.pseudo_depths)]
            return jnp.zeros((self.H, self.W), jnp.float32)
        cached = getattr(self, "_frame_dev", None)
        if cached is not None and cached[0] == idx:
            return cached[2]
        return jnp.asarray(sensor_depth)

    # -- mapping ----------------------------------------------------------
    def _get_mapper_step(self, max_frames: int, stage: str, lr_factor: float,
                         outer_fused: bool = False):
        key = (max_frames, stage, lr_factor, outer_fused)
        if key not in self._mapper_steps:
            if self.nice:
                st = self.cfg["mapping"]["stage"][stage]
                grid_lrs = {f"grid_{lvl}": st[f"{lvl}_lr"] * lr_factor
                            for lvl in ("coarse", "middle", "fine", "color")
                            if f"grid_{lvl}" in self.c_grid}
                dec_lr = st["decoders_lr"] * lr_factor
            else:
                grid_lrs, dec_lr = None, None
            self._mapper_steps[key] = make_mapper_step(
                self.model_cfg, self.rcfg, self.ecfg, max_frames,
                stage=stage, grid_lrs=grid_lrs, decoders_lr=dec_lr,
                mesh=self.mesh, use_grid_masks=self._use_grid_masks,
                outer_fused=outer_fused)
        return self._mapper_steps[key]

    def _stage_schedule(self, num_iters: int):
        """NICE stage split (Mapper.py:520-527); iMAP is single-stage.
        When `coarse` is enabled, the reference runs a third coarse-mapper
        process in parallel (NICE_SLAM.py:342-353, dormant); here it is a
        config-gated sequential coarse segment (SURVEY §2.4 P9)."""
        if not self.nice:
            return [("color", num_iters)]
        m = int(num_iters * self.ecfg.middle_iter_ratio)
        f = int(num_iters * self.ecfg.fine_iter_ratio) - m
        c = num_iters - m - f
        stages = [(s, n) for s, n in
                  (("middle", m), ("fine", f), ("color", c)) if n > 0]
        if self.cfg["coarse"] and "grid_coarse" in self.c_grid:
            stages = [("coarse", max(num_iters // 3, 1))] + stages
        return stages

    def _select_window(self, refine, cur_color, cur_depth, cur_c2w):
        """Window slots, 'global' random (Mapper.py:365-368) or 'overlap'
        frustum scoring (Mapper.py:267-333)."""
        wsize = self.ecfg.mapping_window_size * (2 if refine else 1)
        n_kf = len(self.keyframes)
        if n_kf == 0:
            return []
        if self.ecfg.keyframe_selection_method == "overlap" and n_kf > 1:
            chosen = self._overlap_select(cur_color, cur_depth, cur_c2w,
                                          n_kf - 1, wsize - 2)
        else:
            chosen = random_select(n_kf - 1, wsize - 2, self.np_rng)
        return sorted(set(int(c) for c in chosen) | {n_kf - 1})

    def _overlap_scores_fn(self):
        """One jitted, vmapped frustum-overlap scorer over ALL keyframe
        slots (replaces the reference's per-keyframe Python loop,
        Mapper.py:286-326; one device call per window selection)."""
        if getattr(self, "_overlap_scores_jit", None) is not None:
            return self._overlap_scores_jit
        fx, fy, cx, cy = self.fx, self.fy, self.cx, self.cy
        W, H = self.W, self.H
        from ..core.se3 import camera_from_tensor, to_homogeneous

        @jax.jit
        def scores_fn(pts, est_c2w7):
            """pts (N, 3) world samples; est_c2w7 (K, 7) -> (K,) ratios."""
            c2w = to_homogeneous(camera_from_tensor(est_c2w7))
            w2c = jnp.linalg.inv(c2w)

            def one(T):
                pc = pts @ T[:3, :3].T + T[:3, 3]
                zz = -pc[:, 2]
                ok = zz > 1e-5
                u = pc[:, 0] / jnp.maximum(zz, 1e-5) * fx + cx
                v = -pc[:, 1] / jnp.maximum(zz, 1e-5) * fy + cy
                edge = 20
                inside = ok & (u > edge) & (u < W - edge) & (v > edge) \
                    & (v < H - edge)
                return jnp.mean(inside.astype(jnp.float32))

            return jax.vmap(one)(w2c)

        self._overlap_scores_jit = scores_fn
        return scores_fn

    def _overlap_select(self, color, depth, c2w, n_candidates, k,
                        n_samples=16, pixels=100):
        """Frustum-overlap keyframe scoring (Mapper.py:267-333). Sample
        points are built on host (tiny); scoring over all keyframe slots is
        one vmapped device call (static capacity, masked to n_candidates)."""
        depth_np = np.asarray(depth)
        valid = np.argwhere(depth_np > 0.01)
        if len(valid) == 0:
            return random_select(n_candidates, k, self.np_rng)
        sel = valid[self.np_rng.integers(0, len(valid), pixels)]
        d = depth_np[sel[:, 0], sel[:, 1]]
        i = sel[:, 1].astype(np.float64)
        j = sel[:, 0].astype(np.float64)
        dirs = np.stack([(i - self.cx) / self.fx, -(j - self.cy) / self.fy,
                         -np.ones_like(i)], -1)
        R = c2w[:3, :3]
        rays_d = dirs @ R.T
        rays_o = c2w[:3, 3]
        t = np.linspace(0.0, 1.0, n_samples)
        z = (d[:, None] * 0.8) * (1 - t) + (d[:, None] + 0.5) * t
        pts = rays_o + rays_d[:, None, :] * z[..., None]
        pts = pts.reshape(-1, 3)

        # one device call over the full (static-capacity) slot axis
        scores_all = np.asarray(self._overlap_scores_fn()(
            jnp.asarray(pts, jnp.float32), self.keyframes.est_c2w))
        scores = scores_all[:n_candidates]
        order = [s for s in np.argsort(scores)[::-1] if scores[s] > 0]
        return list(self.np_rng.permutation(np.array(order, np.int64))[:k]) \
            if order else random_select(n_candidates, k, self.np_rng)

    def _frustum_masks(self, idx, cur_depth):
        """Per-level frustum feature masks for the current frame
        (reference Mapper.py:129-200; coarse grid never masked)."""
        from ..models.grids import make_frustum_mask_fn
        c2w = jnp.asarray(self.estimate_c2w_list[idx])
        masks = {}
        for name, g in self.c_grid.items():
            if name == "grid_coarse":
                masks[name] = jnp.ones(g.shape[:3] + (1,), jnp.float32)
                continue
            if name not in self._frustum_mask_fns:
                self._frustum_mask_fns[name] = make_frustum_mask_fn(
                    g.shape[:3], self.H, self.W, self.fx, self.fy,
                    self.cx, self.cy)
            masks[name] = self._frustum_mask_fns[name](self.bound, c2w,
                                                       cur_depth)
        return masks

    def _map_frame(self, idx, color, sensor_depth, gt_c2w, num_iters,
                   outer_iters, refine=False, lr_factor: float = 1.0):
        t0 = time.time()
        max_frames = (self.ecfg.mapping_window_size * 2 + 1 if refine
                      else self.max_window)

        if (self.ecfg.keyframe_selection_method == "overlap"
                or self._use_grid_masks):
            # these paths build host-side rays from the current pose
            self._commit_pending_pose()
        cur_cam = self._cam7_current(idx)
        _, _, cur_color_u8 = self._upload_frame(idx, color, sensor_depth)
        cur_depth = self._supervising_depth(idx, sensor_depth)
        grid_masks = (self._frustum_masks(idx, cur_depth)
                      if self._use_grid_masks else None)

        do_ba0 = self.ecfg.BA and len(self.keyframes) > 4
        if (self.ecfg.fused_outer and not self.nice
                and not self._use_grid_masks and not do_ba0
                and outer_iters > 1):
            self._map_frame_fused(idx, refine, color, cur_depth,
                                  cur_color_u8, cur_cam, max_frames,
                                  num_iters, outer_iters, lr_factor)
            self.mapping_first_frame_done = True
            self.timings["mapping"] += time.time() - t0
            return

        for outer in range(outer_iters):
            slots = self._select_window(refine, color, cur_depth,
                                        self.estimate_c2w_list[idx])
            kf_color, kf_depth, kf_pseudo, kf_cams = \
                self.keyframes.gather_window(
                    np.asarray(slots + [0] * (max_frames - 1 - len(slots)),
                               np.int64))
            kf_sup = kf_pseudo if self.ecfg.weak_depth else kf_depth

            colors = jnp.concatenate([kf_color, cur_color_u8[None]], 0)
            depths = jnp.concatenate([kf_sup, cur_depth[None]], 0)
            cams = jnp.concatenate([kf_cams, cur_cam[None]], 0)
            valid = np.zeros((max_frames,), bool)
            valid[: len(slots)] = True
            valid[-1] = True

            do_ba = self.ecfg.BA and len(self.keyframes) > 4
            ba_mask_all = np.zeros((max_frames,), bool)
            if do_ba:
                ba_mask_all[: len(slots)] = True
                ba_mask_all[-1] = True
                if slots:
                    oldest = int(np.argmin(np.asarray(slots)))
                    ba_mask_all[oldest] = False

            for stage, n_iters in self._stage_schedule(num_iters):
                # NICE optimizes cameras only during the color stage
                # (Mapper.py:534-536)
                ba_mask = ba_mask_all if (stage == "color" or not self.nice) \
                    else np.zeros((max_frames,), bool)
                step_fn = self._get_mapper_step(max_frames, stage, lr_factor)
                if self._use_grid_masks:
                    self.params, self.c_grid, cams_out, losses = step_fn(
                        self.params, self.c_grid, colors, depths, cams,
                        jnp.asarray(valid), jnp.asarray(ba_mask), self.bound,
                        self._next_key(), grid_masks, n_iters)
                else:
                    self.params, self.c_grid, cams_out, losses = step_fn(
                        self.params, self.c_grid, colors, depths, cams,
                        jnp.asarray(valid), jnp.asarray(ba_mask), self.bound,
                        self._next_key(), n_iters)
                cams = cams_out
                self.loss_log["mapping"].append((idx, losses))
                if self.verbose:
                    print(f"Mapping frame {idx} outer {outer} [{stage}]: "
                          f"loss {float(losses[0]):.1f} -> "
                          f"{float(losses[-1]):.1f}")

            if do_ba:
                for w, slot in enumerate(slots):
                    self.keyframes.set_est_c2w(slot, cams[w])
                cur_cam = cams[-1]
                if getattr(self, "_pending_pose", None) is not None \
                        and self._pending_pose[0] == idx:
                    self._pending_pose = None  # BA pose supersedes
                self.estimate_c2w_list[idx] = self._c2w44(
                    np.asarray(cur_cam))

        self.mapping_first_frame_done = True
        self.timings["mapping"] += time.time() - t0

    def _map_frame_fused(self, idx, refine, color, cur_depth, cur_color_u8,
                         cur_cam, max_frames, num_iters, outer_iters,
                         lr_factor):
        """Fused outer loop (round 5, PERF.md): the 3-outer x num_iters
        schedule as ONE device dispatch. Windows are pre-selected with the
        SAME np_rng draw sequence as the host loop (selection is
        independent of the device results on the no-BA path), stacked, and
        scanned on device (mapper.mapper_multi_step); fresh Adam + fresh
        window per outer, exactly the host loop's semantics."""
        wins = []
        for _ in range(outer_iters):
            slots = self._select_window(refine, color, cur_depth,
                                        self.estimate_c2w_list[idx])
            kf_color, kf_depth, kf_pseudo, kf_cams = \
                self.keyframes.gather_window(
                    np.asarray(slots + [0] * (max_frames - 1 - len(slots)),
                               np.int64))
            kf_sup = kf_pseudo if self.ecfg.weak_depth else kf_depth
            valid = np.zeros((max_frames,), bool)
            valid[: len(slots)] = True
            valid[-1] = True
            wins.append((
                jnp.concatenate([kf_color, cur_color_u8[None]], 0),
                jnp.concatenate([kf_sup, cur_depth[None]], 0),
                jnp.concatenate([kf_cams, cur_cam[None]], 0),
                valid))
        colors_o = jnp.stack([w[0] for w in wins])
        depths_o = jnp.stack([w[1] for w in wins])
        cams_o = jnp.stack([w[2] for w in wins])
        valid_o = jnp.asarray(np.stack([w[3] for w in wins]))
        ba_o = jnp.zeros((outer_iters, max_frames), bool)
        step_fn = self._get_mapper_step(max_frames, "color", lr_factor,
                                        outer_fused=True)
        self.params, self.c_grid, _, losses = step_fn(
            self.params, self.c_grid, colors_o, depths_o, cams_o, valid_o,
            ba_o, self.bound, self._next_key(), num_iters)
        self.loss_log["mapping"].append((idx, losses))
        if self.verbose:
            print(f"Mapping frame {idx} fused x{outer_iters}: "
                  f"loss {float(losses[0]):.1f} -> {float(losses[-1]):.1f}")

    # -- tracking ---------------------------------------------------------
    def _track_frame(self, idx, color, sensor_depth, gt_c2w,
                     defer_commit: bool = False):
        """Refine the pose of frame idx.

        defer_commit: leave the refined camera as a device array (stored in
        self._pending_pose) instead of pulling it to the host — the caller
        dispatches the mapper against the device tensor while the tracking
        scan still runs on device, recovering the reference's
        tracker/mapper pipeline overlap (SURVEY §2.4 P1) without its races.
        _commit_pending_pose() materializes the host pose later (by then
        the device has long finished the tracking scan)."""
        t0 = time.time()
        if self._pose_init_override is not None:
            init = self._pose_init_override
            self._pose_init_override = None
        elif self.ecfg.const_speed_assumption and idx >= 2:
            pre = self.estimate_c2w_list[idx - 1]
            prepre = self.estimate_c2w_list[idx - 2]
            init = pre @ np.linalg.inv(prepre) @ pre
        else:
            init = self.estimate_c2w_list[idx - 1]
        cam0 = self._cam7(init)
        color_dev, _, _ = self._upload_frame(idx, color, sensor_depth)
        depth_sup = self._supervising_depth(idx, sensor_depth)
        best_cam, best_loss, first_loss = self.tracking_step(
            self.params, self.c_grid, cam0, color_dev, depth_sup,
            self.bound, self._next_key())
        self.loss_log["tracking"].append((idx, first_loss, best_loss))
        if (defer_commit and not self.verbose
                and getattr(self, "tracking_visualizer", None) is None):
            self._pending_pose = (idx, best_cam)
            self.timings["tracking"] += time.time() - t0
            return best_cam
        self.estimate_c2w_list[idx] = self._c2w44(best_cam)
        if self.verbose:
            gt_cam = self._cam7(gt_c2w)
            err = float(jnp.abs(gt_cam - best_cam).mean())
            print(f"Tracking frame {idx}: loss {float(first_loss):.2f} -> "
                  f"{float(best_loss):.2f}, cam err {err:.4f}")
        if getattr(self, "tracking_visualizer", None) is not None:
            self.tracking_visualizer.vis(self, idx, sensor_depth, color,
                                         self.estimate_c2w_list[idx])
        self.timings["tracking"] += time.time() - t0
        return best_cam

    def _commit_pending_pose(self):
        """Materialize a deferred tracked pose into the host pose table."""
        pending = getattr(self, "_pending_pose", None)
        if pending is not None:
            idx, cam_dev = pending
            self._pending_pose = None
            self.estimate_c2w_list[idx] = self._c2w44(np.asarray(cam_dev))

    def _cam7_current(self, idx):
        """cam7 of frame idx, preferring the deferred device tensor (no
        host sync) over the host pose table."""
        pending = getattr(self, "_pending_pose", None)
        if pending is not None and pending[0] == idx:
            return pending[1]
        return self._cam7(self.estimate_c2w_list[idx])

    # -- keyframes --------------------------------------------------------
    def _maybe_insert_keyframe(self, idx, color, sensor_depth, gt_c2w):
        e = self.ecfg
        want = (idx % e.keyframe_every == 0 or idx == self.n_img - 2
                or (e.weak_depth and idx % e.every_frame == 0))
        if not want or idx in self.keyframes.frame_idx:
            return
        _, depth_dev, color_u8 = self._upload_frame(idx, color, sensor_depth)
        pseudo = self.pseudo_depths.get(idx)
        self.keyframes.insert(
            idx, color_u8, depth_dev,
            self._cam7_current(idx), self._cam7(gt_c2w),
            pseudo_depth=pseudo)

    # -- main loop ---------------------------------------------------------
    def step(self, idx, color, sensor_depth, gt_c2w):
        """Process one frame (tracking + mapping as scheduled)."""
        e = self.ecfg
        self.gt_c2w_list[idx] = gt_c2w

        if idx == 0:
            self.estimate_c2w_list[0] = gt_c2w
            self._maybe_insert_keyframe(0, color, sensor_depth, gt_c2w)
            if not e.weak_depth:
                self._map_frame(0, color, sensor_depth, gt_c2w,
                                e.iters_first, 1,
                                lr_factor=self.cfg["mapping"]["lr_first_factor"])
            self.timings["frames"] += 1
            return

        # ---- tracking
        if e.gt_camera:
            self.estimate_c2w_list[idx] = gt_c2w
        elif e.weak_depth:
            if not self._bootstrapped and idx % e.track_every_frame == 0:
                self._bootstrap_weak(idx, color, gt_c2w)
            elif self._bootstrapped and idx % e.track_every_frame == 0 and \
                    self.mapping_first_frame_done:
                # intended reference design (Tracker.py:825-834 note):
                # two-view solve pose + pseudo-depth FIRST, then NeRF-refine
                # the pose with that fresh supervision
                self._frontend_frame(idx, color)
                self._track_frame(idx, color, sensor_depth, gt_c2w)
                if self.scale_telemetry \
                        and self.scale_telemetry[-1]["idx"] == idx:
                    self.scale_telemetry[-1]["c_refined"] = \
                        self.estimate_c2w_list[idx][:3, 3].tolist()
                    self.scale_telemetry[-1]["c_gt"] = \
                        gt_c2w[:3, 3].tolist()
                self._backfill_poses(idx - e.track_every_frame, idx)
            else:
                self.estimate_c2w_list[idx] = self.estimate_c2w_list[idx - 1]
        else:
            # sensor-depth mode: defer the host pose pull so the mapper
            # below is prepared + dispatched while the tracking scan still
            # runs on device (P1 overlap; committed at end of step)
            self._track_frame(idx, color, sensor_depth, gt_c2w,
                              defer_commit=True)

        # ---- mapping
        final = idx == self.n_img - 1
        if idx % e.every_frame == 0 or final:
            if e.weak_depth and not self._bootstrapped:
                pass  # nothing to map before the bootstrap succeeds
            else:
                self._maybe_insert_keyframe(idx, color, sensor_depth, gt_c2w)
                lr_first = self.cfg["mapping"]["lr_first_factor"]
                if final and e.color_refine:
                    self._map_frame(idx, color, sensor_depth, gt_c2w,
                                    e.iters, 5, refine=True)
                elif e.weak_depth and not self.mapping_first_frame_done:
                    self._map_frame(idx, color, sensor_depth, gt_c2w,
                                    e.iters_first, 1, lr_factor=lr_first)
                else:
                    outer = 1 if self.nice else 3
                    self._map_frame(idx, color, sensor_depth, gt_c2w,
                                    max(e.iters // outer, 1), outer)
                # P1 overlap (weak mode): the mapper scan was dispatched
                # asynchronously — read + extract the NEXT tracked frame's
                # features now, while the device is busy mapping
                if (e.weak_depth and self._bootstrapped
                        and self.frontend is not None and not final):
                    nxt = (idx // e.track_every_frame + 1) \
                        * e.track_every_frame
                    if nxt < self.n_img:
                        t0 = time.time()
                        self.frontend.prefetch_extract(self.frame_reader,
                                                       nxt)
                        self.timings["frontend"] += time.time() - t0
        self._commit_pending_pose()
        self.timings["frames"] += 1

    def _backfill_poses(self, lo: int, hi: int):
        """Replace the pose-copy placeholders of the non-tracked frames in
        (lo, hi) with SE(3) interpolation between the two tracked solves.

        eval_ate (reference src/tools/eval_ate.py:261-301) scores EVERY
        frame of the trajectory; with track_every_frame=5 at the
        flagship's 43 mm/frame camera speed, raw pose copies alone cost
        ~105 mm RMSE — over the 50 mm acceptance bar before tracking
        contributes any error at all. Interpolation reduces the untracked
        frames to the (sub-mm, smooth-orbit) interpolation residual.
        Known coarseness: a later BA writeback moves tracked endpoint
        poses without re-interpolating the span between them."""
        if hi - lo < 2 or lo < 0:
            return
        from ..core.se3_np import interp_c2w_np
        a = self.estimate_c2w_list[lo]
        b = self.estimate_c2w_list[hi]
        for k in range(lo + 1, hi):
            self.estimate_c2w_list[k] = interp_c2w_np(
                a, b, (k - lo) / (hi - lo))

    def _bootstrap_weak(self, idx, color, gt_c2w):
        """Sparse front-end bootstrap at idx == track_every_frame
        (src/Tracker.py:761-834)."""
        if self.frontend is None:
            self.estimate_c2w_list[idx] = gt_c2w
            return
        t0 = time.time()
        try:
            est_c2w, pseudo_ref, pseudo_cur = self.frontend.bootstrap(
                self.frame_reader, 0, idx, self.estimate_c2w_list[0])
            self._bootstrapped = True
        except RuntimeError as e:
            # degenerate baseline (too little parallax yet): postpone the
            # bootstrap to the next tracked frame — the baseline grows
            print(f"Frontend bootstrap failed at {idx} ({e}); retrying at "
                  f"the next tracked frame")
            self.estimate_c2w_list[idx] = self.estimate_c2w_list[idx - 1]
            self.timings["frontend"] += time.time() - t0
            return
        self.estimate_c2w_list[idx] = est_c2w
        # the frames held at est[0] while the bootstrap waited for
        # parallax carry up to ~0.8 m error each; interpolate them through
        # the solved bootstrap pose (same rationale as _backfill_poses)
        self._backfill_poses(0, idx)
        self.pseudo_depths[0] = pseudo_ref
        self.pseudo_depths[idx] = pseudo_cur
        # back-fill the first keyframe's pseudo depth (Mapper.py:829)
        if 0 in self.keyframes.frame_idx:
            slot = self.keyframes.frame_idx.index(0)
            from .state import _insert
            self.keyframes.pseudo_depth = _insert(
                self.keyframes.pseudo_depth, jnp.int32(slot), pseudo_ref)
        if self.verbose and self.frontend.telemetry:
            t = self.frontend.telemetry[-1]
            print(f"Frontend bootstrap {idx}: {t['n_matches']} matches, "
                  f"{t['n_inliers']} inliers, {t['n_accept']} triangulated, "
                  f"scale {t['scale']:.3f}")
            # pose-error telemetry vs gt (Tracker.py:773-778)
            from ..frontend.frontend import compute_pose_error
            rel_est = est_c2w @ np.linalg.inv(self.estimate_c2w_list[0])
            rel_gt = gt_c2w @ np.linalg.inv(self.gt_c2w_list[0])
            err_t, err_r = compute_pose_error(rel_est, rel_gt)
            print(f"Translation from 0 to {idx} translation error: "
                  f"{err_t:.2f} rotation error: {err_r:.2f}")
        self.timings["frontend"] += time.time() - t0

    def _frontend_frame(self, idx, color):
        """Per-tracked-frame front-end pass (intended continuous behavior
        of the weak pipeline; PARITY.md #2): two-view E-matrix pose +
        field-scale-anchored triangulated pseudo-depth. The solved pose
        initializes the NeRF tracker, which refines it right after using
        this pseudo-depth as supervision."""
        if self.frontend is None:
            return
        t0 = time.time()
        # field renders use a motion-model predicted pose for frame idx:
        # const-speed at TRACKED-frame granularity (non-tracked frames are
        # pose copies, so adjacent-frame differencing would predict zero
        # motion)
        step = self.ecfg.track_every_frame
        if idx - 2 * step >= 0 and self.ecfg.const_speed_assumption:
            pre = self.estimate_c2w_list[idx - step]
            prepre = self.estimate_c2w_list[idx - 2 * step]
            self.estimate_c2w_list[idx] = pre @ np.linalg.inv(prepre) @ pre
        else:
            self.estimate_c2w_list[idx] = self.estimate_c2w_list[idx - 1]
        field_ctx = None
        if self.mapping_first_frame_done:
            field_ctx = dict(
                params=self.params, c_grid=self.c_grid,
                c2w_pred=self.estimate_c2w_list[idx], bound=self.bound,
                model_cfg=self.model_cfg, rcfg=self.rcfg)
        ref_idx = self.frontend.prev["frame_idx"] \
            if self.frontend.prev is not None else -1
        gt_baseline = None
        if self.ecfg.gt_scale_injection and ref_idx >= 0:
            # oracle-scale ablation (BASELINE.md error budget): true
            # metric baseline between the pair, everything else live
            gt_baseline = float(np.linalg.norm(
                self.gt_c2w_list[idx][:3, 3]
                - self.gt_c2w_list[ref_idx][:3, 3]))
        est_c2w, pseudo = self.frontend.track_continuous(
            self.frame_reader, idx, self.estimate_c2w_list,
            field_ctx=field_ctx, gt_baseline=gt_baseline)
        if est_c2w is not None:
            self._pose_init_override = est_c2w
        if pseudo is not None:
            self.pseudo_depths[idx] = pseudo
        # per-stage scale/pose telemetry (VERDICT r4 #1): bank the motion
        # model's predicted center, the front-end-solved center, and (after
        # the NeRF refine, see process_frame) the refined + gt centers —
        # the decomposition that locates which stage injects scale error.
        self.scale_telemetry.append({
            "idx": idx, "ref_idx": ref_idx,
            "c_prior": self.estimate_c2w_list[idx][:3, 3].tolist(),
            "c_solve": None if est_c2w is None
            else np.asarray(est_c2w)[:3, 3].tolist()})
        self.timings["frontend"] += time.time() - t0

    def run(self, start_idx: int = 0):
        # host-side frame prefetch (SURVEY §2.4 P7 — the reference used
        # DataLoader workers). OFF by default: a second host thread crashes
        # the experimental axon PJRT client (bisected: every flow with the
        # prefetch thread died with "TPU worker crashed", every
        # single-threaded flow survived). Enable with data.prefetch: true
        # on thread-safe runtimes.
        prefetch = bool(self.cfg["data"].get("prefetch", False))
        if prefetch:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=1)
            pending = pool.submit(self.frame_reader.__getitem__, start_idx)
        for idx in range(start_idx, self.n_img):
            if prefetch:
                _, color, depth, gt_c2w = pending.result()
                if idx + 1 < self.n_img:
                    pending = pool.submit(self.frame_reader.__getitem__,
                                          idx + 1)
            else:
                _, color, depth, gt_c2w = self.frame_reader[idx]
            if (self.logger is not None and idx > 0
                    and idx % self.ecfg.every_frame == 0):
                # pre-bank BEFORE dispatching this frame's mapping: the
                # axon runtime's crash mode surfaces at the first D2H pull
                # AFTER a big mapping scan (PERF.md "axon runtime
                # instability"), killing the post-step checkpoint too — so
                # without this, a crashy period banks NOTHING and the
                # supervisor loops at frame 0 forever. Everything up to
                # idx-1 is consistent here; resume re-runs frame idx.
                self.logger.log(self, idx - 1)
            self.step(idx, color, depth, gt_c2w)
            if self.logger is not None:
                self.logger.maybe_log(self, idx)
            if self.mesher is not None:
                self.mesher.maybe_mesh(self, idx)
            if getattr(self, "visualizer", None) is not None and idx > 0:
                self.visualizer.vis(self, idx, depth, color,
                                    self.estimate_c2w_list[idx])
            if getattr(self, "match_visualizer", None) is not None:
                self.match_visualizer.vis(self, idx)
            for v in getattr(self, "aux_visualizers", ()):
                v.vis(self, idx)
        if self.mesher is not None:
            # a chunked attempt (--n_frames) can end with a mesh job
            # mid-flight; finish it so no periodic mesh is lost
            self.mesher.flush(self)
        return self.estimate_c2w_list, self.gt_c2w_list
