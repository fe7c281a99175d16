"""Sparse visual front-end: pose initialization + pseudo-depth production.

Capability of the reference's pyslam-graft bootstrap (src/Tracker.py:458-610):
  extract keypoints -> two-way NN match -> essential-matrix RANSAC pose ->
  two-view triangulation -> median-depth scale fix -> reproject -> patch
  splat into pseudo-depth maps.

Coordinate bridge: the neural-field side uses the OpenGL-style camera
(-y, -z; src/common.py:74-89); classical epipolar geometry here runs in the
CV convention (+z forward). F = diag(1,-1,-1) converts between camera frames:
Tcw_cv = F4 @ inv(c2w_nerf).

Scale handling (PARITY.md #15): the reference rescales the *absolute*
translations of both cameras by depth_scale (Tracker.py:514-527), which is a
similarity about the world origin; we apply the equivalent-but-anchored
version — scale the relative baseline and the structure about the reference
camera center — so the gt-initialized first pose stays the world anchor.
depth_scale is fixed at bootstrap (median triangulated depth == median gt
depth of frame 0) and reused for subsequent tracked pairs (Tracker.py:522-527).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import inv_T
from .epipolar import estimate_relative_pose_ransac
from .features import HarrisExtractor, SuperPointExtractor
from .mapstore import _KF_REGISTRY, KeyFrame, Map, MapPoint
from .matching import match_two_way
from .pseudo_depth import splat_pseudo_depth
from .triangulate import point_checks, triangulate_points

_F4 = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def compute_pose_error(T_rel_est: np.ndarray, T_rel_gt: np.ndarray):
    """SuperGlue-style angular pose errors (Tracker.py:362-396): translation
    direction angle (with the E-ambiguity fold at 180 deg) and rotation
    angle, both in degrees."""
    t = T_rel_est[:3, 3]
    t_gt = T_rel_gt[:3, 3]
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    err_t = np.degrees(np.arccos(np.clip(t @ t_gt / max(n, 1e-12), -1, 1)))
    err_t = min(err_t, 180.0 - err_t)  # essential-matrix sign ambiguity
    cos = (np.trace(T_rel_est[:3, :3].T @ T_rel_gt[:3, :3]) - 1) / 2
    err_r = np.degrees(np.abs(np.arccos(np.clip(cos, -1.0, 1.0))))
    return float(err_t), float(err_r)


def _inv_rigid_np(T: np.ndarray) -> np.ndarray:
    """Invert a (4, 4) rigid transform on the host (no device dispatch —
    this glue runs per tracked frame and each eager jax op costs a ~34 ms
    tunnel round trip)."""
    R = T[:3, :3]
    t = T[:3, 3]
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


def nerf_c2w_to_cv_w2c(c2w_nerf: np.ndarray) -> np.ndarray:
    return _F4 @ _inv_rigid_np(np.asarray(c2w_nerf, np.float64))


def cv_w2c_to_nerf_c2w(Tcw_cv: np.ndarray) -> np.ndarray:
    return _inv_rigid_np(_F4 @ np.asarray(Tcw_cv, np.float64))


class SparseFrontend:
    def __init__(self, cfg, H, W, fx, fy, cx, cy, extractor=None, key=None):
        self.H, self.W = H, W
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.depth_patch = cfg.get("depth_patch", 5)
        self.nn_thresh = cfg.get("nn_thresh", 0.7)
        self.max_kps = cfg.get("num_features", 1000)
        # bundle_loss (configs/pointNeRF_slam.yaml:4): the reference sets it
        # True but its g2o calls are commented out (src/map.py:320-337) —
        # here the flag actually runs motion-only LM pose refinement against
        # the triangulated points after the two-view solve (PARITY.md)
        self.bundle_loss = cfg.get("bundle_loss", True)
        # reference (pyslam kRansacThresholdNormalized) uses 3e-4, tuned for
        # fx~600 with sub-pixel SuperPoint corners; integer-pixel detectors
        # at low focal need at least ~1px/fx
        self.ransac_thresh = cfg.get("ransac_thresh",
                                     max(3e-4, 1.0 / float(fx)))
        self.key = key if key is not None else jax.random.PRNGKey(7)
        if extractor is not None:
            self.extractor = extractor
        else:
            self.extractor = self._default_extractor(cfg, H, W)
        self.depth_scale: Optional[float] = None
        self.median_gt_depth: Optional[float] = None
        # bootstrap-calibrated median-keypoint-depth / median-image-depth
        # offset (scale-sanity restoring force; None = force disabled)
        self.kp_depth_ratio0: Optional[float] = None
        self.prev = None  # REFERENCE keyframe: dict(frame_idx, feats)
        self.telemetry = []
        # recent accepted camera-center steps (tracked-frame granularity)
        # for the motion-plausibility gate in track_continuous
        self._step_hist: list = []
        self._last_tracked_idx: Optional[int] = None
        # kept for checkpoint compatibility (logger.resume_slam sets it);
        # the EWMA scale carry it guarded was replaced by the per-solve
        # motion-model baseline prior (see _two_view)
        self._scale_anchored = False
        # reference-keyframe policy (pyslam tracks against a reference
        # KEYFRAME, not the previous frame — /root/reference
        # src/Tracker.py:458 names the method track_reference_frame):
        # hold the two-view reference fixed until the triangulation
        # parallax is adequate. At the consecutive-tracked-frame baseline
        # of the flagship scene (0.9 deg) two-view depth is pure noise
        # (measured: 0 accepted triangulations), while 2-8 deg gives
        # 0.6-1.5% median depth error; chaining per-pair solves also
        # accumulated a scale random walk (run-2 forensics, RESULTS.md).
        self.min_parallax_deg = float(cfg.get("min_parallax_deg", 1.5))
        # 2.5 (was 3.0): the k4_100 run held a reference into a hard
        # wide-baseline region — inliers collapsed 301 -> 32 -> 6 over 10
        # frames, 3 tracked frames dropped, and the NeRF refine dragged
        # the frozen trajectory to 0.27x speed (round-5 forensics).
        # Advance while the pair is still healthy, not when it breaks.
        self.ref_advance_parallax_deg = float(
            cfg.get("ref_advance_parallax_deg", 2.5))
        self.ref_min_matches = int(cfg.get("ref_min_matches", 150))
        # inlier-decay advance trigger (see track_continuous tail): 60
        # (was 30) — at 30 the k4_100 frame-60 pair (32 inliers of 342
        # matches, 9% consistent) did NOT advance and the next two solves
        # failed outright
        self.ref_min_inliers = int(cfg.get("ref_min_inliers", 60))
        self.ref_max_fail = int(cfg.get("ref_max_fail", 2))
        self._ref_fail_count = 0
        # gap-aware parallax expectation (round-5 run-4 forensics,
        # RESULTS.md): the kernel's parallax is the median triangulation
        # angle over ACCEPTED candidates — in the degenerate just-advanced
        # regime (gap 5, true parallax ~0.9 deg) the acceptance gates
        # (cos < 0.9998 => par > 1.15 deg) select exactly the noise-shaped
        # survivors, so the measurement can only read HIGH garbage (5-30
        # deg observed in run 4) precisely where the low-parallax hold
        # must fire; every reference advance then re-injected a fresh
        # scale error through an "adequate-parallax" solve. Maintain a
        # deg/frame rate from conditioned solves (gap >= par_rate_min_gap,
        # where run-4 telemetry shows sane 1.2-3.5 deg readings) and gate
        # on min(measured, rate*gap): the expectation bounds the
        # measurement wherever the measurement cannot be trusted.
        self._par_rate: Optional[float] = None
        self.par_rate_min_gap = int(cfg.get("par_rate_min_gap", 10))
        # stuck-reference escape must count ALL non-accepted tracked
        # frames: run 4 held reference 440 for 11 consecutive
        # plausibility-gate rejections (the fail counter only saw
        # outright solve failures) and dead-reckoned the whole stretch
        self.ref_max_reject = int(cfg.get("ref_max_reject", 3))
        self._reject_count = 0
        # persistent sparse map (src/map.py live bookkeeping): accepted
        # triangulations become MapPoints observed in both frames; alive
        # points re-project into later frames so the pseudo-depth draws on
        # MULTI-frame structure instead of only the latest two-view pair
        self.use_map = bool(cfg.get("map_points", True))
        self.map = Map(max_frames=cfg.get("map_max_frames", 20)) \
            if self.use_map else None
        self.map_proj_budget = int(cfg.get("map_proj_budget", 2048))
        self.map_cull_every = int(cfg.get("map_cull_every", 5))
        self.map_max_points = int(cfg.get("map_max_points", 12000))
        # map-anchored metric scale (run-3 forensics, RESULTS.md round 4):
        # the per-pair field anchor is ±60% noisy on a young field, and
        # blending it with the dead-reckoned prior still random-walks
        # ~4 mm/tracked-frame. Confirmed MapPoints observed in the
        # REFERENCE keyframe give a direct scale measurement instead:
        # both the map depth and the triangulated depth of the same ref
        # keypoint live in the REF camera (known pose), and the latter is
        # linear in the applied baseline scale — their median ratio is the
        # multiplicative correction that pins this solve to the map's
        # metric frame (bootstrap-anchored to the gt median depth).
        self.map_scale_anchor = bool(cfg.get("map_scale_anchor", True))
        self.map_scale_min_pts = int(cfg.get("map_scale_min_pts", 10))
        # bootstrap conditioning gate (closed-loop sim finding: a lucky
        # RANSAC draw can pass the bare n>=8 candidate check at a 0.9 deg
        # parallax, seeding the map + metric scale with noise the whole
        # run then anchors to): require adequate parallax AND a healthy
        # triangulation count before accepting the bootstrap pair.
        self.bootstrap_min_parallax_deg = float(
            cfg.get("bootstrap_min_parallax_deg", 2.0))
        self.bootstrap_min_cand = int(cfg.get("bootstrap_min_cand", 50))
        # absolute motion sanity: a solved camera step beyond this
        # fraction of the scene's median depth per tracked frame is a
        # scale blow-up regardless of the (corruptible) step history
        self.max_step_depth_frac = float(
            cfg.get("max_step_depth_frac", 0.15))
        self._kfs = {}          # frame_idx -> KeyFrame (bounded window)
        self._kf_order = []
        self._feat_cache = {}   # frame_idx -> prefetched features (P1)
        self.last_debug = None  # latest two-view match record (draw.py)
        self._runners = {}      # mode -> fused_twoview.TwoViewRunner
        # adaptive descriptor gate (slam_dynamic_config capability): EWMA
        # of med+3*MAD of accepted match scores, fed back into the next
        # frame's matcher. dyn_matching: false pins the static nn_thresh.
        self.dyn = None
        if cfg.get("dyn_matching", True):
            from .dyn_config import SLAMDynamicConfig
            self.dyn = SLAMDynamicConfig(
                max_descriptor_distance=self.nn_thresh)
        # orientation-consistency match gate (rotation_histogram
        # capability, src/search_points.py:48,71-76): live here because
        # our extractors return intensity-centroid orientations (the
        # reference's gate is dead code behind Frame.oriented_features)
        self.check_orientation = bool(cfg.get("check_orientation", True))

    def _default_extractor(self, cfg, H, W):
        """Weak-mode extractor: the SuperPoint CNN (the reference's
        flagship extractor, src/frame.py:271) when usable weights exist
        and the image divides the 8x8 cell grid, else Harris.

        `superpoint_weights` in the config names the checkpoint (.pth =
        public torch weights via the converter, .npz = the distilled
        checkpoint from tools/train_superpoint.py; 'none' forces Harris).
        The default path is the public checkpoint only: the in-repo
        distilled npz (pretrained/superpoint_synthetic.npz) runs the full
        weak pipeline (tests/test_frontend.py SP-bootstrap test) but its
        small-corpus descriptors mismatch repetitive texture often enough
        to lose ~2x triangulation accuracy vs Harris patches on the
        synthetic scenes — so it is opt-in, not default."""
        sp_cfg = cfg.get("superpoint_weights",
                         "pretrained/superpoint_v1.pth")
        if str(sp_cfg).lower() in ("none", "off", "false") \
                or H % 8 or W % 8:
            return HarrisExtractor(max_kps=self.max_kps)
        if os.path.exists(str(sp_cfg)):
            return SuperPointExtractor(str(sp_cfg), max_kps=self.max_kps)
        return HarrisExtractor(max_kps=self.max_kps)

    # -- helpers -----------------------------------------------------------
    def _extract(self, color_np: np.ndarray):
        gray = jnp.asarray(color_np, jnp.float32).mean(-1)
        return self.extractor.extract(gray)

    def _kpn(self, kps: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack([(kps[:, 0] - self.cx) / self.fx,
                          (kps[:, 1] - self.cy) / self.fy], -1)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def prefetch_extract(self, frame_reader, idx: int):
        """P1 pipeline overlap (SURVEY §2.4): read + dispatch feature
        extraction for a FUTURE tracked frame right after the mapper scan
        is dispatched — the host image read overlaps the device's mapping
        work and the extraction queues behind it, so when the frame's turn
        comes its features are already (being) computed."""
        if idx in self._feat_cache:
            return
        _, color, _, _ = frame_reader[idx]
        self._feat_cache.clear()  # keep at most one in-flight prefetch
        self._feat_cache[idx] = self._extract(color)

    # -- core two-view procedure -------------------------------------------
    def _runner_for(self, mode: str, field_ctx=None):
        """Compiled fused two-view step for a mode (fused_twoview): the
        whole match->RANSAC->triangulate->gate->LM chain is ONE device
        dispatch (host-issued op chains cost ~34 ms per dispatch over the
        axon tunnel and made the front-end the weak-mode bottleneck)."""
        if mode not in self._runners:
            from .fused_twoview import TwoViewRunner
            self._runners[mode] = TwoViewRunner(
                self.H, self.W, self.fx, self.fy, self.cx, self.cy,
                self.nn_thresh, self.ransac_thresh,
                model_cfg=field_ctx.get("model_cfg") if field_ctx else None,
                rcfg=field_ctx.get("rcfg") if field_ctx else None,
                bundle_loss=self.bundle_loss,
                check_orientation=self.check_orientation)
        return self._runners[mode]

    def _two_view(self, feats_ref, feats_cur, Tcw_ref_cv: np.ndarray,
                  set_scale: bool, field_ctx=None, scale_prior=None):
        """One fused-device two-view solve; returns the result dict of
        fused_twoview.TwoViewRunner.run. set_scale (bootstrap) anchors
        depth_scale to the gt median depth; otherwise `scale_prior` (the
        motion-model predicted metric baseline |C_pred - C_ref|, computed
        by track_continuous from the refined trajectory) is the carried
        scale the in-kernel field anchor is clamped against and blended
        with. The prior replaces the round-4 EWMA-of-anchors design: with
        a FIXED reference keyframe the baseline grows every tracked frame,
        so a carried per-pair EWMA is wrong by construction, while the
        dead-reckoned baseline prediction is exact up to the (tiny)
        per-frame acceleration."""
        mode = "bootstrap" if set_scale else (
            "field" if field_ctx is not None else "continuous")
        kw = {}
        if mode == "field":
            kw = dict(params=field_ctx["params"],
                      c_grid=field_ctx.get("c_grid") or {},
                      c2w_pred=field_ctx["c2w_pred"],
                      bound=field_ctx["bound"])
        r = self._runner_for(mode, field_ctx).run(
            mode, feats_ref, feats_cur, Tcw_ref_cv, self._next_key(),
            self.median_gt_depth,
            scale_prior if scale_prior is not None else self.depth_scale,
            nn_thresh=(self.dyn.max_descriptor_distance
                       if self.dyn is not None else None), **kw)
        if self.dyn is not None:
            self.dyn.update_descriptor_stats(r["score_med"],
                                             r["score_mad"])
        if set_scale:
            if r["n_cand"] < max(self.bootstrap_min_cand, 8):
                raise RuntimeError(
                    f"frontend bootstrap: only {r['n_cand']} accepted "
                    f"triangulations")
            if float(r["parallax"]) < self.bootstrap_min_parallax_deg:
                raise RuntimeError(
                    f"frontend bootstrap: parallax "
                    f"{float(r['parallax']):.2f} deg below "
                    f"{self.bootstrap_min_parallax_deg} (structure would "
                    f"be noise; waiting for baseline)")
            self.depth_scale = r["scale"]
        return r

    def _splat(self, uv, z, accept):
        return splat_pseudo_depth(
            jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32),
            jnp.asarray(accept), self.H, self.W, self.depth_patch)

    def _map_scale_correction(self, ref_idx, Tcw_ref_cv, r):
        """Metric-scale correction factor from the persistent map.

        For every accepted match whose REF keypoint observes a confirmed
        (>= 2 observations) alive MapPoint: ratio of the map point's depth
        in the ref camera (fixed, metric) to the pair's triangulated depth
        in the ref camera (linear in the applied baseline scale). The
        median ratio f rescales the solve into the map's metric frame.
        Returns (f, n_support)."""
        kf_ref = self._kfs.get(ref_idx)
        if kf_ref is None or self.map is None:
            return 1.0, 0
        obs = {}
        for mp in self.map.points:
            if mp.is_bad or len(mp.observations) < 2:
                continue
            j = mp.observations.get(kf_ref.id)
            if j is not None:
                obs[int(j)] = mp
        if not obs:
            return 1.0, 0
        Rr = Tcw_ref_cv[:3, :3]
        tr = Tcw_ref_cv[:3, 3]
        idx2, z_ref = r["idx2"], r["z_ref"]

        def _ratios(mask):
            out = []
            for i in np.flatnonzero(mask):
                mp = obs.get(int(idx2[i]))
                if mp is None:
                    continue
                z_tri = float(z_ref[i])
                z_map = float(Rr[2] @ mp.pt + tr[2])
                if z_tri > 1e-3 and z_map > 1e-3:
                    out.append(z_map / z_tri)
            return out

        ratios = _ratios(r["accept"])
        if len(ratios) < self.map_scale_min_pts:
            # deadlock recovery: when the scale has blown up, the
            # in-kernel scale window rejects EVERY triangulation, so the
            # accepted set can never vouch for a correction — fall back to
            # the pre-scale-gate candidates (cheirality+reproj+inlier,
            # scale-invariant; padded/unmatched slots carry garbage z and
            # must stay out — round-5 forensics)
            ratios = _ratios(np.asarray(r.get("cand", z_ref > 1e-3))
                             & (np.asarray(z_ref) > 1e-3))
        if len(ratios) < self.map_scale_min_pts:
            return 1.0, len(ratios)
        return float(np.median(ratios)), len(ratios)

    def _kf_for(self, frame_idx, kpn_full, desc, valid, Tcw_cv,
                angles=None):
        """Get-or-create the bounded-window KeyFrame for a frame."""
        kf = self._kfs.get(frame_idx)
        if kf is None:
            kf = KeyFrame(frame_idx, np.asarray(kpn_full),
                          np.asarray(desc), np.asarray(valid),
                          np.asarray(Tcw_cv), angles=angles)
            self._kfs[frame_idx] = kf
            self._kf_order.append(frame_idx)
            self.map.add_keyframe(kf)
            while len(self._kf_order) > self.map.frames.maxlen:
                old = self._kf_order.pop(0)
                old_kf = self._kfs.pop(old)
                old_kf.is_bad = True
                _KF_REGISTRY.pop(old_kf.id, None)
        return kf

    def _map_update(self, idx, kf_cur, kf_ref, idx2, pts3d, accept,
                    Tcw_cur_cv):
        """Persistent-map bookkeeping + multi-frame depth support (weak #7,
        src/map.py:191-311 + the search_points fuse semantics):

        1. data association: an accepted current keypoint that re-projects
           within assoc_px of an alive map point AND matches its best
           descriptor gains an OBSERVATION on that point (fuse) instead of
           spawning a duplicate;
        2. the rest become new MapPoints observed in both frames;
        3. cull by mean reprojection error (px-scaled gate);
        4. return up to map_proj_budget re-projections of CONFIRMED points
           (>= min_obs observations, i.e. structure corroborated across
           3+ frames) for the current frame's pseudo-depth."""
        alive = [mp for mp in self.map.points if not mp.is_bad]
        kpn = kf_cur.kps
        u_kp = kpn[:, 0] * self.fx + self.cx
        v_kp = kpn[:, 1] * self.fy + self.cy

        u = v = z = None
        if alive:
            pts = np.stack([mp.pt for mp in alive])
            pc = pts @ Tcw_cur_cv[:3, :3].T + Tcw_cur_cv[:3, 3]
            z = pc[:, 2]
            front = z > 1e-3
            u = pc[:, 0] / np.maximum(z, 1e-6) * self.fx + self.cx
            v = pc[:, 1] / np.maximum(z, 1e-6) * self.fy + self.cy
            inside = front & (u >= 0) & (u < self.W) & (v >= 0) \
                & (v < self.H)

        # -- 1+2: associate-or-create --
        assoc_px = 2.5
        new_mask = np.array(accept, copy=True)
        if alive:
            cand = np.flatnonzero(inside)
            if len(cand):
                du = u[cand][None, :] - u_kp[:, None]
                dv = v[cand][None, :] - v_kp[:, None]
                d2 = du * du + dv * dv
                best = np.argmin(d2, axis=1)
                near = d2[np.arange(len(kpn)), best] < assoc_px ** 2
                for i in np.flatnonzero(np.asarray(accept) & near):
                    mp = alive[cand[best[i]]]
                    desc_i = kf_cur.desc[i]
                    if mp.des is not None and np.linalg.norm(
                            mp.des - desc_i) < self.nn_thresh:
                        mp.add_observation(kf_cur, int(i), desc_i)
                        new_mask[i] = False
        self.map.add_points(np.asarray(pts3d), new_mask, kf_cur, kf_ref,
                            np.arange(len(new_mask)), np.asarray(idx2))

        # -- 3: cadence cull (px-scaled: 2 px mean reprojection) --
        if len(self._kf_order) % self.map_cull_every == 0:
            self.map.cull_points(max_reproj_err_n=2.0 / float(self.fx))
        if len(self.map.points) > self.map_max_points:
            # overflow policy: keep the MOST-OBSERVED points (stable sort:
            # older first among ties). Well-observed old points are the
            # map's absolute-scale memory — the round-4 oldest-out policy
            # rolled that memory over every ~40 tracked frames, so the
            # map anchor's metric frame itself random-walked with the
            # solves it was supposed to pin down (run-3 forensics:
            # ~200-frame scale excursions, RESULTS.md round 5).
            order = np.argsort([-mp.num_observations
                                for mp in self.map.points], kind="stable")
            keep = set(order[:self.map_max_points].tolist())
            for i, mp in enumerate(self.map.points):
                if i not in keep:
                    mp.set_bad()
            self.map.points = [self.map.points[i]
                               for i in sorted(keep)]

        # -- 4: confirmed-point projections --
        B = self.map_proj_budget
        uv_m = np.zeros((B, 2), np.float32)
        z_m = np.zeros((B,), np.float32)
        acc_m = np.zeros((B,), bool)
        if alive:
            nobs = np.array([len(mp.observations) for mp in alive])
            zmin = 0.05 * (self.median_gt_depth or 1.0)
            sel = np.flatnonzero(inside & (nobs >= 3) & (z > zmin))
            if len(sel) > B:
                sel = sel[np.argsort(-nobs[sel], kind="stable")[:B]]
            k = len(sel)
            uv_m[:k, 0] = u[sel]
            uv_m[:k, 1] = v[sel]
            z_m[:k] = z[sel]
            acc_m[:k] = True
        return uv_m, z_m, acc_m

    # -- public API ----------------------------------------------------------
    def bootstrap(self, frame_reader, ref_idx: int, cur_idx: int,
                  ref_c2w_nerf: np.ndarray):
        """Initial two-view bootstrap (Tracker.py:761-812).

        Returns (est_c2w_cur (4,4) NeRF convention, pseudo_ref, pseudo_cur).
        """
        _, color_ref, depth_ref, _ = frame_reader[ref_idx]
        _, color_cur, _, _ = frame_reader[cur_idx]
        if self.median_gt_depth is None:
            z = np.sort(np.asarray(depth_ref).reshape(-1))
            self.median_gt_depth = float(z[(len(z) - 1) // 2])

        feats_ref = self._extract(color_ref)
        feats_cur = self._extract(color_cur)
        Tcw_ref_cv = nerf_c2w_to_cv_w2c(ref_c2w_nerf)

        r = self._two_view(feats_ref, feats_cur, Tcw_ref_cv,
                           set_scale=True)
        Tcw_cur_cv, uv_cur, uv_ref = r["Tcw_cur"], r["uv_cur"], r["uv_ref"]
        z_cur, z_ref, accept = r["z_cur"], r["z_ref"], r["accept"]

        # keypoint-located metric anchor: the kernel's bootstrap scale
        # equates the MEDIAN triangulated keypoint depth with the median
        # of the FULL ref depth image — a systematic bias wherever
        # detected corners sit deeper/shallower than the image median
        # (closed-loop sim: 14% short baselines, ~6 mm/tracked-frame
        # linear drift). Re-anchor with the SAME supervision source
        # (the bootstrap frame's depth, PARITY #27) evaluated AT the
        # accepted keypoints' pixels, which is unbiased by construction.
        d_ref_np = np.asarray(depth_ref)
        zr_np = np.asarray(z_ref)
        u_px = np.clip(np.round(np.asarray(uv_ref[:, 0])).astype(int),
                       0, self.W - 1)
        v_px = np.clip(np.round(np.asarray(uv_ref[:, 1])).astype(int),
                       0, self.H - 1)
        gtz = d_ref_np[v_px, u_px]
        m = np.asarray(accept) & (zr_np > 1e-3) & (gtz > 1e-3)
        if int(m.sum()) >= 20:
            f0 = float(np.clip(np.median(gtz[m] / zr_np[m]), 0.5, 2.0))
            C_ref = _inv_rigid_np(Tcw_ref_cv)[:3, 3]
            Twc_cur = _inv_rigid_np(Tcw_cur_cv)
            Twc_cur[:3, 3] = C_ref + f0 * (Twc_cur[:3, 3] - C_ref)
            Tcw_cur_cv = _inv_rigid_np(Twc_cur)
            z_cur = np.asarray(z_cur) * f0
            z_ref = zr_np * f0
            self.depth_scale = float(self.depth_scale) * f0
            self.telemetry_f0 = f0  # diagnostic
        # calibrate the keypoint-vs-image median-depth offset for the
        # scale-sanity restoring force (same extractor, same supervision
        # source as the rest of the run)
        zr_fin = np.asarray(z_ref)
        zr_fin = zr_fin[np.asarray(accept) & (zr_fin > 1e-3)]
        if len(zr_fin) >= 20 and self.median_gt_depth:
            self.kp_depth_ratio0 = float(
                np.median(zr_fin) / self.median_gt_depth)

        self.telemetry.append({
            "idx": cur_idx, "n_matches": r["n_matches"],
            "n_inliers": r["n_inliers"], "n_accept": r["n_accept"],
            "scale": r["scale"]})

        pseudo_ref = self._splat(uv_ref, z_ref, accept)
        pseudo_cur = self._splat(uv_cur, z_cur, accept)
        self.last_debug = {"ref_idx": ref_idx, "cur_idx": cur_idx,
                           "kps_ref": np.asarray(uv_ref),
                           "kps_cur": np.asarray(uv_cur),
                           "accept": np.asarray(accept)}
        self.prev = {"frame_idx": cur_idx, "feats": feats_cur}
        self._last_tracked_idx = cur_idx
        # seed the parallax-rate expectation (deg/frame) from the
        # bootstrap pair — the first conditioned measurement available
        # (the bootstrap gate already required parallax >= 2.0 deg)
        bs_par = float(r["parallax"])
        if np.isfinite(bs_par) and bs_par > 0:
            self._par_rate = bs_par / max(cur_idx - ref_idx, 1)
        if self.map is not None:
            # seed the persistent map with the (scale-anchored) bootstrap
            # structure: re-triangulate with the FINAL scaled pose and
            # register both KeyFrames + accepted MapPoints
            self._map_register_from_feats(
                cur_idx, feats_cur, ref_idx, feats_ref,
                np.asarray(Tcw_cur_cv), Tcw_ref_cv)
        return cv_w2c_to_nerf_c2w(Tcw_cur_cv), pseudo_ref, pseudo_cur

    def _map_register_from_feats(self, idx_c, feats_c, idx_r, feats_r,
                                 Tcw_c, Tcw_r):
        """Match + triangulate + gate + register a frame pair into the
        persistent map (bootstrap seeding path)."""
        kps_c, desc_c, val_c, ang_c = feats_c
        kps_r, desc_r, val_r, ang_r = feats_r
        idx2, mvalid, _ = match_two_way(desc_c, val_c, desc_r, val_r,
                                        self.nn_thresh)
        if self.check_orientation:
            from .rotation_histogram import \
                filter_matches_with_histogram_orientation
            mvalid = filter_matches_with_histogram_orientation(
                jnp.asarray(ang_r)[idx2], jnp.asarray(ang_c), mvalid,
                min_keep=16, min_frac=0.7)
        kpn_c = self._kpn(kps_c)
        kpn_r_full = self._kpn(kps_r)
        pts3d, ok = triangulate_points(
            jnp.asarray(Tcw_c), jnp.asarray(Tcw_r), kpn_c,
            kpn_r_full[idx2])
        acc, z_c, _, _, _ = point_checks(
            pts3d, jnp.asarray(Tcw_c), jnp.asarray(Tcw_r), kpn_c,
            kpn_r_full[idx2], self.fx, max_reproj_px=3.0)
        accept = np.asarray(acc & mvalid & ok)
        if self.median_gt_depth is not None:
            zc = np.asarray(z_c)
            accept = accept & (zc > 0.25 * self.median_gt_depth) \
                & (zc < 4.0 * self.median_gt_depth)
        kf_r = self._kf_for(idx_r, np.asarray(kpn_r_full), desc_r, val_r,
                            Tcw_r, angles=ang_r)
        kf_c = self._kf_for(idx_c, np.asarray(kpn_c), desc_c, val_c,
                            Tcw_c, angles=ang_c)
        self._map_update(idx_c, kf_c, kf_r, idx2, pts3d, accept, Tcw_c)

    def _note_rejection(self, idx: int, feats_cur) -> None:
        """Count a plausibility-gate rejection toward reference
        staleness. Run-4 forensics: 11 consecutive rejected tracked
        frames (440-495) dead-reckoned against a reference the counter
        never saw go stale, because only outright solve failures
        incremented it. After ref_max_reject consecutive non-accepted
        frames of any kind, re-anchor on the current frame."""
        self._reject_count += 1
        if self._reject_count >= self.ref_max_reject:
            self.prev = {"frame_idx": idx, "feats": feats_cur}
            self._reject_count = 0
            self._ref_fail_count = 0

    def track_continuous(self, frame_reader, idx: int,
                         estimate_c2w_list: np.ndarray,
                         field_ctx=None, gt_baseline=None):
        """Continuous tracked frame: full two-view solve against the
        REFERENCE keyframe — E-matrix RANSAC pose, triangulation,
        motion-model-prior + field-anchored baseline scale, parallax-gated
        pseudo-depth splat, map bookkeeping.

        This is the reference's INTENDED continuous behavior: its design
        note (src/Tracker.py:825-834) specifies 'per tracked frame:
        track-solve the pose and pseudo-depth, then refine in the NeRF',
        but the shipped loop never reassigns f_cur past the bootstrap (the
        author's comment at :888-890 marks the branch unfinished), so it
        NeRF-refines from the bootstrap pose against the bootstrap's
        pseudo-depth forever. We implement the stated design with pyslam's
        reference-keyframe discipline (the reference's own method is
        literally named track_reference_frame, src/Tracker.py:458): the
        reference frame is HELD until triangulation parallax to it is
        adequate, so two-view geometry is always solved at a conditioned
        baseline instead of the degenerate consecutive-tracked-frame one
        (0.9 deg here), and per-pair scale errors anchor to the refined
        reference pose instead of chaining (run-2 forensics, RESULTS.md).
        The returned pose initializes the NeRF tracker and the
        pseudo-depth supervises it.

        Returns (est_c2w_nerf (4,4) | None, pseudo_depth | None).
        """
        if self.prev is None:
            return None, None
        feats_cur = self._feat_cache.pop(idx, None)
        if feats_cur is None:
            _, color_cur, _, _ = frame_reader[idx]
            feats_cur = self._extract(color_cur)
        ref_idx = self.prev["frame_idx"]
        feats_ref = self.prev["feats"]
        # reference pose is re-read from the live trajectory each solve, so
        # it carries the NeRF refinement (and any BA writeback) of that
        # frame — holding the reference does NOT freeze its pose estimate
        Tcw_ref_cv = nerf_c2w_to_cv_w2c(estimate_c2w_list[ref_idx])
        # scale prior = dead-reckoned metric baseline |C_pred - C_ref|:
        # the engine wrote the motion-model predicted pose for idx into
        # estimate_c2w_list[idx] before calling (system._frontend_frame)
        s_prior = max(float(np.linalg.norm(
            estimate_c2w_list[idx][:3, 3]
            - estimate_c2w_list[ref_idx][:3, 3])), 1e-4)
        if self._step_hist:
            # dropout floor (k4_100 forensics): after a solve-failure
            # window the trajectory is frozen at NeRF-refined motion
            # predictions that under-move badly, so the dead-reckoned
            # baseline to a just-re-anchored reference can collapse
            # (measured 0.006 vs true ~0.13). A moving sequence's ref is
            # at least ~one recent tracked-frame step away.
            s_prior = max(s_prior,
                          0.8 * float(np.median(self._step_hist)))
        r = self._two_view(feats_ref, feats_cur, Tcw_ref_cv,
                           set_scale=False, field_ctx=field_ctx,
                           scale_prior=s_prior)
        Tcw_cur_cv, uv_cur, uv_ref = r["Tcw_cur"], r["uv_cur"], r["uv_ref"]
        z_cur, accept = r["z_cur"], r["accept"]
        parallax = float(r["parallax"])
        # effective parallax for every conditioning gate: the measured
        # median-candidate angle bounded by the gap-scaled expectation
        # (see __init__: the measurement reads high garbage exactly in
        # the degenerate regime the gates exist to detect)
        gap = max(idx - ref_idx, 1)
        par_exp = self._par_rate * gap if self._par_rate else None
        par_eff = min(parallax, par_exp) if par_exp else parallax
        self.telemetry.append({
            "idx": idx, "ref_idx": ref_idx, "n_matches": r["n_matches"],
            "n_inliers": r["n_inliers"], "n_cand": r["n_cand"],
            "n_scale_ok": r["n_scale_ok"], "n_field_ok": r["n_field_ok"],
            "n_accept": int(accept.sum()), "scale": r["scale"],
            # the un-blended per-pair field anchor (clamp-only): the
            # scale-bias decomposition needs the raw measurement next to
            # the applied blend (VERDICT r4 #1 instrumentation)
            "scale_raw": r["scale_raw"],
            "s_prior": s_prior, "parallax": parallax,
            "par_eff": par_eff})
        self.last_debug = {"ref_idx": ref_idx, "cur_idx": idx,
                           "kps_ref": uv_ref, "kps_cur": uv_cur,
                           "accept": accept}
        est_c2w = cv_w2c_to_nerf_c2w(Tcw_cur_cv) \
            if r["n_inliers"] >= 8 else None

        if est_c2w is not None and par_eff < self.min_parallax_deg:
            # unconditioned window right after a reference advance: the
            # E-matrix translation DIRECTION and the triangulated scale
            # are both noise below ~1.5 deg (run-2 forensics), while the
            # solved ROTATION stays well-conditioned. Keep the rotation,
            # hold the camera center at the motion-model prediction the
            # engine wrote into the trajectory (closed-loop sim: applying
            # the raw low-parallax solve cost ~40 mm per ref advance).
            est_c2w = np.array(est_c2w, np.float64, copy=True)
            est_c2w[:3, 3] = estimate_c2w_list[idx][:3, 3]
            Tcw_cur_cv = nerf_c2w_to_cv_w2c(est_c2w)
        elif est_c2w is not None and self.map_scale_anchor:
            f, n_sup = self._map_scale_correction(ref_idx, Tcw_ref_cv, r)
            # a correction at the clip bounds means the measurement (not
            # the scale) is broken UNLESS it is corroborated by a big
            # support set (the deadlock-recovery case needs the clipped
            # pull toward sanity) — apply clipped values only then
            if n_sup >= self.map_scale_min_pts and np.isfinite(f):
                f = float(np.clip(f, 0.4, 2.5))
                # graduated trust (round-5 closed-loop forensics): a
                # weakly-supported out-sized correction is how the scale
                # whiplashes — the 500-frame sim applied f=0.65 on 55
                # points at frame 345, the acceptance rate collapsed, and
                # the map rebuilt itself 4x off and then CONFIRMED that
                # scale to the end (f_map ~1.0, err +140 mm/frame). Small
                # corrections are cheap to accept; big ones must be
                # well-measured.
                trusted = (0.75 < f < 1.33) \
                    or (0.45 < f < 2.2 and n_sup >= 60) \
                    or n_sup >= 200
                if trusted:
                    C_ref = estimate_c2w_list[ref_idx][:3, 3]
                    est_c2w = np.array(est_c2w, np.float64, copy=True)
                    est_c2w[:3, 3] = C_ref + f * (est_c2w[:3, 3] - C_ref)
                    Tcw_cur_cv = nerf_c2w_to_cv_w2c(est_c2w)
                    z_cur = np.asarray(z_cur) * f
                    r["scale"] = float(r["scale"]) * f
                    self.telemetry[-1]["f_map"] = f
                    self.telemetry[-1]["n_map_anchor"] = n_sup

        if est_c2w is not None and self.median_gt_depth is not None \
                and self.kp_depth_ratio0 is not None \
                and par_eff >= self.min_parallax_deg \
                and gt_baseline is None:
            # absolute scale-sanity restoring force (round-5; the one
            # anchor that never drifts): the per-view median image depth
            # of a room orbit varies only ±13% (measured round 5), while
            # a scale random walk multiplies ALL triangulated depths
            # together. Keypoints concentrate on structure, so their
            # median sits at a scene-dependent OFFSET from the image
            # median (x0.12 on the toy box scene, ~x1 on the room) —
            # kp_depth_ratio0 calibrates that offset once at bootstrap,
            # against the same extractor and supervision source. A solved
            # keypoint-median > 2x / < 0.5x the calibrated expectation
            # (tightened from 2.5/0.4 after run 4 walked to 1.6x median)
            # is a scale blow-up, not scene geometry — rescale the solve
            # back. Inert in healthy operation (thresholds are many sigma
            # of real variation); in the run-3 failure regime it bounds
            # the walk instead of letting it integrate (ratio 4.5x by
            # frame 250, RESULTS.md).
            zfin = np.asarray(z_cur)
            zfin = zfin[np.asarray(r["cand"]) & (zfin > 1e-3)]
            if len(zfin) >= 30:
                m_med = float(np.median(zfin)) / (
                    self.median_gt_depth * self.kp_depth_ratio0)
                if m_med > 2.0 or m_med < 0.5:
                    f_s = 1.0 / m_med
                    C_ref = estimate_c2w_list[ref_idx][:3, 3]
                    est_c2w = np.array(est_c2w, np.float64, copy=True)
                    est_c2w[:3, 3] = C_ref + f_s * (est_c2w[:3, 3] - C_ref)
                    Tcw_cur_cv = nerf_c2w_to_cv_w2c(est_c2w)
                    z_cur = np.asarray(z_cur) * f_s
                    r["scale"] = float(r["scale"]) * f_s
                    self.telemetry[-1]["f_sanity"] = f_s

        if est_c2w is not None and gt_baseline is not None:
            # oracle-scale injection ABLATION (VERDICT r4 #2): force the
            # solved baseline about the estimated reference to the true
            # metric baseline, keeping direction/rotation/refinement as-is
            # — the residual trajectory error isolates every non-scale
            # drift source. Never a production path; enabled only by
            # tracking.gt_scale_injection in an ablation config.
            C_ref = estimate_c2w_list[ref_idx][:3, 3]
            b = float(np.linalg.norm(est_c2w[:3, 3] - C_ref))
            if b > 1e-9:
                f_gt = float(gt_baseline) / b
                est_c2w = np.array(est_c2w, np.float64, copy=True)
                est_c2w[:3, 3] = C_ref + f_gt * (est_c2w[:3, 3] - C_ref)
                Tcw_cur_cv = nerf_c2w_to_cv_w2c(est_c2w)
                z_cur = np.asarray(z_cur) * f_gt
                r["scale"] = float(r["scale"]) * f_gt
                self.telemetry[-1]["f_gt"] = f_gt

        if est_c2w is None:
            # solve failed outright: keep the reference (the next tracked
            # frame retries with a larger baseline) unless it failed
            # repeatedly — then the reference itself has gone stale
            # (viewpoint drifted past matchability) and we re-anchor on
            # the current frame, whose pose the NeRF tracker refines from
            # the motion model this same step.
            self._ref_fail_count += 1
            if self._ref_fail_count >= self.ref_max_fail:
                self.prev = {"frame_idx": idx, "feats": feats_cur}
                self._ref_fail_count = 0
                self._reject_count = 0
            self._last_tracked_idx = idx
            return None, None
        self._ref_fail_count = 0

        # motion-plausibility gate (hard backstop behind the in-kernel
        # scale clamp): a solved camera-center step far beyond the recent
        # accepted per-tracked-frame steps is a scale/pose blow-up, not
        # motion — reject the frame outright (no pose override, no
        # pseudo-depth). The round-4 oracle run chained ~1.0 m
        # unit-baseline steps for 420 frames with every classical gate
        # green (PERF.md round 4). Measured against the PREVIOUS TRACKED
        # frame (not the held reference, whose distance legitimately
        # grows every frame).
        last_tr = self._last_tracked_idx
        C_last = estimate_c2w_list[last_tr][:3, 3] if last_tr is not None \
            else estimate_c2w_list[ref_idx][:3, 3]
        step_d = float(np.linalg.norm(est_c2w[:3, 3] - C_last))
        self._last_tracked_idx = idx
        if self.median_gt_depth is not None and step_d > \
                self.max_step_depth_frac * self.median_gt_depth:
            # absolute blow-up backstop: the relative 6x-median gate below
            # is blind once its own history is corrupted (closed-loop sim:
            # uniform ~0.6 m dead-reckoned steps chained unchallenged)
            self.telemetry.append({
                "idx": idx, "rejected_step_abs": step_d,
                "scale": r["scale"]})
            self._note_rejection(idx, feats_cur)
            return None, None
        if len(self._step_hist) >= 3:
            med = float(np.median(self._step_hist))
            if step_d > max(6.0 * med, 1e-3):
                self.telemetry.append({
                    "idx": idx, "rejected_step": step_d,
                    "step_median": med, "scale": r["scale"]})
                self._note_rejection(idx, feats_cur)
                return None, None
        self._step_hist.append(step_d)
        if len(self._step_hist) > 10:
            self._step_hist.pop(0)
        self.telemetry[-1]["step_d"] = step_d
        self.depth_scale = float(r["scale"])  # diagnostic/ckpt trail
        self._reject_count = 0
        # update the parallax-rate expectation from conditioned solves
        # only (run-4 telemetry: measurements at gap >= 10 are sane,
        # 1.2-3.5 deg; the < 10 deg guard drops residual junk readings)
        if gap >= self.par_rate_min_gap and 0.0 < parallax < 10.0:
            rate = parallax / gap
            self._par_rate = rate if not self._par_rate \
                else 0.7 * self._par_rate + 0.3 * rate

        # pseudo-depth (and map registration) only from well-conditioned
        # geometry: below ~1.5 deg median parallax the triangulated depths
        # are noise shaped by the acceptance gates (run-2 forensics:
        # per-frame pseudo medians 0.6-2.4 m against a 2.8 m scene), and
        # training the field on them poisons the scale anchor for every
        # later frame. The mapper masks depth<=0, so a gated frame simply
        # contributes color-only supervision (reference Mapper.py:628-655
        # semantics).
        emit = par_eff >= self.min_parallax_deg
        pseudo = None
        if emit:
            if self.map is not None:
                kf_ref = self._kf_for(ref_idx, np.asarray(self._kpn(
                    feats_ref[0])), feats_ref[1], feats_ref[2], Tcw_ref_cv,
                    angles=feats_ref[3])
                kf_cur = self._kf_for(idx, np.asarray(self._kpn(
                    feats_cur[0])), feats_cur[1], feats_cur[2], Tcw_cur_cv,
                    angles=feats_cur[3])
                # world points for the map: reproject accepted uv/z
                # through the scaled current pose
                Twc = _inv_rigid_np(Tcw_cur_cv)
                xn = (uv_cur - [self.cx, self.cy]) / [self.fx, self.fy]
                cam_pts = np.concatenate(
                    [xn * z_cur[:, None], z_cur[:, None]], 1)
                pts3d_w = cam_pts @ Twc[:3, :3].T + Twc[:3, 3]
                uv_m, z_m, acc_m = self._map_update(
                    idx, kf_cur, kf_ref, r["idx2"], pts3d_w, accept,
                    np.asarray(Tcw_cur_cv))
                uv_all = np.concatenate([uv_cur, uv_m], axis=0)
                z_all = np.concatenate([z_cur, z_m], axis=0)
                acc_all = np.concatenate([accept, acc_m], axis=0)
            else:
                uv_all, z_all, acc_all = uv_cur, z_cur, accept
            if int(acc_all.sum()) >= 8:
                pseudo = self._splat(uv_all, z_all, acc_all)

        # reference-keyframe advancement: re-anchor on the current frame
        # once its parallax to the reference is comfortably past the
        # emission gate (the structure handed to the map above is then
        # well-conditioned), or when matching against the reference is
        # decaying (advance BEFORE it breaks, while a reliable relative
        # pose still exists).
        if (par_eff >= self.ref_advance_parallax_deg
                and int(accept.sum()) >= 16) \
                or r["n_matches"] < self.ref_min_matches \
                or r["n_inliers"] < self.ref_min_inliers:
            self.prev = {"frame_idx": idx, "feats": feats_cur}
        return est_c2w, pseudo

    # -- checkpoint persistence ---------------------------------------------
    def state_arrays(self) -> dict:
        """Full front-end state as flat numpy arrays for the checkpoint.

        Round-3-run forensics (RESULTS.md round 5): resume restored only
        the scalar scale anchors; the persistent MAP — the metric-scale
        memory the per-solve anchor pins against — silently restarted
        empty, and the first post-resume solves rebuilt it at whatever
        scale they happened to carry (measured: scale excursions to 7x
        within 10 tracked frames of the frame-100 resume). Persist the
        map + reference-keyframe features so a resumed run continues in
        the SAME metric frame."""
        import json
        out = {}
        if self.prev is not None:
            kps, desc, val, ang = self.prev["feats"]
            out["fe2_prev_idx"] = np.int64(self.prev["frame_idx"])
            out["fe2_prev_kps"] = np.asarray(kps, np.float32)
            out["fe2_prev_desc"] = np.asarray(desc, np.float32)
            out["fe2_prev_valid"] = np.asarray(val)
            if ang is not None:
                out["fe2_prev_ang"] = np.asarray(ang, np.float32)
        if self._kf_order:
            kfs = [self._kfs[i] for i in self._kf_order]
            out["fe2_kf_idx"] = np.asarray(
                [kf.frame_idx for kf in kfs], np.int64)
            out["fe2_kf_kps"] = np.stack(
                [kf.kps for kf in kfs]).astype(np.float32)
            out["fe2_kf_desc"] = np.stack(
                [kf.desc for kf in kfs]).astype(np.float32)
            out["fe2_kf_valid"] = np.stack([kf.valid for kf in kfs])
            out["fe2_kf_Tcw"] = np.stack(
                [kf.Tcw for kf in kfs]).astype(np.float64)
            if all(kf.angles is not None for kf in kfs):
                out["fe2_kf_ang"] = np.stack(
                    [kf.angles for kf in kfs]).astype(np.float32)
        if self.map is not None and self.map.points:
            alive = [mp for mp in self.map.points if not mp.is_bad]
            if alive:
                kfid2fidx = {self._kfs[i].id: i for i in self._kf_order}
                out["fe2_mp_pt"] = np.stack(
                    [mp.pt for mp in alive]).astype(np.float64)
                d0 = next((mp.des for mp in alive if mp.des is not None),
                          None)
                if d0 is not None:
                    des = np.zeros((len(alive), len(d0)), np.float32)
                    hasd = np.zeros((len(alive),), bool)
                    for i, mp in enumerate(alive):
                        if mp.des is not None:
                            des[i] = mp.des
                            hasd[i] = True
                    out["fe2_mp_des"] = des
                    out["fe2_mp_hasdes"] = hasd
                obs = [(i, kfid2fidx[kid], kp)
                       for i, mp in enumerate(alive)
                       for kid, kp in mp.observations.items()
                       if kid in kfid2fidx]
                out["fe2_obs"] = np.asarray(obs, np.int64).reshape(-1, 3)
        out["fe2_ref_fail"] = np.int64(self._ref_fail_count)
        out["fe2_reject_count"] = np.int64(self._reject_count)
        out["fe2_par_rate"] = np.float64(self._par_rate or 0.0)
        out["fe2_kp_depth_ratio0"] = np.float64(self.kp_depth_ratio0 or 0)
        if self.dyn is not None:
            out["fe2_dyn_thresh"] = np.float64(
                self.dyn.max_descriptor_distance)
        out["fe2_telemetry"] = np.str_(json.dumps(self.telemetry))
        return out

    def load_state_arrays(self, z) -> bool:
        """Restore the state saved by state_arrays (inverse). Returns True
        when a persisted map/reference was found (legacy checkpoints lack
        the fe2_ fields; the caller falls back to the round-4 reseed)."""
        import json
        if "fe2_prev_idx" not in z:
            return False
        ang = np.asarray(z["fe2_prev_ang"]) if "fe2_prev_ang" in z else None
        self.prev = {
            "frame_idx": int(z["fe2_prev_idx"]),
            "feats": (np.asarray(z["fe2_prev_kps"]),
                      np.asarray(z["fe2_prev_desc"]),
                      np.asarray(z["fe2_prev_valid"]), ang)}
        self._kfs, self._kf_order = {}, []
        if self.map is not None:
            self.map.points = []
        if "fe2_kf_idx" in z and self.map is not None:
            kf_idx = np.asarray(z["fe2_kf_idx"]).tolist()
            angs = z["fe2_kf_ang"] if "fe2_kf_ang" in z else None
            for s, fidx in enumerate(kf_idx):
                kf = KeyFrame(int(fidx), np.asarray(z["fe2_kf_kps"][s]),
                              np.asarray(z["fe2_kf_desc"][s]),
                              np.asarray(z["fe2_kf_valid"][s]),
                              np.asarray(z["fe2_kf_Tcw"][s]),
                              angles=None if angs is None
                              else np.asarray(angs[s]))
                self._kfs[int(fidx)] = kf
                self._kf_order.append(int(fidx))
                self.map.add_keyframe(kf)
            if "fe2_mp_pt" in z:
                pts = np.asarray(z["fe2_mp_pt"])
                des = z["fe2_mp_des"] if "fe2_mp_des" in z else None
                hasd = z["fe2_mp_hasdes"] if "fe2_mp_hasdes" in z else None
                mps = [MapPoint(pts[i]) for i in range(len(pts))]
                for row, fidx, kp in np.asarray(
                        z.get("fe2_obs", np.zeros((0, 3), np.int64))):
                    kf = self._kfs.get(int(fidx))
                    if kf is not None:
                        mps[int(row)].add_observation(kf, int(kp))
                for i, mp in enumerate(mps):
                    if des is not None and hasd is not None and hasd[i]:
                        mp.des = np.asarray(des[i])
                self.map.points = [mp for mp in mps
                                   if mp.num_observations >= 1]
                for fidx in self._kf_order:
                    self.map.graph.update_connections(self._kfs[fidx])
        self._ref_fail_count = int(z.get("fe2_ref_fail", 0))
        self._reject_count = int(z.get("fe2_reject_count", 0))
        pr = float(z.get("fe2_par_rate", 0.0))
        self._par_rate = pr if pr > 0 else None
        kpr = float(z.get("fe2_kp_depth_ratio0", 0.0))
        self.kp_depth_ratio0 = kpr if kpr > 0 else None
        if self.dyn is not None and "fe2_dyn_thresh" in z:
            self.dyn.max_descriptor_distance = float(z["fe2_dyn_thresh"])
        if "fe2_telemetry" in z:
            try:
                self.telemetry = json.loads(str(z["fe2_telemetry"]))
            except Exception:
                pass
        return True

    def pseudo_depth_for(self, frame_reader, idx: int,
                         estimate_c2w_list: np.ndarray,
                         cur_c2w_pred: np.ndarray,
                         field_depth_fn=None):
        """Continuous mode: triangulate the current frame against the
        previous tracked frame using KNOWN pose estimates (the refined
        previous pose + the motion-model prediction for the current frame).

        Essential-matrix estimation is NOT used here: at SLAM inter-frame
        baselines E's translation direction is degenerate (rotation-dominant
        flow), whereas pose estimates from the NeRF tracker are already
    accurate — triangulating with them is strictly better-conditioned.
        The bootstrap (no prior poses, larger baseline) keeps E (PARITY.md
        #2/#12). Returns pseudo_depth or None.

        field_depth_fn: optional callback (uv_px (N, 2) -> rendered field
        depth (N,)) used as a RECOVERY gate: the scene-scale z gate
        (PARITY #20) rejects everything at tiny baselines, starving the
        mapper of per-frame depth supervision (the reference intends
        pseudo-depth for every tracked frame, src/Tracker.py:571-610);
        a triangulation that agrees with the current neural field's
        rendered depth at its pixel is scene-consistent even when the
        scale gate cannot vouch for it, so it is accepted too."""
        if self.prev is None:
            return None
        feats_cur = self._feat_cache.pop(idx, None)
        if feats_cur is None:
            _, color_cur, _, _ = frame_reader[idx]
            feats_cur = self._extract(color_cur)
        ref_idx = self.prev["frame_idx"]
        kps_r, desc_r, val_r, ang_r = self.prev["feats"]
        kpn_ref_full = self._kpn(kps_r)
        if self.map is not None:
            # prefer an OLDER cached frame as the triangulation partner:
            # at SLAM inter-frame baselines the tracker's pose noise is
            # comparable to the baseline, and DLT conditioning improves
            # linearly with baseline length (pyslam triangulates against
            # covisible KEYFRAMES for the same reason)
            older = [i for i in self._kf_order if idx - i >= 8]
            if older:
                kf = self._kfs[older[-1]]
                ref_idx = kf.frame_idx
                kpn_ref_full = jnp.asarray(kf.kps, jnp.float32)
                desc_r, val_r = (jnp.asarray(kf.desc),
                                 jnp.asarray(kf.valid))
                ang_r = jnp.asarray(kf.angles) \
                    if kf.angles is not None else None
        Tcw_ref_cv = nerf_c2w_to_cv_w2c(estimate_c2w_list[ref_idx])
        Tcw_cur_cv = nerf_c2w_to_cv_w2c(cur_c2w_pred)

        kps_c, desc_c, val_c, ang_c = feats_cur
        idx2, mvalid, _ = match_two_way(desc_c, val_c, desc_r, val_r,
                                        self.nn_thresh)
        if self.check_orientation and ang_r is not None:
            from .rotation_histogram import \
                filter_matches_with_histogram_orientation
            mvalid = filter_matches_with_histogram_orientation(
                jnp.asarray(ang_r)[idx2], jnp.asarray(ang_c), mvalid,
                min_keep=16, min_frac=0.7)
        kpn_cur = self._kpn(kps_c)
        kpn_ref = kpn_ref_full[idx2]

        pts3d, ok = triangulate_points(
            jnp.asarray(Tcw_cur_cv), jnp.asarray(Tcw_ref_cv), kpn_cur,
            kpn_ref)
        # adaptive reprojection gate: the current pose estimate carries the
        # tracker's residual error, so a fixed tight gate can starve the
        # pseudo-depth; widen until enough points survive
        accept = None
        for gate in (3.0, 6.0, 10.0):
            acc, z_cur, z_ref, uvn_cur, uvn_ref = point_checks(
                pts3d, jnp.asarray(Tcw_cur_cv), jnp.asarray(Tcw_ref_cv),
                kpn_cur, kpn_ref, self.fx, max_reproj_px=gate)
            accept = np.asarray(acc & mvalid & ok)
            if accept.sum() >= 16:
                break
        # scene-scale sanity: at SLAM baselines the pose noise can be
        # comparable to the baseline itself, and DLT then fabricates
        # "points" floating right next to the cameras (large parallax,
        # tiny reprojection error — every classical gate passes). The
        # bootstrap anchored the metric scale, so depths far outside the
        # scene's depth range are geometrically impossible, not data.
        uv_cur = np.asarray(uvn_cur) * [self.fx, self.fy] + [self.cx, self.cy]
        n_cand = int(np.asarray(accept).sum())
        n_scale = n_field = -1
        if self.median_gt_depth is not None:
            zc = np.asarray(z_cur)
            scale_ok = (zc > 0.25 * self.median_gt_depth) \
                & (zc < 4.0 * self.median_gt_depth)
            if field_depth_fn is not None:
                # field-consistency recovery gate: render the CURRENT
                # field's depth at each candidate pixel; a triangulation
                # within 15% of it is consistent with the map the mapper
                # already believes — safe supervision even where the
                # conservative scale window cannot confirm it. Because the
                # field check is itself a strong filter, it draws from a
                # WIDER reprojection-gate candidate pool than the classical
                # path (pose drift between the pair inflates reprojection
                # error even for correct structure).
                acc_w, _, _, _, _ = point_checks(
                    pts3d, jnp.asarray(Tcw_cur_cv), jnp.asarray(Tcw_ref_cv),
                    kpn_cur, kpn_ref, self.fx, max_reproj_px=25.0)
                cand_wide = np.asarray(acc_w & mvalid & ok)
                zf = np.asarray(field_depth_fn(uv_cur))
                field_ok = (zf > 1e-3) & (zc > 1e-3) \
                    & (np.abs(zc - zf)
                       <= np.maximum(0.15 * zf,
                                     0.02 * self.median_gt_depth))
                n_field = int((cand_wide & field_ok).sum())
                accept = (accept & scale_ok) | (cand_wide & field_ok)
            else:
                accept = accept & scale_ok
            n_scale = int((np.asarray(accept) & scale_ok).sum())
        self.telemetry.append({
            "idx": idx, "n_matches": int(np.asarray(mvalid).sum()),
            "n_inliers": -1, "n_cand": n_cand, "n_scale_ok": n_scale,
            "n_field_ok": n_field, "n_accept": int(accept.sum()),
            "scale": float(self.depth_scale or 1.0)})
        uv_ref_px = np.asarray(uvn_ref) * [self.fx, self.fy] \
            + [self.cx, self.cy]
        self.last_debug = {"ref_idx": ref_idx, "cur_idx": idx,
                           "kps_ref": uv_ref_px, "kps_cur": np.array(uv_cur),
                           "accept": np.array(accept)}
        self.prev = {"frame_idx": idx, "feats": feats_cur}
        z_cur = np.asarray(z_cur)
        if self.map is not None:
            # the map hook runs BEFORE the sparsity early-exit: even a pair
            # too thin to splat still contributes observations, and
            # confirmed map projections can carry the frame by themselves
            kf_ref = self._kf_for(ref_idx, np.asarray(kpn_ref_full),
                                  desc_r, val_r, Tcw_ref_cv, angles=ang_r)
            kf_cur = self._kf_for(idx, np.asarray(kpn_cur), desc_c, val_c,
                                  Tcw_cur_cv, angles=ang_c)
            uv_m, z_m, acc_m = self._map_update(
                idx, kf_cur, kf_ref, idx2, pts3d, accept, Tcw_cur_cv)
            uv_cur = np.concatenate([uv_cur, uv_m], axis=0)
            z_cur = np.concatenate([z_cur, z_m], axis=0)
            accept = np.concatenate([accept, acc_m], axis=0)
        if int(np.asarray(accept).sum()) < 8:
            return None
        return self._splat(uv_cur, z_cur, accept)
