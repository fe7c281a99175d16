"""Single-dispatch two-view front-end step.

The sparse front-end's per-tracked-frame work (descriptor matching,
E-matrix RANSAC, triangulation, acceptance checks, baseline-scale
resolution, field-consistency gating, LM pose refinement) is a chain of
small batched ops. Issued one-by-one from the host they cost ~30-50 device
round trips per frame; over the axon tunnel (~34 ms/dispatch) that made
the front-end the weak-pipeline wall-clock bottleneck (~20 s/frame,
round-3 PERF).

This module compiles the WHOLE chain into one jitted graph per
(bootstrap | continuous | continuous+field) variant, returning two packed
arrays -> 2 host transfers per tracked frame. The host keeps only the
persistent-map bookkeeping (numpy, no device work).

Semantics parity: exact composition of frontend.SparseFrontend._two_view,
_field_scale_fn and _quality_gates (reference behaviors:
src/Tracker.py:398-520 two-view, src/map.py:191-287 gates; the field gate
is our PARITY #20-21 recovery design). The neural-field depth used by the
scale anchor and the consistency gate is rendered ONCE at the triangulated
reprojection pixels (the host-callback version rendered the same pixels
twice).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.rays import rays_from_uv
from ..core.se3 import camera_from_tensor, tensor_from_camera, \
    to_homogeneous
from .ba import pose_optimization
from .epipolar import estimate_relative_pose_ransac
from .matching import match_two_way
from .rotation_histogram import filter_matches_with_histogram_orientation
from .triangulate import point_checks, triangulate_points


def _masked_median(x, m):
    """Median of x[m] (0 if empty), sort-based, static shape."""
    big = jnp.float32(3e38)
    xs = jnp.sort(jnp.where(m, x, big))
    n = jnp.sum(m)
    idx = jnp.clip((n - 1) // 2, 0, x.shape[0] - 1)
    return jnp.where(n > 0, jnp.take(xs, idx), 0.0)


def make_two_view_step(H, W, fx, fy, cx, cy, nn_thresh, ransac_thresh,
                       mode: str, model_cfg=None, rcfg=None,
                       bundle_loss: bool = True,
                       check_orientation: bool = True):
    """Build the fused two-view device step.

    mode: 'bootstrap'   — scale from median_gt_depth / median z.
          'continuous'  — scale carried in (depth_scale); scale-window gate.
          'field'       — continuous + field-anchored scale + consistency
                          gate (renders the current neural field's depth at
                          the reprojection pixels; model_cfg/rcfg required).

    Returns step(kps_r, desc_r, val_r, ang_r, kps_c, desc_c, val_c, ang_c,
                 Tcw_ref, key, median_gt_depth, depth_scale, nn_thresh_rt,
                 params, c_grid, c2w_pred, bound)
      -> (out_kp (K, 12), out_small (28,)) where
      out_kp columns: [u_cur, v_cur, u_ref, v_ref, z_cur, z_ref, accept,
                       field_ok, px, py, pz, idx2]  (z scaled, p in world)
      out_small: [Tcw_cur.flat (16), n_matches, n_inliers, n_cand,
                  n_scale_ok, n_field_ok, n_accept, scale, scale_raw,
                  score_med, score_mad, parallax_med_deg, pad]
    params/c_grid/c2w_pred/bound are consumed only in 'field' mode (pass
    zeros-likes otherwise; the traced graph drops them).
    """
    assert mode in ("bootstrap", "continuous", "field"), mode
    if mode == "field":
        assert model_cfg is not None and rcfg is not None

    def step(kps_r, desc_r, val_r, ang_r, kps_c, desc_c, val_c, ang_c,
             Tcw_ref, key, median_gt_depth, depth_scale, nn_thresh_rt,
             params, c_grid, c2w_pred, bound):
        K = kps_c.shape[0]
        f = jnp.array([fx, fy], jnp.float32)
        c = jnp.array([cx, cy], jnp.float32)

        # nn_thresh_rt: the ADAPTIVE descriptor gate (slam_dynamic_config
        # capability) — a traced scalar so the EWMA update on the host
        # does not retrace; the constructor nn_thresh is its initial value
        idx2, mvalid, scores = match_two_way(desc_c, val_c, desc_r, val_r,
                                             nn_thresh_rt)
        if check_orientation:
            # orientation-consistency gate (rotation_histogram capability —
            # live here because our extractors provide orientations; the
            # reference's gate is dead behind Frame.oriented_features)
            mvalid = filter_matches_with_histogram_orientation(
                ang_r[idx2], ang_c, mvalid, min_keep=16, min_frac=0.7)
        # robust match-score stats for the host EWMA (median + MAD of the
        # accepted scores; src/utils/utils_features.py:137-160 capability)
        s_med = _masked_median(scores, mvalid)
        s_mad = 1.4826 * _masked_median(jnp.abs(scores - s_med), mvalid)
        kpn_cur = (kps_c - c) / f
        kpn_ref = ((kps_r - c) / f)[idx2]

        Trc, inliers, n_inl = estimate_relative_pose_ransac(
            kpn_ref, kpn_cur, mvalid, key, thresh=ransac_thresh)
        R = Trc[:3, :3]
        t = Trc[:3, 3]
        Tcr = jnp.eye(4).at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ t)
        Tcw_cur = Tcr @ Tcw_ref              # unit baseline (Tracker.py:478)

        pts3d, ok = triangulate_points(Tcw_cur, Tcw_ref, kpn_cur, kpn_ref)
        accept, z_cur, z_ref, uvn_cur, uvn_ref = point_checks(
            pts3d, Tcw_cur, Tcw_ref, kpn_cur, kpn_ref, fx)
        accept = accept & inliers & ok
        # pre-scale-gate candidate mask (cheirality + reproj + inlier
        # only): the host scale-sanity force needs a z population that is
        # real geometry but NOT shaped by the scale window — the window is
        # exactly what collapses in a scale blow-up (round-5 forensics:
        # unmasked padded slots made the sanity median garbage, x38
        # corrections on the toy scene)
        cand_mask = accept
        n_cand = jnp.sum(accept)

        # median triangulation parallax over the candidate set (deg).
        # Scale-invariant (a similarity about C_ref preserves ray angles),
        # so computed on the unit-baseline structure. This is the
        # conditioning signal for the reference-keyframe policy: two-view
        # depth error ~ px_noise / (f * parallax), measured 0 accepted
        # triangulations at the 0.9-deg consecutive-tracked-frame
        # baseline vs 0.6-1.5% median z error at 2-8 deg.
        C_ref_u = -Tcw_ref[:3, :3].T @ Tcw_ref[:3, 3]
        C_cur_u = -Tcw_cur[:3, :3].T @ Tcw_cur[:3, 3]
        v1 = pts3d - C_ref_u[None]
        v2 = pts3d - C_cur_u[None]
        cosp = jnp.sum(v1 * v2, -1) / jnp.maximum(
            jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1),
            1e-12)
        par_deg = jnp.degrees(jnp.arccos(jnp.clip(cosp, -1.0, 1.0)))
        par_med = _masked_median(par_deg, accept)

        uv_cur = uvn_cur * f + c
        uv_ref = uvn_ref * f + c

        # ---- baseline scale -------------------------------------------------
        zf = jnp.zeros((K,), jnp.float32)
        if mode == "field":
            # ONE sparse render of the current field at the reprojection
            # pixels under the motion-model predicted pose (the host
            # callback design rendered these twice: scale + gate)
            rays_o, rays_d = rays_from_uv(uv_cur[:, 0], uv_cur[:, 1],
                                          c2w_pred, fx, fy, cx, cy)
            from ..render.renderer import render_rays
            kf_, kr_ = jax.random.split(key)
            zf, _, _, _ = render_rays(params, model_cfg, rcfg, rays_o,
                                      rays_d, bound, kr_, None,
                                      c_grid or None)
        s_raw = None
        if mode == "bootstrap":
            med = _masked_median(z_cur, accept)
            s = median_gt_depth / jnp.maximum(med, 1e-9)
        elif mode == "field":
            okf = accept & (zf > 1e-3) & (z_cur > 1e-6)
            s_field = _masked_median(zf, okf) \
                / jnp.maximum(_masked_median(z_cur, okf), 1e-9)
            use = (jnp.sum(okf) >= 4) & jnp.isfinite(s_field) \
                & (s_field > 0)
            # scale-continuity clamp (round-4 oracle failure): the per-pair
            # baseline varies smoothly at SLAM frame rates, so the field
            # anchor may only move the carried scale by a bounded factor.
            # Unclamped, a degraded field render (few/garbage zf) walked
            # the scale from ~0.04 to ~1.0 — chaining the E-matrix's
            # unit-norm translation at ~23x true camera speed (PERF.md
            # round 4: ATE 15.1 m). depth_scale carries the EWMA of
            # recently accepted scales (frontend._two_view).
            s_field = jnp.clip(s_field, 0.25 * depth_scale,
                               4.0 * depth_scale)
            # ... and the APPLIED scale blends the (noisy) per-pair field
            # anchor with the carried EWMA: run-1 forensics measured raw
            # per-pair anchors at 0.6-2.3x the true baseline (novel-view
            # field depth is cm-dm accurate), and each step's scale error
            # walks the trajectory by err*baseline. The blend trades that
            # noise for a small lag on genuine baseline changes, which the
            # near-constant SLAM frame cadence tolerates.
            s_raw = jnp.where(use, s_field, depth_scale)
            s = jnp.where(use, 0.4 * s_field + 0.6 * depth_scale,
                          depth_scale)
        else:
            s = depth_scale

        # scale baseline + structure about the ref camera center
        C_ref = -Tcw_ref[:3, :3].T @ Tcw_ref[:3, 3]
        C_cur = -Tcw_cur[:3, :3].T @ Tcw_cur[:3, 3]
        C_cur_s = C_ref + s * (C_cur - C_ref)
        Tcw_cur = Tcw_cur.at[:3, 3].set(-Tcw_cur[:3, :3] @ C_cur_s)
        pts_s = C_ref + s * (pts3d - C_ref)
        z_cur_s = s * z_cur
        z_ref_s = s * z_ref

        if bundle_loss:
            # motion-only LM against the scaled structure (frontend
            # bundle_loss; applied only when it keeps >= 8 inliers)
            cam0 = tensor_from_camera(Tcw_cur)
            cam, _, n_in = pose_optimization(
                cam0, pts_s, kpn_cur, accept, sigma2=(1.0 / fx) ** 2)
            T_lm = to_homogeneous(camera_from_tensor(cam))
            Tcw_cur = jnp.where(n_in >= 8, T_lm, Tcw_cur)

        # ---- quality gates --------------------------------------------------
        n_scale_ok = n_field_ok = jnp.int32(-1)
        field_ok = jnp.zeros((K,), bool)
        if mode != "bootstrap":
            scale_ok = (z_cur_s > 0.25 * median_gt_depth) \
                & (z_cur_s < 4.0 * median_gt_depth)
            if mode == "field":
                field_ok = (zf > 1e-3) & (z_cur_s > 1e-3) \
                    & (jnp.abs(z_cur_s - zf)
                       <= jnp.maximum(0.15 * zf, 0.02 * median_gt_depth))
                n_field_ok = jnp.sum(accept & field_ok)
                accept = accept & (scale_ok | field_ok)
            else:
                accept = accept & scale_ok
            n_scale_ok = jnp.sum(accept & scale_ok)

        out_kp = jnp.concatenate([
            uv_cur, uv_ref, z_cur_s[:, None], z_ref_s[:, None],
            accept[:, None].astype(jnp.float32),
            field_ok[:, None].astype(jnp.float32), pts_s,
            idx2[:, None].astype(jnp.float32),
            cand_mask[:, None].astype(jnp.float32)], axis=1)
        out_small = jnp.concatenate([
            Tcw_cur.reshape(-1),
            jnp.stack([jnp.sum(mvalid), n_inl, n_cand, n_scale_ok,
                       n_field_ok, jnp.sum(accept)]).astype(jnp.float32),
            jnp.stack([s, s if s_raw is None else s_raw]),
            jnp.stack([s_med, s_mad]),
            jnp.stack([par_med, jnp.float32(0.0)])])
        return out_kp, out_small

    return jax.jit(step)


class TwoViewRunner:
    """Host-side cache of the compiled variants + result unpacking."""

    def __init__(self, H, W, fx, fy, cx, cy, nn_thresh, ransac_thresh,
                 model_cfg=None, rcfg=None, bundle_loss=True,
                 check_orientation=True):
        self._mk = lambda mode: make_two_view_step(
            H, W, fx, fy, cx, cy, nn_thresh, ransac_thresh, mode,
            model_cfg=model_cfg, rcfg=rcfg, bundle_loss=bundle_loss,
            check_orientation=check_orientation)
        self._nn_default = float(nn_thresh)
        self._steps = {}

    def run(self, mode, feats_ref, feats_cur, Tcw_ref, key,
            median_gt_depth, depth_scale, nn_thresh=None, params=None,
            c_grid=None, c2w_pred=None, bound=None):
        import os
        import time
        import numpy as np
        dbg = os.environ.get("_TV_DEBUG")
        t0 = time.time()
        if mode not in self._steps:
            self._steps[mode] = self._mk(mode)
        kps_r, desc_r, val_r, ang_r = feats_ref
        kps_c, desc_c, val_c, ang_c = feats_cur
        out_kp, out_small = self._steps[mode](
            kps_r, desc_r, val_r, ang_r, kps_c, desc_c, val_c, ang_c,
            jnp.asarray(Tcw_ref, jnp.float32), key,
            jnp.float32(median_gt_depth or 1.0),
            jnp.float32(depth_scale or 1.0),
            jnp.float32(self._nn_default if nn_thresh is None
                        else nn_thresh),
            params if params is not None else {},
            c_grid or {},
            jnp.asarray(c2w_pred, jnp.float32)
            if c2w_pred is not None else jnp.eye(4),
            bound if bound is not None else jnp.zeros((3, 2)))
        t1 = time.time()
        kp = np.asarray(out_kp)
        small = np.asarray(out_small)
        if dbg:
            print(f"[tv] {mode}: dispatch {t1 - t0:.2f}s "
                  f"sync {time.time() - t1:.2f}s")
        return {
            "Tcw_cur": small[:16].reshape(4, 4).astype(np.float64),
            "uv_cur": kp[:, 0:2], "uv_ref": kp[:, 2:4],
            "z_cur": kp[:, 4], "z_ref": kp[:, 5],
            "accept": kp[:, 6] > 0.5, "field_ok": kp[:, 7] > 0.5,
            "pts3d": kp[:, 8:11].astype(np.float64),
            "idx2": kp[:, 11].astype(np.int64),
            # pre-scale-gate candidates (cheirality+reproj+inlier): the
            # scale-sanity force's measurement population
            "cand": kp[:, 12] > 0.5,
            "n_matches": int(small[16]), "n_inliers": int(small[17]),
            "n_cand": int(small[18]), "n_scale_ok": int(small[19]),
            "n_field_ok": int(small[20]), "n_accept": int(small[21]),
            "scale": float(small[22]),
            # the un-blended (clamp-only) per-pair field anchor: the host
            # EWMA consumes this, not the applied blend, to avoid double
            # smoothing
            "scale_raw": float(small[23]),
            "score_med": float(small[24]), "score_mad": float(small[25]),
            # median triangulation parallax (deg) over the candidate set:
            # the conditioning signal for the reference-keyframe policy
            "parallax": float(small[26]),
        }
