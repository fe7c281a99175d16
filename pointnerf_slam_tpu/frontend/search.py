"""Projection-guided matching (capability of src/search_points.py).

Batched functional equivalents of the pyslam search utilities:
  - search_frame_by_projection (:88-198): project map points into a frame,
    match each to the best nearby keypoint by descriptor distance within a
    pixel radius.
  - search_map_by_projection (:203-293): same against a larger point set
    with view-angle/distance gates.
  - propagate_map_point_matches (:42-84): carry ref-frame point
    associations through existing keypoint matches.
  - search_frame_for_triangulation (:311-414): epipolar-constrained
    descriptor matching between two keyframes.

The reference walks scipy cKDTrees point-by-point; at <= 3000 keypoints the
dense (P, K) distance matrices are tiny for the TPU/VPU, so everything is a
masked argmin (SURVEY §2.3 kNN row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _desc_dist(d1, d2):
    sim = jnp.clip(d1 @ d2.T, -1.0, 1.0)
    return jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0))


@jax.jit
def search_frame_by_projection(pts3d, pt_desc, pt_valid, Tcw, kps, kp_desc,
                               kp_valid, fx, fy, cx, cy,
                               radius_px: float = 10.0,
                               max_desc_dist: float = 0.7):
    """Match projected map points to frame keypoints.

    Args:
      pts3d: (P, 3) world points; pt_desc (P, D); pt_valid (P,).
      Tcw: (4, 4) w2c (CV convention).
      kps: (K, 2) pixel keypoints; kp_desc (K, D); kp_valid (K,).
    Returns:
      kp_idx (P,) best keypoint per point, match_valid (P,).
    """
    pc = pts3d @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = pc[:, 0] / zs * fx + cx
    v = pc[:, 1] / zs * fy + cy
    proj = jnp.stack([u, v], -1)                     # (P, 2)

    d_px = jnp.linalg.norm(proj[:, None, :] - kps[None], axis=-1)  # (P, K)
    in_radius = d_px < radius_px
    dd = _desc_dist(pt_desc, kp_desc)                # (P, K)
    big = jnp.float32(1e6)
    cost = jnp.where(in_radius & kp_valid[None, :], dd, big)
    kp_idx = jnp.argmin(cost, axis=1)
    best = jnp.take_along_axis(cost, kp_idx[:, None], axis=1)[:, 0]
    match_valid = pt_valid & (z > 0) & (best < max_desc_dist)
    return kp_idx, match_valid


@jax.jit
def search_map_by_projection(pts3d, pt_desc, pt_valid, pt_normal,
                             pt_max_dist, Tcw, kps, kp_desc, kp_valid,
                             fx, fy, cx, cy, radius_px: float = 10.0,
                             max_desc_dist: float = 0.7,
                             view_cos_min: float = 0.5):
    """search_frame_by_projection + viewing-angle and distance gates
    (src/search_points.py:203-293)."""
    C = -Tcw[:3, :3].T @ Tcw[:3, 3]
    view = pts3d - C
    dist = jnp.linalg.norm(view, axis=-1)
    view_dir = view / jnp.maximum(dist[:, None], 1e-9)
    cos_view = jnp.sum(view_dir * pt_normal, -1)
    gate = pt_valid & (cos_view > view_cos_min) & (dist < pt_max_dist)
    kp_idx, ok = search_frame_by_projection(
        pts3d, pt_desc, gate, Tcw, kps, kp_desc, kp_valid, fx, fy, cx, cy,
        radius_px, max_desc_dist)
    return kp_idx, ok & gate


@jax.jit
def propagate_map_point_matches(ref_has_point, idx_ref, idx_cur,
                                match_valid):
    """Carry ref-frame point slots through matches
    (src/search_points.py:42-84): for each match (ref kp i -> cur kp j),
    the cur keypoint inherits ref's map-point slot when one exists.

    Returns (cur_kp_point_src (K_cur,), valid (K_cur,)) where point_src is
    the ref keypoint index whose map point propagates, -1 otherwise."""
    ok = match_valid & ref_has_point[idx_ref]
    return jnp.where(ok, idx_ref, -1), ok


@jax.jit
def search_frame_for_triangulation(kpn1, desc1, valid1, kpn2, desc2, valid2,
                                   E, max_desc_dist: float = 0.7,
                                   epi_thresh: float = 3e-3):
    """Epipolar-gated descriptor matching between two keyframes
    (src/search_points.py:311-414): candidate pairs must satisfy
    |x2^T E x1| / ||line|| < thresh, then best descriptor match wins."""
    ones1 = jnp.ones((kpn1.shape[0], 1))
    ones2 = jnp.ones((kpn2.shape[0], 1))
    x1 = jnp.concatenate([kpn1, ones1], -1)          # (K1, 3)
    x2 = jnp.concatenate([kpn2, ones2], -1)          # (K2, 3)
    lines = x1 @ E.T                                  # (K1, 3) epi line in 2
    num = jnp.abs(x2 @ lines.T)                       # (K2, K1)
    den = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)[None]
    epi = num / jnp.maximum(den, 1e-12)               # (K2, K1)
    ok = (epi.T < epi_thresh) & valid1[:, None] & valid2[None]
    dd = _desc_dist(desc1, desc2)
    cost = jnp.where(ok, dd, 1e6)
    idx2 = jnp.argmin(cost, axis=1)
    best = jnp.take_along_axis(cost, idx2[:, None], axis=1)[:, 0]
    return idx2, best < max_desc_dist


def search_and_fuse(map_obj, kf, fx, fy, cx, cy, radius_px: float = 6.0,
                    max_desc_dist: float = 0.5):
    """Fuse map points with a keyframe's keypoints
    (src/search_points.py:415+): matched points either fill empty keypoint
    slots or replace/merge with the slot's existing point."""
    import numpy as np
    pts = [p for p in map_obj.points if not p.is_bad]
    if not pts:
        return 0
    P = np.stack([p.pt for p in pts])
    D = np.stack([p.des if p.des is not None
                  else np.zeros(kf.desc.shape[1]) for p in pts])
    kp_idx, ok = search_frame_by_projection(
        jnp.asarray(P, jnp.float32), jnp.asarray(D, jnp.float32),
        jnp.ones((len(pts),), bool), jnp.asarray(kf.Tcw, jnp.float32),
        jnp.asarray(kf.kps, jnp.float32), jnp.asarray(kf.desc, jnp.float32),
        jnp.asarray(kf.valid), fx, fy, cx, cy, radius_px, max_desc_dist)
    kp_idx = np.asarray(kp_idx)
    ok = np.asarray(ok)
    fused = 0
    for i in np.flatnonzero(ok):
        mp = pts[i]
        slot = int(kp_idx[i])
        existing = kf.points[slot]
        if existing is None:
            mp.add_observation(kf, slot, kf.desc[slot])
            fused += 1
        elif existing is not mp and not existing.is_bad:
            # keep the better-observed point (src/map_point.py replacement)
            if existing.num_observations >= mp.num_observations:
                mp.replace_with(existing)
            else:
                existing.replace_with(mp)
            fused += 1
    return fused
