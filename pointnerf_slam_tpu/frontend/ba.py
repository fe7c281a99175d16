"""Bundle adjustment: the g2o capability surface, TPU-native.

Capability of src/optimizer_g2o.py (C++ g2o through Python bindings):
  - pose_optimization (:151-268): motion-only refinement of one camera
    against map points, Huber-robust, 4 rounds with chi2 outlier
    reclassification (kChi2Mono = 5.991).
  - bundle_adjustment / local_bundle_adjustment (:36-138, :275-448): joint
    poses+points refinement over a keyframe window.

Design: instead of a sparse Levenberg-Marquardt C++ solver, the window-scale
problems (<= ~20 keyframes x a few k points, SURVEY §2.3) are solved with
batched dense Gauss-Newton — vmapped 6x6 pose solves and 3x3 point solves,
alternated (block coordinate descent). Every solve is a tiny batched linalg
op the TPU eats whole; no sparse structure needed at this scale.

Pose parametrization: camera tensor [qw qx qy qz tx ty tz] of Tcw (w2c, CV
convention: x_cam = R x_world + t, normalized obs = (x/z, y/z)). Gradients
flow through quat_to_rot exactly as in the tracking path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.se3 import camera_from_tensor

CHI2_MONO = 5.991  # 95% quantile of chi2(2) — reference optimizer_g2o.py


def _project(cam7, pts):
    """Project world points with a w2c camera tensor -> normalized coords
    and camera-frame depth."""
    T = camera_from_tensor(cam7)
    pc = pts @ T[:3, :3].T + T[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return pc[:, :2] / zs[:, None], z


def _residuals(cam7, pts, kpn):
    uv, z = _project(cam7, pts)
    return uv - kpn, z


def _huber_w(r2, delta2):
    """Huber IRLS weights for squared residual norms."""
    return jnp.where(r2 <= delta2, 1.0, jnp.sqrt(delta2 / r2))


def _renorm(cam7):
    """Fix the quaternion scale gauge (quat_to_rot is scale-invariant, so
    GN is singular along it)."""
    q = cam7[..., :4]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([q, cam7[..., 4:]], -1)


@partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def pose_optimization(cam7_init, pts, kpn, valid, sigma2: float = 1.0,
                      rounds: int = 4, iters_per_round: int = 10):
    """Motion-only pose refinement (optimizer_g2o.pose_optimization).

    Args:
      cam7_init: (7,) w2c camera tensor.
      pts: (N, 3) world map points.
      kpn: (N, 2) observed normalized coords.
      valid: (N,) bool observation mask.
      sigma2: observation variance (normalized units^2).
    Returns:
      (cam7, inlier_mask, n_inliers) — inliers re-classified per round at
      chi2 5.991 (reference :151-268), matching g2o's 4-round schedule.
    """
    chi2_th = CHI2_MONO * sigma2
    huber2 = chi2_th

    def gn_iter(cam, w):
        def flat_res(c):
            r, z = _residuals(c, pts, kpn)
            return (r * w[:, None]).reshape(-1)

        J = jax.jacfwd(flat_res)(cam)              # (2N, 7)
        r = flat_res(cam)
        H = J.T @ J + 1e-6 * jnp.eye(7)
        g = J.T @ r
        return _renorm(cam - jnp.linalg.solve(H, g))

    def round_body(carry, _):
        cam, _ = carry
        # Huber IRLS on all valid observations: outliers are continuously
        # downweighted (w ~ delta/|r|) rather than hard-gated, so the solve
        # cannot starve when every residual starts above chi2 (the
        # reference's g2o robust kernel behaves the same way)
        r, z = _residuals(cam, pts, kpn)
        r2 = jnp.sum(r * r, -1) / sigma2
        w = jnp.sqrt(_huber_w(r2, huber2)) * valid.astype(jnp.float32) \
            * (z > 0)
        cam = jax.lax.fori_loop(0, iters_per_round,
                                lambda i, c: gn_iter(c, w), cam)
        r, z = _residuals(cam, pts, kpn)
        r2 = jnp.sum(r * r, -1) / sigma2
        inliers = valid & (r2 < chi2_th) & (z > 0)
        return (cam, inliers), None

    init = (cam7_init, valid)
    (cam, inliers), _ = jax.lax.scan(round_body, init, None, length=rounds)
    return cam, inliers, jnp.sum(inliers)


@partial(jax.jit, static_argnames=("iters", "l2_iters"))
def bundle_adjustment(cams7, pts, obs_kpn, obs_valid, fixed_cams,
                      sigma2: float = 1.0, iters: int = 10,
                      l2_iters: int = 5):
    """Windowed BA by alternating batched Gauss-Newton
    (bundle_adjustment / local_bundle_adjustment capability).

    Args:
      cams7: (K, 7) w2c camera tensors.
      pts: (M, 3) world points.
      obs_kpn: (K, M, 2) normalized observations (point m in camera k).
      obs_valid: (K, M) bool.
      fixed_cams: (K,) bool — poses held fixed (the oldest keyframe,
        Mapper.py:464; gt-anchored frames).
    Returns: (cams7, pts, mean_chi2_inliers)
    """
    huber2 = CHI2_MONO * sigma2

    def all_res(cams, pts):
        def per_cam(cam):
            uv, z = _project(cam, pts)
            return uv, z
        uv, z = jax.vmap(per_cam)(cams)            # (K, M, 2), (K, M)
        r = uv - obs_kpn
        return r, z

    def weights(cams, pts, robust):
        r, z = all_res(cams, pts)
        r2 = jnp.sum(r * r, -1) / sigma2
        # anneal: L2 first (a bad init makes Huber downweight the
        # informative high-residual observations), robust after
        hw = jnp.where(robust, _huber_w(r2, huber2), 1.0)
        return hw * obs_valid * (z > 0)

    def pose_step(cams, pts, w):
        def solve_one(cam, w_k, kpn_k):
            def fr(c):
                uv, _ = _project(c, pts)
                return ((uv - kpn_k) * w_k[:, None]).reshape(-1)
            J = jax.jacfwd(fr)(cam)
            r = fr(cam)
            H = J.T @ J + 1e-5 * jnp.eye(7)
            return _renorm(cam - jnp.linalg.solve(H, J.T @ r))
        new = jax.vmap(solve_one)(cams, w, obs_kpn)
        return jnp.where(fixed_cams[:, None], cams, new)

    def point_step(cams, pts, w):
        def solve_one(pt, w_m, kpn_m):
            def fr(p):
                def per_cam(cam):
                    T = camera_from_tensor(cam)
                    pc = T[:3, :3] @ p + T[:3, 3]
                    zs = jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
                    return pc[:2] / zs
                uv = jax.vmap(per_cam)(cams)        # (K, 2)
                return ((uv - kpn_m) * w_m[:, None]).reshape(-1)
            J = jax.jacfwd(fr)(pt)                  # (2K, 3)
            r = fr(pt)
            H = J.T @ J + 1e-5 * jnp.eye(3)
            return pt - jnp.linalg.solve(H, J.T @ r)
        return jax.vmap(solve_one)(pts, w.T, jnp.swapaxes(obs_kpn, 0, 1))

    def body(carry, it):
        cams, pts = carry
        w = weights(cams, pts, it >= l2_iters)
        cams = pose_step(cams, pts, w)
        pts = point_step(cams, pts, w)
        return (cams, pts), None

    (cams, pts), _ = jax.lax.scan(body, (cams7, pts),
                                  jnp.arange(iters))
    r, z = all_res(cams, pts)
    r2 = jnp.sum(r * r, -1) / sigma2
    inl = obs_valid & (z > 0) & (r2 < huber2)
    mean_chi2 = jnp.sum(r2 * inl) / jnp.maximum(jnp.sum(inl), 1)
    return cams, pts, mean_chi2
