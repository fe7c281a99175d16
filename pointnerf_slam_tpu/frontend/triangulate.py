"""Two-view triangulation + map-point acceptance checks.

Capability of triangulate_normalized_points (src/utils/utils_geom.py:140-207,
cv2.triangulatePoints on normalized coords) and the geometric acceptance
gates of Map.add_points (src/map.py:191-287): positive depth in both views,
small reprojection error, sufficient parallax.

Batched DLT: one (N, 4, 4) SVD, vmapped — N is a few thousand keypoints, tiny
for the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_points(Tcw_cur: jnp.ndarray, Tcw_ref: jnp.ndarray,
                       kpn_cur: jnp.ndarray, kpn_ref: jnp.ndarray):
    """DLT triangulation in world coordinates.

    Args:
      Tcw_cur, Tcw_ref: (4, 4) world->camera transforms.
      kpn_cur, kpn_ref: (N, 2) normalized image coords.
    Returns:
      pts3d (N, 3) world points, ok (N,) finite/solvable mask.
    """
    P_cur = Tcw_cur[:3]
    P_ref = Tcw_ref[:3]

    def tri(xc, xr):
        A = jnp.stack([
            xc[0] * P_cur[2] - P_cur[0],
            xc[1] * P_cur[2] - P_cur[1],
            xr[0] * P_ref[2] - P_ref[0],
            xr[1] * P_ref[2] - P_ref[1],
        ])
        _, s, vt = jnp.linalg.svd(A)
        X = vt[-1]
        w = X[3]
        good = jnp.abs(w) > 1e-12
        X = X[:3] / jnp.where(good, w, 1.0)
        return X, good & jnp.all(jnp.isfinite(X))

    pts3d, ok = jax.vmap(tri)(kpn_cur, kpn_ref)
    return pts3d, ok


def point_checks(pts3d: jnp.ndarray, Tcw_cur: jnp.ndarray,
                 Tcw_ref: jnp.ndarray, kpn_cur: jnp.ndarray,
                 kpn_ref: jnp.ndarray, fx: float,
                 max_reproj_px: float = 3.0,
                 cos_max_parallax: float = 0.9998):
    """Acceptance mask per Map.add_points semantics.

    Returns (accept_mask, z_cur, z_ref, uvn_cur, uvn_ref) where z_* are
    camera-frame depths and uvn_* the normalized reprojections.
    """
    def cam(T, X):
        return X @ T[:3, :3].T + T[:3, 3]

    xc = cam(Tcw_cur, pts3d)
    xr = cam(Tcw_ref, pts3d)
    z_cur = xc[:, 2]
    z_ref = xr[:, 2]

    # NOTE: camera convention here is the classic CV one used by the sparse
    # front-end (z forward, normalized coords = x/z); the NeRF-side -z
    # convention enters only when poses are converted (frontend.py).
    uvn_cur = xc[:, :2] / jnp.where(jnp.abs(z_cur[:, None]) < 1e-12, 1e-12,
                                    z_cur[:, None])
    uvn_ref = xr[:, :2] / jnp.where(jnp.abs(z_ref[:, None]) < 1e-12, 1e-12,
                                    z_ref[:, None])
    err_cur = jnp.linalg.norm(uvn_cur - kpn_cur, axis=1) * fx
    err_ref = jnp.linalg.norm(uvn_ref - kpn_ref, axis=1) * fx

    # parallax: angle between the two viewing rays
    c_cur = -Tcw_cur[:3, :3].T @ Tcw_cur[:3, 3]
    c_ref = -Tcw_ref[:3, :3].T @ Tcw_ref[:3, 3]
    r1 = pts3d - c_cur
    r2 = pts3d - c_ref
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12)

    accept = ((z_cur > 0) & (z_ref > 0)
              & (err_cur < max_reproj_px) & (err_ref < max_reproj_px)
              & (cosp < cos_max_parallax))
    return accept, z_cur, z_ref, uvn_cur, uvn_ref
