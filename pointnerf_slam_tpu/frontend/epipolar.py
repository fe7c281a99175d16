"""Essential-matrix pose estimation: vmapped-hypothesis RANSAC, fully
on-device.

Capability of the reference's estimatePose (src/Tracker.py:356-360, OpenCV
5-point RANSAC + recoverPose, prob=0.999, normalized threshold 3e-4) and
estimate_pose_ess_mat (src/utils/utils_geom.py:255-259). TPU-native design:
a fixed batch of N_h hypotheses, each from 8 sampled correspondences, solved
by the linear 8-point algorithm (one small batched SVD), scored by Sampson
distance over ALL matches in one (N_h, M) matrix — argmax inliers wins. Pose
recovery decomposes E into the 4 (R, t) candidates and picks the one with the
most cheirality-positive triangulated points (what cv2.recoverPose does).

Convention (matches the reference exactly): inputs are normalized coords;
`estimate_relative_pose_ransac(kpn_ref, kpn_cur)` returns Trc with
x_ref ~ R @ x_cur + t (pr_ = Trc * pc_, Tracker.py:473-475), |t| = 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _eight_point(x_cur: jnp.ndarray, x_ref: jnp.ndarray) -> jnp.ndarray:
    """Linear 8-point E from (8, 2) normalized correspondences.

    Solves x_ref_h^T E x_cur_h = 0; returns E projected onto the essential
    manifold (singular values (1, 1, 0))."""
    xc, yc = x_cur[:, 0], x_cur[:, 1]
    xr, yr = x_ref[:, 0], x_ref[:, 1]
    one = jnp.ones_like(xc)
    # row = kron(x_ref_h, x_cur_h): E flattened row-major [E00..E22]
    A = jnp.stack([xr * xc, xr * yc, xr, yr * xc, yr * yc, yr, xc, yc, one],
                  axis=-1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    E = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ vt2
    return E


def _sampson(E: jnp.ndarray, x_cur: jnp.ndarray, x_ref: jnp.ndarray):
    """Sampson distance (squared, normalized-coord units) for all matches."""
    ones = jnp.ones((x_cur.shape[0], 1))
    xc = jnp.concatenate([x_cur, ones], -1)  # (M, 3)
    xr = jnp.concatenate([x_ref, ones], -1)
    Exc = xc @ E.T          # (M, 3) = E @ x_cur per row
    Etxr = xr @ E           # (M, 3) = E^T @ x_ref per row
    num = jnp.sum(xr * Exc, -1) ** 2
    den = Exc[:, 0] ** 2 + Exc[:, 1] ** 2 + Etxr[:, 0] ** 2 + Etxr[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _triangulate_two_view(R, t, x_cur, x_ref):
    """Midpoint-free DLT for cheirality checks: cameras P_ref = [I|0],
    P_cur = [R'|t'] where x_cur = R' x_ref + t' (inverse of (R, t)).
    Returns z depths in both frames."""
    Rp = R.T
    tp = -R.T @ t
    P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)   # ref
    P1 = jnp.concatenate([Rp, tp[:, None]], 1)                 # cur

    def tri(xc, xr):
        A = jnp.stack([
            xr[0] * P0[2] - P0[0],
            xr[1] * P0[2] - P0[1],
            xc[0] * P1[2] - P1[0],
            xc[1] * P1[2] - P1[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        X = X / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        z_ref = X[2]
        z_cur = (Rp @ X[:3] + tp)[2]
        return z_ref, z_cur

    return jax.vmap(tri)(x_cur, x_ref)


@partial(jax.jit, static_argnames=("n_hyp",))
def estimate_relative_pose_ransac(kpn_ref: jnp.ndarray, kpn_cur: jnp.ndarray,
                                  match_valid: jnp.ndarray, key,
                                  n_hyp: int = 256,
                                  thresh: float = 3e-4):
    """RANSAC essential-matrix relative pose.

    Args:
      kpn_ref, kpn_cur: (M, 2) matched normalized coords (row i <-> row i).
      match_valid: (M,) bool.
      thresh: inlier threshold on Sampson *distance* (normalized units);
        reference cv2 threshold = 3e-4.
    Returns:
      Trc (4, 4) with unit translation, inlier_mask (M,), n_inliers.
    """
    M = kpn_ref.shape[0]
    logits = jnp.where(match_valid, 0.0, -jnp.inf)
    logits = jnp.where(jnp.any(match_valid), logits, jnp.zeros_like(logits))
    keys = jax.random.split(key, n_hyp)

    def hyp(k):
        idx = jax.random.categorical(k, logits, shape=(8,))
        return _eight_point(kpn_cur[idx], kpn_ref[idx])

    Es = jax.vmap(hyp)(keys)                       # (N_h, 3, 3)
    d2 = jax.vmap(lambda E: _sampson(E, kpn_cur, kpn_ref))(Es)  # (N_h, M)
    inl = (d2 < thresh ** 2) & match_valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    E = Es[best]
    inlier_mask = inl[best]

    # iterative all-inlier refit (weighted 8-point via the 9x9 normal
    # matrix) — stabilizes small-baseline estimates that a minimal sample
    # cannot pin down; cv2's 5-point RANSAC gets this robustness from its
    # polynomial solver, we get it from the refit.
    xc_h = jnp.concatenate([kpn_cur, jnp.ones((M, 1))], -1)
    xr_h = jnp.concatenate([kpn_ref, jnp.ones((M, 1))], -1)
    A_all = jnp.einsum("mi,mj->mij", xr_h, xc_h).reshape(M, 9)

    def refit(E, inlier_mask):
        w = inlier_mask.astype(jnp.float32)[:, None]
        N = (A_all * w).T @ (A_all * w)
        _, vecs = jnp.linalg.eigh(N)
        E = vecs[:, 0].reshape(3, 3)
        u, s, vt2 = jnp.linalg.svd(E)
        E = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ vt2
        d2 = _sampson(E, kpn_cur, kpn_ref)
        return E, (d2 < thresh ** 2) & match_valid

    for _ in range(2):
        E, inlier_mask = refit(E, inlier_mask)

    # recoverPose: 4 candidate decompositions, cheirality vote over inliers
    u, _, vt = jnp.linalg.svd(E)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]

    def score(R, t):
        z_ref, z_cur = _triangulate_two_view(R, t, kpn_cur, kpn_ref)
        ok = (z_ref > 0) & (z_cur > 0) & inlier_mask
        return jnp.sum(ok)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    scores = jnp.stack([score(R, tt) for R, tt in cands])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    b = jnp.argmax(scores)
    R, t = Rs[b], ts[b]

    Trc = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return Trc, inlier_mask, counts[best]
