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


def _signed_sampson(E: jnp.ndarray, x_cur: jnp.ndarray, x_ref: jnp.ndarray):
    """First-order (signed) Sampson residual — sqrt of `_sampson`."""
    ones = jnp.ones((x_cur.shape[0], 1))
    xc = jnp.concatenate([x_cur, ones], -1)
    xr = jnp.concatenate([x_ref, ones], -1)
    Exc = xc @ E.T
    Etxr = xr @ E
    num = jnp.sum(xr * Exc, -1)
    den = Exc[:, 0] ** 2 + Exc[:, 1] ** 2 + Etxr[:, 0] ** 2 + Etxr[:, 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, 1e-12))


def _exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exp map, Taylor-safe at 0 (jit: no branches)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = _skew(w)
    a = jnp.sin(th) / th
    b = (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-24)
    a = jnp.where(th < 1e-6, 1.0, a)
    b = jnp.where(th < 1e-6, 0.5, b)
    return jnp.eye(3) + a * K + b * (K @ K)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([[0.0, -v[2], v[1]],
                      [v[2], 0.0, -v[0]],
                      [-v[1], v[0], 0.0]])


def _tangent_basis(t: jnp.ndarray) -> jnp.ndarray:
    """(3, 2) orthonormal basis of the plane normal to unit t."""
    # pick the axis least aligned with t to seed Gram-Schmidt
    e = jnp.eye(3)[jnp.argmin(jnp.abs(t))]
    b1 = e - t * jnp.dot(e, t)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=-1)


def _gn_polish(R, t, x_cur, x_ref, w, sigma, iters: int = 8):
    """Truncated-Huber-IRLS Gauss-Newton on (R, t) in SO(3) x S^2,
    minimizing the signed Sampson residuals of E = [t]x R over the
    weighted match set. Weights redescend to 0 past 3*sigma: plain Huber's
    constant-magnitude gradient (w*r = sigma per point) lets a 30% gross-
    outlier fraction rival the inlier signal (measured: 5 deg R bias);
    truncation kills it while the <=sigma small-baseline regime — where
    every residual is well inside 3*sigma — is untouched. Matches outside
    3*sigma at one iterate re-enter later if the model moves toward them
    (weights recompute each IRLS round).

    The linear 8-point refit minimizes an ALGEBRAIC error; at realistic
    keypoint noise and small baselines its translation direction is biased
    tens of degrees even with a near-complete inlier set (measured). cv2's
    5-point polynomial solver (what the reference calls, Tracker.py:356-360)
    does not share the bias; this geometric polish is our equivalent
    robustness, fully jit-safe (fixed iterations, 5-parameter solve)."""

    def step(Rt, _):
        R, t = Rt
        B = _tangent_basis(t)

        def res(p):
            Rn = R @ _exp_so3(p[:3])
            tn = t + B @ p[3:]
            tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
            return _signed_sampson(_skew(tn) @ Rn, x_cur, x_ref)

        r = res(jnp.zeros(5))
        J = jax.jacfwd(res)(jnp.zeros(5))                    # (M, 5)
        ww = w / jnp.maximum(1.0, jnp.abs(r) / sigma)        # Huber
        ww = ww * (jnp.abs(r) < 3.0 * sigma)                 # redescend
        A = J.T @ (J * ww[:, None]) + 1e-10 * jnp.eye(5)
        g = J.T @ (r * ww)
        p = -jnp.linalg.solve(A, g)
        Rn = R @ _exp_so3(p[:3])
        tn = t + B @ p[3:]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


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
    # MSAC score: relu(th^2 - d^2) rewards tight fits among the inliers —
    # better model selection than raw counts when noise ~ threshold
    msac = jnp.sum(jnp.where(match_valid[None, :],
                             jax.nn.relu(thresh ** 2 - d2), 0.0), axis=1)

    # Multi-start: at realistic keypoint noise the MSAC landscape is
    # bimodal (measured: seeds split ~8 deg vs ~60 deg in t with near-equal
    # inlier counts — the small-baseline R/t confusion). Polishing ONE
    # winner inherits its basin; instead refit+decompose+polish K starts
    # independently and pick by final robust Sampson cost (measured to
    # separate the basins where inlier counts do not). The K starts are
    # chosen MSAC-best-first with a translation-direction diversity gate
    # (>= 25 deg apart), because at a bad key the top-8 by MSAC alone all
    # sit in one basin.
    TOPK = 8
    t_all = jax.vmap(lambda E: jnp.linalg.svd(E)[0][:, 2])(Es)  # (N_h, 3)

    def pick_one(carry, _):
        picked_t, score = carry
        b = jnp.argmax(score)
        tb = t_all[b]
        # mask out hypotheses whose |t . tb| is large (same basin, either
        # sign — t is sign-ambiguous pre-cheirality)
        close = jnp.abs(t_all @ tb) > jnp.cos(jnp.deg2rad(25.0))
        score = jnp.where(close, -jnp.inf, score)
        # if everything is masked, later picks repeat argmax of -inf = 0;
        # harmless (duplicate starts polish to the same candidate)
        return (picked_t, score), b

    _, top = jax.lax.scan(pick_one, (t_all, msac), None, length=TOPK)

    # all-inlier refit operands (weighted 8-point via the 9x9 normal
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

    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])

    def polish_one(E, inlier_mask):
        for _ in range(2):
            E, inlier_mask = refit(E, inlier_mask)

        # recoverPose: 4 decompositions, cheirality vote over inliers
        u, _, vt = jnp.linalg.svd(E)
        u = u * jnp.sign(jnp.linalg.det(u))
        vt = vt * jnp.sign(jnp.linalg.det(vt))
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
        # a start whose refit E has ZERO cheirality-positive inliers in
        # every decomposition is degenerate (measured: such starts polish
        # to ~90-deg-off basins and, selected by cost alone, returned
        # 0-inlier "poses" on ~half the RNG keys at some frame pairs) —
        # mark it dead instead of polishing garbage
        dead = scores[b] == 0

        # geometric polish (see _gn_polish): IRLS over ALL valid matches
        # (the hypothesis supplies only the START — its inlier set is
        # noise-contaminated enough to drag GN away from gt even from a
        # near-gt start; measured), Huber scale = the RANSAC threshold
        w = match_valid.astype(jnp.float32)
        R, t = _gn_polish(R, t, kpn_cur, kpn_ref, w, jnp.float32(thresh))
        # robust (Huber-rho) Sampson cost over ALL valid matches — the
        # candidate tie-breaker; truncate at 3*sigma so gross outliers do
        # not swamp the comparison
        r = jnp.abs(_signed_sampson(_skew(t) @ R, kpn_cur, kpn_ref))
        sig = thresh
        rho = jnp.where(r < sig, 0.5 * r ** 2 / sig,
                        jnp.minimum(r, 3.0 * sig) - 0.5 * sig)
        cost = jnp.sum(jnp.where(match_valid, rho, 0.0))
        n_post = jnp.sum((r ** 2 < thresh ** 2) & match_valid)
        n_post = jnp.where(dead, -1, n_post)
        return R, t, cost, n_post

    # the multi-start pool: TOPK diverse MSAC winners + one deterministic
    # all-match start (polish_one's first refit is a weighted 8-point
    # eigenfit over the passed mask, so seeding with mask=match_valid fits
    # every valid match; the placeholder E is never used). With ~30%
    # outliers the all-match eigenfit lands in the true basin even when
    # every minimal-sample winner sits in a wrong one (measured:
    # seed-dependent total collapse at some frame pairs without it).
    E_seeds = jnp.concatenate([Es[top], jnp.eye(3)[None]])
    inl_seeds = jnp.concatenate([inl[top], match_valid[None]])
    Rk, tk, costk, npostk = jax.vmap(polish_one)(E_seeds, inl_seeds)
    # selection: post-polish inlier count separates the basins far more
    # sharply than the robust cost (measured 44-vs-0 inliers at a 10%
    # cost gap); cost only tie-breaks. NaN guard: a degenerate start can
    # polish to NaN (singular refit/SVD) and NaN score poisons argmax —
    # measured as seed-dependent 0-inlier collapses on ~half the keys
    finite = jnp.all(jnp.isfinite(Rk), axis=(1, 2)) \
        & jnp.all(jnp.isfinite(tk), axis=1) & jnp.isfinite(costk)
    score = jnp.where(finite, npostk.astype(jnp.float32) - costk, -jnp.inf)
    b = jnp.argmax(score)
    R, t = Rk[b], tk[b]
    E = _skew(t) @ R
    d2p = _sampson(E, kpn_cur, kpn_ref)
    inlier_mask = (d2p < thresh ** 2) & match_valid

    Trc = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return Trc, inlier_mask, jnp.sum(inlier_mask)
