"""NumPy twins of the SE(3) helpers for host-side glue.

The engine's scheduler converts 4x4 poses <-> camera tensors dozens of
times per frame; running those through jnp dispatches tiny device
executions over the device tunnel (pure overhead, and execution churn
destabilizes the experimental axon runtime). These mirrors keep host
bookkeeping on the host. Parity with core/se3.py is pinned by tests.
"""

from __future__ import annotations

import numpy as np


def quat_to_rot_np(q: np.ndarray) -> np.ndarray:
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / np.sum(q * q, axis=-1)
    R = np.empty(q.shape[:-1] + (3, 3), q.dtype)
    R[..., 0, 0] = 1 - two_s * (qj * qj + qk * qk)
    R[..., 0, 1] = two_s * (qi * qj - qk * qr)
    R[..., 0, 2] = two_s * (qi * qk + qj * qr)
    R[..., 1, 0] = two_s * (qi * qj + qk * qr)
    R[..., 1, 1] = 1 - two_s * (qi * qi + qk * qk)
    R[..., 1, 2] = two_s * (qj * qk - qi * qr)
    R[..., 2, 0] = two_s * (qi * qk - qj * qr)
    R[..., 2, 1] = two_s * (qj * qk + qi * qr)
    R[..., 2, 2] = 1 - two_s * (qi * qi + qj * qj)
    return R


def rot_to_quat_np(R: np.ndarray) -> np.ndarray:
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    cands = np.stack([
        np.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1),
        np.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                 -1),
        np.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                 -1),
        np.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                 -1),
    ], axis=-2)
    anchors = np.stack([tr, m00, m11, m22], -1)
    idx = np.argmax(anchors, axis=-1)
    q = np.take_along_axis(
        cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return np.where(q[..., :1] < 0, -q, q)


def camera_from_tensor_np(t: np.ndarray) -> np.ndarray:
    R = quat_to_rot_np(t[..., :4])
    return np.concatenate([R, t[..., 4:, None]], axis=-1)


def tensor_from_camera_np(RT: np.ndarray) -> np.ndarray:
    return np.concatenate([rot_to_quat_np(RT[..., :3, :3]), RT[..., :3, 3]],
                          axis=-1)


def interp_c2w_np(a: np.ndarray, b: np.ndarray, alpha: float) -> np.ndarray:
    """SE(3) interpolation between two 4x4 c2w poses: quaternion slerp on
    the rotation, lerp on the camera center. Used to back-fill the poses
    of non-tracked frames between two tracked solves (the raw running
    estimate is a pose COPY, which alone costs ~105 mm RMSE at the
    flagship's 43 mm/frame motion with track_every_frame=5)."""
    qa = rot_to_quat_np(np.ascontiguousarray(a[:3, :3]))
    qb = rot_to_quat_np(np.ascontiguousarray(b[:3, :3]))
    d = float(np.dot(qa, qb))
    if d < 0:
        qb, d = -qb, -d
    if d > 0.9995:  # nearly parallel: lerp + renormalize
        q = (1 - alpha) * qa + alpha * qb
    else:
        th = np.arccos(np.clip(d, -1.0, 1.0))
        q = (np.sin((1 - alpha) * th) * qa + np.sin(alpha * th) * qb) \
            / np.sin(th)
    q = q / np.linalg.norm(q)
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = quat_to_rot_np(q)
    out[:3, 3] = (1 - alpha) * a[:3, 3] + alpha * b[:3, 3]
    return out


def to_homogeneous_np(RT: np.ndarray) -> np.ndarray:
    batch = RT.shape[:-2]
    bottom = np.zeros(batch + (1, 4), RT.dtype)
    bottom[..., 0, 3] = 1.0
    return np.concatenate([RT, bottom], axis=-2)
