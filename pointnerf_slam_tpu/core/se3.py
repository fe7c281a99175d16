"""SE(3) / quaternion pose math.

Behavior parity targets (capability, not code) in the reference repo:
  - quaternion->rotation with non-unit normalization  (src/common.py:137-160)
  - camera tensor [qw qx qy qz tx ty tz] <-> 3x4 pose (src/common.py:163-201)
  - homogeneous pose utilities poseRt / inv_T         (src/utils/utils_geom.py:62-82)

All functions are pure jnp, batched over leading dims, and differentiable
(the quat+t camera tensor is THE pose parametrization both the tracker and
bundle adjustment optimize through).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix, supporting non-unit quats.

    Uses the 2/|q|^2 normalization so gradients flow through un-normalized
    quaternions exactly like the reference pose parametrization
    (src/common.py:147-160).

    Args:
      q: (..., 4) quaternion(s), (w, x, y, z) order.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    r00 = 1.0 - two_s * (qj * qj + qk * qk)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1.0 - two_s * (qi * qi + qk * qk)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1.0 - two_s * (qi * qi + qj * qj)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branchless.

    Replaces the reference's mathutils.Matrix.to_quaternion (a Blender C
    library call at src/common.py:190) with a closed-form JAX implementation.
    Numerically robust: builds all four Shepperd candidates and selects the
    one anchored on the largest of (trace, R00, R11, R22).

    Args:
      R: (..., 3, 3) rotation matrices.
    Returns:
      (..., 4) unit quaternions with w >= 0.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quaternions; candidate k is numerically
    # stable when its anchor term is the largest.
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                    axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                    axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                    axis=-1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # (..., 4, 4)
    anchors = jnp.stack([tr, m00, m11, m22], axis=-1)  # (..., 4)
    idx = jnp.argmax(anchors, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize sign (quat_to_rot is sign-invariant)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def camera_from_tensor(t: jnp.ndarray) -> jnp.ndarray:
    """Camera tensor [qw qx qy qz tx ty tz] -> (..., 3, 4) pose matrix.

    Differentiable; this is the map both optimization loops backprop through
    (capability of src/common.py:163-176).
    """
    quad, trans = t[..., :4], t[..., 4:]
    R = quat_to_rot(quad)
    return jnp.concatenate([R, trans[..., :, None]], axis=-1)


def tensor_from_camera(RT: jnp.ndarray, t_first: bool = False) -> jnp.ndarray:
    """(..., 3, 4) or (..., 4, 4) pose matrix -> camera tensor [q | t].

    Capability of src/common.py:179-201 (`Tquad` flag -> `t_first`).
    """
    R = RT[..., :3, :3]
    trans = RT[..., :3, 3]
    q = rot_to_quat(R)
    if t_first:
        return jnp.concatenate([trans, q], axis=-1)
    return jnp.concatenate([q, trans], axis=-1)


def to_homogeneous(RT: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) by appending [0 0 0 1]."""
    batch = RT.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), RT.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([RT, bottom], axis=-2)


def pose_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(3,3) rotation + (3,) translation -> (4,4) homogeneous transform.

    Capability of src/utils/utils_geom.py:62-70.
    """
    T = to_homogeneous(jnp.concatenate([R, t[..., :, None]], axis=-1))
    return T


def inv_T(T: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid transform via R^T (src/utils/utils_geom.py:74-82)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    return pose_rt(Rt, ti)
