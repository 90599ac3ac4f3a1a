"""SE(3) Lie group operations, batched and jit-friendly.

Replaces the reference's g2o `SE3Quat` + `Converter` (cv::Mat <-> Eigen)
machinery (reference: Thirdparty/g2o/g2o/types/se3quat.h, src/Converter.cc).
Poses are stored as 4x4 homogeneous matrices `T` mapping world -> camera
(`Tcw`), matching the reference convention.  Tangent vectors are
`xi = (upsilon, omega)` with translation first, rotation last — the same
ordering g2o's SE3Quat::exp uses for its update.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a (..., 3) vector."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # Taylor-safe coefficients
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    K = hat(omega)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle.

    Quaternion-based: theta = 2 atan2(|q_xyz|, q_w), accurate over the whole
    group including near theta = pi (where the vee-based formula degenerates).
    """
    q = to_quaternion(R)
    xyz = q[..., 0:3]
    w = q[..., 3]
    # force w >= 0 so theta in [0, pi]
    sgn = jnp.where(w < 0, -1.0, 1.0)
    xyz = xyz * sgn[..., None]
    w = w * sgn
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    # theta / sin(theta/2) = theta / n-normalizer; near 0 use series 2/w
    scale = jnp.where(n < 1e-7, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(n, _EPS))
    return scale[..., None] * xyz


def _left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(omega), used by the SE(3) exp translation."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(omega)
    K2 = K @ K
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * K2


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent (..., 6) [upsilon, omega] -> (..., 4, 4) transform."""
    upsilon = xi[..., :3]
    omega = xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(omega), upsilon)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) transform -> (..., 6) tangent [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    Jl = _left_jacobian(omega)
    upsilon = jnp.linalg.solve(Jl, t[..., None])[..., 0]
    return jnp.concatenate([upsilon, omega], axis=-1)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) from (..., 3, 3) rotation and (..., 3) translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) rigid transform (uses R^T, not a general inverse)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., N, 3) (or (..., 3)) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n_batch = T.ndim - 2
    if pts.ndim == n_batch + 2:  # (..., N, 3)
        return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def camera_center(Tcw: jnp.ndarray) -> jnp.ndarray:
    """World-frame camera center Ow = -R^T t (reference: KeyFrame.cc:111-132)."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 4) quaternion (x, y, z, w), TUM order.

    Shepperd's method, branch-free via select over the four cases.
    (Reference counterpart: Converter::toQuaternion, src/Converter.cc:148-162.)
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # case 0: trace dominant
    s0 = safe_sqrt(trace + 1.0) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    # case 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    # case 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    # case 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    cond0 = trace > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (x, y, z, w) -> (..., 3, 3) rotation."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def normalize_rotation(T: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation block via SVD (drift control)."""
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    Rn = (u * fix[..., None, :]) @ vt
    return from_rt(Rn, T[..., :3, 3])
