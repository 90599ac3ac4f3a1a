"""Shared reprojection residuals/Jacobians for all BA problems.

The math of the fork's rig-aware g2o edges
(Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:98-156: error =
obs - cam_project(Tcim.map(Tcw.map(Xw))), with analytic Jacobians in
types_six_dof_expmap.cpp:110-145, 324-338), vectorized over observation
batches.  Used by motion-only BA, local BA, and global BA.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import se3


def reproj_residual(
    Tcw: jnp.ndarray,      # [N, 4, 4] rig pose per observation
    Xw: jnp.ndarray,       # [N, 3] world point per observation
    T_rc: jnp.ndarray,     # [N, 4, 4] rig->camera extrinsic per observation
    K: jnp.ndarray,        # [N, 4] per-observation intrinsics
    bf: jnp.ndarray,       # [] or [N]
    uvr: jnp.ndarray,      # [N, 3] measured (u, v, ur); ur<0 => mono
    want_jac: bool = True,
):
    """Returns (e [N,3], J_pose [N,3,6], J_point [N,3,3], is_stereo [N],
    pos_depth [N]).

    e rows for mono observations must be masked with row weights
    [1, 1, 0] by the caller.  J_pose is wrt a left-multiplied se3 tangent on
    Tcw; J_point is wrt Xw.
    """
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    Xr = jnp.einsum("nij,nj->ni", R, Xw) + t
    Rm = T_rc[..., :3, :3]
    tm = T_rc[..., :3, 3]
    Xc = jnp.einsum("nij,nj->ni", Rm, Xr) + tm
    fx, fy = K[:, 0], K[:, 1]
    cx, cy = K[:, 2], K[:, 3]
    bfo = jnp.broadcast_to(bf, fx.shape)

    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    pos_depth = z > 1e-3
    zs = jnp.where(pos_depth, z, 1.0)
    invz = 1.0 / zs
    invz2 = invz * invz
    u = fx * x * invz + cx
    v = fy * y * invz + cy
    ur = u - bfo * invz
    pred = jnp.stack([u, v, ur], axis=-1)
    is_stereo = uvr[:, 2] >= 0
    target = jnp.where(is_stereo[:, None], uvr,
                       jnp.concatenate([uvr[:, :2], ur[:, None]], axis=-1))
    e = target - pred
    if not want_jac:
        return e, None, None, is_stereo, pos_depth

    zero = jnp.zeros_like(fx)
    A = jnp.stack(
        [
            jnp.stack([fx * invz, zero, -fx * x * invz2], -1),
            jnp.stack([zero, fy * invz, -fy * y * invz2], -1),
            jnp.stack([fx * invz, zero, -fx * x * invz2 + bfo * invz2], -1),
        ],
        axis=-2,
    )  # [N, 3, 3] dproj/dXc
    ARm = jnp.einsum("nij,njk->nik", A, Rm)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=Xw.dtype), Xw.shape[:-1] + (3, 3))
    G = jnp.concatenate([I3, -se3.hat(Xr)], axis=-1)  # [N, 3, 6]
    J_pose = -jnp.einsum("nik,nkl->nil", ARm, G)
    J_point = -jnp.einsum("nik,nkl->nil", ARm, R)
    return e, J_pose, J_point, is_stereo, pos_depth


def row_weights(is_stereo: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[N, 3] row mask: mono rows drop the virtual-right residual."""
    ones = jnp.ones(is_stereo.shape + (3,), dtype)
    mono = jnp.broadcast_to(jnp.asarray([1.0, 1.0, 0.0], dtype), ones.shape)
    return jnp.where(is_stereo[:, None], ones, mono)
