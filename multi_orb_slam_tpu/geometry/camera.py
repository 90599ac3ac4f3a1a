"""Pinhole camera model with radial-tangential distortion, batched.

Covers the reference's camera math:
- keypoint undistortion (reference: src/Frame.cc:673-740, cv::undistortPoints)
- RGB-D -> virtual stereo right coordinate `ur = u - bf/d`
  (reference: src/Frame.cc:959-1034, ComputeStereoFromRGBD)
- stereo unprojection incl. the cam2 rig mapping
  (reference: src/Frame.cc:1054-1097, UnprojectStereo_cam2/_camid)
- frustum checks (reference: src/Frame.cc:443-499, isInFrustum)

Intrinsics are packed as a (..., 4) array [fx, fy, cx, cy]; distortion as a
(..., 5) array [k1, k2, p1, p2, k3] (OpenCV order).  Unlike the reference,
which forces both rig cameras to share one K (src/Frame.cc:156), every
function here takes per-camera intrinsics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax


class CameraParams(NamedTuple):
    """Static rig description: per-camera intrinsics + rig extrinsics.

    `T_rc[c]` maps rig-body coordinates to camera-c coordinates (so camera 0
    has identity; for camera 1 this is `Tcam21` = inverse of the reference's
    `Tcam12` which maps cam2->cam1, cf. src/System.cc:62-72 where
    calibration.txt stores Rcam12/tcam12).
    """

    K: jnp.ndarray        # [C, 4]  fx, fy, cx, cy
    dist: jnp.ndarray     # [C, 5]  k1, k2, p1, p2, k3
    T_rc: jnp.ndarray     # [C, 4, 4] rig-body -> camera-c
    bf: jnp.ndarray       # [] or [C] baseline*fx for virtual stereo
    width: int
    height: int


def project(K: jnp.ndarray, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel coords (..., 2). No distortion."""
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    z = xc[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * xc[..., 0] * invz + cx
    v = fy * xc[..., 1] * invz + cy
    return jnp.stack([u, v], axis=-1)


def distort_normalized(dist: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_pixels(
    K: jnp.ndarray, dist: jnp.ndarray, uv: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Undistort pixel coords (..., 2) by fixed-point iteration.

    Same math as cv::undistortPoints' iterative solver (used by the reference
    at src/Frame.cc:690: undistortPoints with P=mK).
    """
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    def body(_, xn):
        k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv_radial = 1.0 / jnp.maximum(radial, 1e-6)
        return jnp.stack(
            [(xd[..., 0] - dx) * inv_radial, (xd[..., 1] - dy) * inv_radial],
            axis=-1,
        )

    xn = jax.lax.fori_loop(0, iters, body, xd)
    u = fx * xn[..., 0] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def distort_project(K: jnp.ndarray, dist: jnp.ndarray, xc: jnp.ndarray) -> jnp.ndarray:
    """Full projection: camera points -> distorted pixel coords."""
    z = xc[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = jnp.stack([xc[..., 0] * invz, xc[..., 1] * invz], axis=-1)
    xd = distort_normalized(dist, xn)
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    return jnp.stack([fx * xd[..., 0] + cx, fy * xd[..., 1] + cy], axis=-1)


def backproject(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels (..., 2) + depth (...) -> camera-frame points (..., 3).

    Reference: src/Frame.cc:1036-1052 (UnprojectStereo math).
    """
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def virtual_right_u(
    bf: jnp.ndarray, u: jnp.ndarray, depth: jnp.ndarray
) -> jnp.ndarray:
    """RGB-D virtual-stereo right x-coordinate `ur = u - bf/d`; -1 if no depth.

    Reference: src/Frame.cc:959-1034 (ComputeStereoFromRGBD).
    """
    valid = depth > 0
    safe_d = jnp.where(valid, depth, 1.0)
    return jnp.where(valid, u - bf / safe_d, -1.0)


def in_image(
    uv: jnp.ndarray, width: int, height: int, border: float = 0.0
) -> jnp.ndarray:
    """Bounds mask for pixel coords (..., 2)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= border) & (u < width - border) & (v >= border) & (v < height - border)
    )


def frustum_check(
    K: jnp.ndarray,
    Tcw: jnp.ndarray,
    pw: jnp.ndarray,
    width: int,
    height: int,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    normal: jnp.ndarray,
    view_cos_limit: float = 0.5,
):
    """Vectorized Frame::isInFrustum (reference: src/Frame.cc:443-499).

    Args:
      K: [4] intrinsics of the camera tested against.
      Tcw: [4, 4] world->camera.
      pw: [N, 3] world points.
      min_dist/max_dist: [N] scale-invariance distance bounds (0.8*min, 1.2*max
        scaling applied by the caller, as in the reference).
      normal: [N, 3] mean viewing directions.

    Returns: (mask [N], uv [N, 2], inv_z [N], dist [N], view_cos [N])
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    xc = pw @ R.T + t
    z = xc[..., 2]
    pos_z = z > 0
    uv = project(K, xc)
    inside = in_image(uv, width, height)
    Ow = -R.T @ t
    po = pw - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    in_range = (dist >= min_dist) & (dist <= max_dist)
    view_cos = jnp.sum(po * normal, axis=-1) / jnp.maximum(dist, 1e-9)
    good_view = view_cos >= view_cos_limit
    mask = pos_z & inside & in_range & good_view
    invz = 1.0 / jnp.where(pos_z, z, 1.0)
    return mask, uv, invz, dist, view_cos
