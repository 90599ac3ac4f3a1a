"""Closed-form point-set alignment (Horn / Umeyama), batched.

Serves two reference roles:
- the Sim3 hypothesis computation inside loop closing's RANSAC
  (reference: src/Sim3Solver.cc ComputeSim3, Horn's quaternion method)
- trajectory alignment for ATE evaluation
  (reference: OtherFiles/evaluate_ate.py:47-60, the acceptance metric)

Implemented with the SVD (Umeyama) formulation, which is equivalent to Horn's
closed form, batches cleanly, and maps to XLA-supported primitives.  Supports
weighted correspondences so RANSAC hypothesis batches can mask their samples.
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
):
    """Find (s, R, t) minimizing sum_i w_i || dst_i - (s R src_i + t) ||^2.

    Args:
      src, dst: (..., N, 3) corresponding points.
      weights: optional (..., N) nonnegative weights (e.g. RANSAC sample mask).
      with_scale: solve for scale (Sim3) or fix s=1 (SE3 / RGB-D fixed-scale
        mode, reference Sim3Solver `mbFixScale`, src/Sim3Solver.cc:39-70).

    Returns: (s (...,), R (..., 3, 3), t (..., 3)).
    """
    dtype = src.dtype
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    mu_src = jnp.sum(src * w, axis=-2) / wsum
    mu_dst = jnp.sum(dst * w, axis=-2) / wsum
    src_c = src - mu_src[..., None, :]
    dst_c = dst - mu_dst[..., None, :]
    # Covariance sigma = sum w dst_c src_c^T / W
    cov = jnp.einsum("...n,...ni,...nj->...ij", weights, dst_c, src_c) / wsum[..., None]
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones(src.shape[:-2] + (3,), dtype=dtype)
    S = S.at[..., 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = (U * S[..., None, :]) @ Vt
    if with_scale:
        var_src = jnp.sum(weights * jnp.sum(src_c * src_c, axis=-1), axis=-1) / wsum[..., 0]
        s = jnp.sum(D * S, axis=-1) / jnp.maximum(var_src, 1e-12)
    else:
        s = jnp.ones(src.shape[:-2], dtype=dtype)
    t = mu_dst - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_src)
    return s, R, t


def ate_rmse(est_xyz: jnp.ndarray, gt_xyz: jnp.ndarray) -> jnp.ndarray:
    """Absolute trajectory error RMSE after SE3 Horn alignment.

    Mirrors OtherFiles/evaluate_ate.py:47-60: rigid (no-scale) alignment of
    the estimated trajectory to ground truth, then RMSE of translational
    residuals.
    """
    s, R, t = umeyama(est_xyz, gt_xyz, with_scale=False)
    aligned = est_xyz @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    err = aligned - gt_xyz
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1), axis=-1))
