"""Sim3 RANSAC between two keyframes, batched hypotheses.

Replaces `Sim3Solver` (src/Sim3Solver.cc): the reference iterates 5
hypotheses at a time with Horn's closed form and a camera-aware reprojection
inlier check (points stored in cam1 coordinates, cam2 points projected
through mRcam21/mtcam21, Sim3Solver.cc:460-490).  Here all hypotheses are
generated and scored in ONE batch (SURVEY.md §7.3: convert RANSAC loops to
fixed-size batched hypothesis scoring), using weighted Umeyama instead of
Horn's quaternion method (equivalent closed forms).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import align, camera as cam_mod, sim3


@partial(jax.jit, static_argnums=(8, 9, 10))
def solve_sim3_ransac(
    key: jnp.ndarray,
    pts_a: jnp.ndarray,     # [N, 3] matched points in frame-a rig coords
    pts_b: jnp.ndarray,     # [N, 3] same landmarks in frame-b rig coords
    cam_a: jnp.ndarray,     # [N] camera id of the observation in a
    cam_b: jnp.ndarray,     # [N] camera id in b
    valid: jnp.ndarray,     # [N]
    T_rc: jnp.ndarray,      # [C, 4, 4]
    K: jnp.ndarray,         # [C, 4]
    n_hyp: int = 128,
    fix_scale: bool = True,
    sigma2_px: float = 10.0,
):
    """Returns (g_ab [8] Sim3 mapping b->a, inlier_mask [N], n_inliers).

    Inlier check: both-direction reprojection error below th2 per point
    (reference CheckInliers uses 9.210*sigma2 per view; we use a fixed px^2
    threshold scaled by `sigma2_px`).
    """
    N = pts_a.shape[0]
    # random triples per hypothesis
    keys = jax.random.split(key, n_hyp)
    # sample indices among valid entries: use gumbel-top-3 over validity
    def sample3(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        _, idx = jax.lax.top_k(g, 3)
        return idx
    tri = jax.vmap(sample3)(keys)  # [H, 3]

    src = pts_b[tri]  # [H, 3, 3]
    dst = pts_a[tri]
    s, R, t = align.umeyama(src, dst, with_scale=not fix_scale)
    g = sim3.pack(s, R, t)  # [H, 8] b -> a

    # score hypotheses: project transferred points into the observing camera
    def reproj_err(g_ab, X_src, cam_dst, uv_ref):
        # transform source landmarks into dst rig frame, project into the
        # observing camera of dst
        Xd = sim3.apply(g_ab[None, :].repeat(N, 0), X_src)
        Trc = T_rc[cam_dst]
        Xc = jnp.einsum("nij,nj->ni", Trc[:, :3, :3], Xd) + Trc[:, :3, 3]
        uv = cam_mod.project(K[cam_dst], Xc)
        ok_z = Xc[:, 2] > 0.05
        return jnp.sum((uv - uv_ref) ** 2, -1), ok_z

    # reference projections of the original observations
    def cam_uv(X, cams):
        Trc = T_rc[cams]
        Xc = jnp.einsum("nij,nj->ni", Trc[:, :3, :3], X) + Trc[:, :3, 3]
        return cam_mod.project(K[cams], Xc)

    uv_a = cam_uv(pts_a, cam_a)
    uv_b = cam_uv(pts_b, cam_b)
    th2 = 9.210 * sigma2_px

    def score(g_ab):
        e_ab, oka = reproj_err(g_ab, pts_b, cam_a, uv_a)
        g_ba = sim3.inverse(g_ab)
        e_ba, okb = reproj_err(g_ba, pts_a, cam_b, uv_b)
        inl = valid & (e_ab < th2) & (e_ba < th2) & oka & okb
        return jnp.sum(inl.astype(jnp.int32)), inl

    n_inl, inls = jax.vmap(score)(g)
    best = jnp.argmax(n_inl)
    g_best = g[best]
    inl_best = inls[best]
    # refine on all inliers (closed form again)
    w = inl_best.astype(jnp.float32)
    s2, R2, t2 = align.umeyama(pts_b, pts_a, weights=w,
                               with_scale=not fix_scale)
    g_ref = sim3.pack(s2, R2, t2)
    n2, inl2 = score(g_ref)
    better = n2 >= n_inl[best]
    g_out = jnp.where(better, g_ref, g_best)
    inl_out = jnp.where(better, inl2, inl_best)
    return g_out, inl_out, jnp.maximum(n2, n_inl[best])
