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

from ..geometry import align, camera as cam_mod, se3, sim3
from ..mapping import map_state as ms
from ..ops import hamming


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


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def search_by_sim3(
    state: "ms.MapState",
    kf_a: jnp.ndarray,       # scalar int32 keyframe slot
    kf_b: jnp.ndarray,
    g_ab: jnp.ndarray,       # [8] Sim3 mapping b-rig -> a-rig
    K0: jnp.ndarray,         # [4] camera-0 intrinsics
    max_mp: int,
    scale_factor: float,
    n_levels: int,
    th: float = 7.5,
):
    """Match-producing guided search between two keyframes under a Sim3.

    Replaces `ORBmatcher::SearchBySim3[_cam1]` (src/ORBmatcher.cc:2814-3135):
    project each keyframe's landmarks into the other through g_ab, gate by a
    scale-predicted window and pyramid level, take the best Hamming match,
    and keep mutually-agreeing pairs.  Both directions share ONE [F, F]
    landmark-descriptor distance matrix; the direction-specific window masks
    are the only asymmetry.

    Returns match_ab [F] int32: for each feature of kf_a (with a landmark),
    the matched feature index of kf_b, or -1.
    """
    F = state.kf_mp.shape[2]
    M = max_mp
    sf = jnp.asarray([scale_factor ** l for l in range(n_levels)],
                     jnp.float32)

    mpa = state.kf_mp[kf_a][0]
    mpb = state.kf_mp[kf_b][0]
    va = (mpa >= 0) & state.kf_feat_valid[kf_a][0]
    vb = (mpb >= 0) & state.kf_feat_valid[kf_b][0]
    ga = jnp.clip(mpa, 0, M - 1)
    gb = jnp.clip(mpb, 0, M - 1)
    va = va & state.mp_valid[ga]
    vb = vb & state.mp_valid[gb]

    Ta = state.kf_Tcw[kf_a]
    Tb = state.kf_Tcw[kf_b]
    Xa = se3.transform_points(Ta, state.mp_pos[ga])   # a landmarks, a-rig
    Xb = se3.transform_points(Tb, state.mp_pos[gb])   # b landmarks, b-rig
    Xb_in_a = sim3.apply(g_ab, Xb)
    Xa_in_b = sim3.apply(sim3.inverse(g_ab), Xa)

    def project(X):
        z = jnp.maximum(X[:, 2], 1e-6)
        uv = jnp.stack([K0[0] * X[:, 0] / z + K0[2],
                        K0[1] * X[:, 1] / z + K0[3]], -1)
        return uv, X[:, 2] > 0.05

    uv_b_in_a, okz_ba = project(Xb_in_a)
    uv_a_in_b, okz_ab = project(Xa_in_b)

    # landmark descriptor distance matrix, shared by both directions:
    # rows = a landmarks, cols = b landmarks
    d = hamming.pairwise_hamming(state.mp_desc[ga], state.mp_desc[gb])

    xy_a = state.kf_xy_und[kf_a][0]
    xy_b = state.kf_xy_und[kf_b][0]
    lvl_a = state.kf_level[kf_a][0]
    lvl_b = state.kf_level[kf_b][0]

    # direction b->a: b landmarks vs a features
    dist_ba = jnp.linalg.norm(Xb_in_a, axis=-1)
    lvl_ba = ms.predict_scale(dist_ba, state.mp_max_dist[gb],
                              scale_factor, n_levels)
    r_ba = th * sf[lvl_ba]
    win_ba = (
        (jnp.abs(uv_b_in_a[:, 0, None] - xy_a[None, :, 0]) < r_ba[:, None])
        & (jnp.abs(uv_b_in_a[:, 1, None] - xy_a[None, :, 1]) < r_ba[:, None])
        & (lvl_a[None, :] >= lvl_ba[:, None] - 1)
        & (lvl_a[None, :] <= lvl_ba[:, None])
        & (vb & okz_ba)[:, None] & va[None, :]
    )  # [F_b, F_a]
    d_ba = jnp.where(win_ba, d.T, hamming.BIG)
    best_a_of_b = jnp.argmin(d_ba, axis=1)               # [F_b] -> a index
    bd_ba = jnp.min(d_ba, axis=1)
    ok_ba = bd_ba <= hamming.TH_HIGH

    # direction a->b: a landmarks vs b features
    dist_ab = jnp.linalg.norm(Xa_in_b, axis=-1)
    lvl_ab = ms.predict_scale(dist_ab, state.mp_max_dist[ga],
                              scale_factor, n_levels)
    r_ab = th * sf[lvl_ab]
    win_ab = (
        (jnp.abs(uv_a_in_b[:, 0, None] - xy_b[None, :, 0]) < r_ab[:, None])
        & (jnp.abs(uv_a_in_b[:, 1, None] - xy_b[None, :, 1]) < r_ab[:, None])
        & (lvl_b[None, :] >= lvl_ab[:, None] - 1)
        & (lvl_b[None, :] <= lvl_ab[:, None])
        & (va & okz_ab)[:, None] & vb[None, :]
    )  # [F_a, F_b]
    d_ab = jnp.where(win_ab, d, hamming.BIG)
    best_b_of_a = jnp.argmin(d_ab, axis=1)               # [F_a] -> b index
    bd_ab = jnp.min(d_ab, axis=1)
    ok_ab = bd_ab <= hamming.TH_HIGH

    # mutual agreement (reference: vnMatch1[i1]==i2 && vnMatch2[i2]==i1)
    ja = jnp.arange(F)
    jb = best_b_of_a
    agree = ok_ab & ok_ba[jb] & (best_a_of_b[jb] == ja)
    return jnp.where(agree, jb, -1)
