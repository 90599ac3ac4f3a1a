"""New map-point triangulation between covisible keyframes.

Replaces `LocalMapping::CreateNewMapPoints` (src/LocalMapping.cc:272-697) +
`ORBmatcher::SearchForTriangulation` (src/ORBmatcher.cc:1364-1590):

- candidate pairs: unmatched features of the new KF vs a covisible neighbor,
  same camera only (the reference skips camIdx1 != camIdx2 pairs,
  ORBmatcher.cc:1548-1551), gated by the epipolar distance in the second
  view (CheckDistEpipolarLine, ORBmatcher.cc:1662-1680)
- rays triangulated by the closed-form two-ray midpoint (equal capability to
  the reference's SVD DLT, LocalMapping.cc:472-484, but batched without a
  [N,4,4] SVD)
- acceptance: positive depth in both views, reprojection chi2 under
  5.991*sigma2 (stereo rows 7.815), and scale-consistency of the two
  observation distances (LocalMapping.cc:560-650)

One call processes one (new KF, neighbor) pair; the host loops over the
top-k covisible neighbors reusing the same compiled function.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SlamConfig, inv_sigma2_of_level
from ..geometry import camera as cam_mod
from ..geometry import se3
from ..ops import hamming
from . import map_state as ms


def _fundamental(K1, K2, T12):
    """F12 mapping points in view 1 to epipolar lines in view 2... actually
    x2^T F21 x1 = 0 with T21 = T12^-1. We build F s.t. line2 = F @ x1h."""
    R = T12[:3, :3]
    t = T12[:3, 3]
    # x1 = R x2 + t  =>  x2^T (R^T [t]x) x1... use E21 = [t]x R with x2 = T21 x1
    T21 = se3.inverse(T12)
    R21 = T21[:3, :3]
    t21 = T21[:3, 3]
    E = se3.hat(t21) @ R21
    K1i = jnp.array(
        [[1.0 / K1[0], 0, -K1[2] / K1[0]],
         [0, 1.0 / K1[1], -K1[3] / K1[1]],
         [0, 0, 1.0]], K1.dtype)
    K2i = jnp.array(
        [[1.0 / K2[0], 0, -K2[2] / K2[0]],
         [0, 1.0 / K2[1], -K2[3] / K2[1]],
         [0, 0, 1.0]], K2.dtype)
    return K2i.T @ E @ K1i


def _ray_midpoint(o1, d1, o2, d2):
    """Midpoint of common perpendicular of rays o + s*d. Returns (X, s1, s2)."""
    # solve [d1.d1  -d1.d2; d1.d2  -d2.d2] [s1; s2] = [ (o2-o1).d1 ; (o2-o1).d2 ]
    r = o2 - o1
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    d = jnp.sum(r * d1, -1)
    e = jnp.sum(r * d2, -1)
    den = a * c - b * b
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    s1 = (c * d - b * e) / den
    s2 = (b * d - a * e) / den
    X1 = o1 + s1[..., None] * d1
    X2 = o2 + s2[..., None] * d2
    return 0.5 * (X1 + X2), s1, s2


@partial(jax.jit, static_argnums=(3,))
def triangulate_pair(
    state: ms.MapState,
    kf_a: jnp.ndarray,
    kf_b: jnp.ndarray,
    cfg: SlamConfig,
    calib: cam_mod.CameraParams,
):
    """Create new map points from unmatched feature pairs of two keyframes."""
    C = cfg.n_cams
    F = cfg.max_feat
    M = cfg.max_mp
    Ta = state.kf_Tcw[kf_a]
    Tb = state.kf_Tcw[kf_b]

    new_mp_a = jnp.full((C, F), -1, jnp.int32)
    new_mp_b = jnp.full((C, F), -1, jnp.int32)
    all_pw = []
    all_ok = []
    all_pair = []  # (cam, fa, fb)

    for c in range(C):
        T1 = calib.T_rc[c] @ Ta  # world -> cam c of kf_a
        T2 = calib.T_rc[c] @ Tb
        K1 = calib.K[c]
        T_ab = T1 @ se3.inverse(T2)  # cam_b -> cam_a
        # F such that xb^T F xa = 0 (lines in view b for points in view a)
        F12 = _fundamental(K1, K1, T_ab)

        free_a = state.kf_feat_valid[kf_a, c] & (state.kf_mp[kf_a, c] < 0)
        free_b = state.kf_feat_valid[kf_b, c] & (state.kf_mp[kf_b, c] < 0)
        xa = state.kf_xy_und[kf_a, c]  # [F, 2]
        xb = state.kf_xy_und[kf_b, c]
        xah = jnp.concatenate([xa, jnp.ones((F, 1))], -1)
        xbh = jnp.concatenate([xb, jnp.ones((F, 1))], -1)
        lines = xah @ F12.T  # [F, 3] epipolar lines in view b
        # distance of each b-feature from each a-line
        num = jnp.abs(lines @ xbh.T)  # [F, F]
        den = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2 + 1e-12)[:, None]
        dist_epi = num / den
        sigma2_b = cfg.scale_factor ** (
            2.0 * state.kf_level[kf_b, c].astype(jnp.float32))
        epi_ok = dist_epi < 3.84 * jnp.sqrt(sigma2_b)[None, :]

        cand = free_a[:, None] & free_b[None, :] & epi_ok
        d = hamming.pairwise_hamming(state.kf_desc[kf_a, c], state.kf_desc[kf_b, c])
        bi, bd, b2 = hamming.masked_argmin2(d, cand)
        ok = (bd <= hamming.TH_LOW) & (
            bd.astype(jnp.float32) <= 0.9 * b2.astype(jnp.float32))
        # mutual best for stability
        d_masked = jnp.where(cand, d, hamming.BIG)
        best_back = jnp.argmin(d_masked, axis=0)
        ok = ok & (best_back[bi] == jnp.arange(F))
        if cfg.tri_rotation_check:
            # rotation consistency: the reference histograms the per-match
            # orientation difference and keeps the top-3 bins
            # (SearchForTriangulation, src/ORBmatcher.cc:1380-1388,
            # 1540-1565).  Optional here — see SlamConfig.tri_rotation_check
            # for the measured tradeoff.
            delta = state.kf_angle[kf_a, c] - state.kf_angle[kf_b, c][bi]
            ok = hamming.rotation_histogram_filter(delta, ok)

        # triangulate a-feature with its matched b-feature
        fb = bi
        Twc1 = se3.inverse(T1)
        Twc2 = se3.inverse(T2)
        o1 = Twc1[:3, 3]
        o2 = Twc2[:3, 3]
        r1 = cam_mod.backproject(K1, xa, jnp.ones(F))  # unit-depth dirs cam
        r2 = cam_mod.backproject(K1, xb[fb], jnp.ones(F))
        d1w = r1 @ Twc1[:3, :3].T
        d2w = r2 @ Twc2[:3, :3].T
        X, s1, s2 = _ray_midpoint(o1[None], d1w, o2[None], d2w)

        # parallax gate: rays must not be near-parallel
        cosp = jnp.sum(d1w * d2w, -1) / jnp.maximum(
            jnp.linalg.norm(d1w, axis=-1) * jnp.linalg.norm(d2w, axis=-1), 1e-9)
        good_par = cosp < 0.9998

        # depth positivity + reprojection checks in both views
        Xc1 = se3.transform_points(T1, X)
        Xc2 = se3.transform_points(T2, X)
        z_ok = (Xc1[:, 2] > 0.05) & (Xc2[:, 2] > 0.05)
        uv1 = cam_mod.project(K1, Xc1)
        uv2 = cam_mod.project(K1, Xc2)
        s2a = cfg.scale_factor ** (2.0 * state.kf_level[kf_a, c].astype(jnp.float32))
        e1 = jnp.sum((uv1 - xa) ** 2, -1)
        e2 = jnp.sum((uv2 - xb[fb]) ** 2, -1)
        rp_ok = (e1 <= 5.991 * s2a) & (e2 <= 5.991 * sigma2_b[fb])

        # scale consistency (LocalMapping.cc:560-650)
        d1n = jnp.linalg.norm(X - o1[None], axis=-1)
        d2n = jnp.linalg.norm(X - o2[None], axis=-1)
        ratio = d1n / jnp.maximum(d2n, 1e-9)
        lvl_a = state.kf_level[kf_a, c].astype(jnp.float32)
        lvl_b = state.kf_level[kf_b, c][fb].astype(jnp.float32)
        ratio_octave = cfg.scale_factor ** (lvl_a - lvl_b)
        rf = cfg.scale_factor * 1.5
        sc_ok = (ratio < ratio_octave * rf) & (ratio > ratio_octave / rf)

        ok = ok & good_par & z_ok & rp_ok & sc_ok
        all_pw.append(X)
        all_ok.append(ok)
        all_pair.append(fb)

    pw = jnp.concatenate(all_pw)          # [C*F, 3]
    want = jnp.concatenate(all_ok)        # [C*F]
    fb_all = jnp.concatenate(all_pair)    # [C*F]

    slots = ms.allocate_mp_slots(state.mp_valid, want)
    created = slots >= 0
    n_failed = jnp.sum((want & ~created).astype(jnp.int32))
    cgrid = created.reshape(C, F)
    sgrid = slots.reshape(C, F)
    fbgrid = fb_all.reshape(C, F)

    # write observations into both KFs
    kf_mp_a = state.kf_mp[kf_a]
    kf_mp_a = jnp.where(cgrid, sgrid, kf_mp_a)
    kf_mp_b = state.kf_mp[kf_b]
    # scatter per camera: feature fb of kf_b gets the new id
    for c in range(C):
        kf_mp_b = kf_mp_b.at[c, jnp.where(cgrid[c], fbgrid[c], F - 1)].set(
            jnp.where(cgrid[c], sgrid[c], kf_mp_b[c, jnp.where(cgrid[c], fbgrid[c], F - 1)])
        )
    kf_mp = state.kf_mp.at[kf_a].set(kf_mp_a).at[kf_b].set(kf_mp_b)

    # new point attributes
    tgt = jnp.where(created, slots, M - 1)
    put = created
    desc_flat = state.kf_desc[kf_a].reshape(-1, 8)
    Ow_a = se3.camera_center(Ta)
    po = pw - Ow_a[None]
    distn = jnp.linalg.norm(po, axis=-1)
    normal = po / jnp.maximum(distn[:, None], 1e-9)
    lvl_flat = state.kf_level[kf_a].reshape(-1)
    min_d, max_d = ms.scale_range_from_obs(
        distn, lvl_flat, cfg.scale_factor, cfg.n_levels)

    new_state = state._replace(
        kf_mp=kf_mp,
        mp_pos=state.mp_pos.at[tgt].set(jnp.where(put[:, None], pw, state.mp_pos[tgt])),
        mp_valid=state.mp_valid.at[tgt].set(put | state.mp_valid[tgt]),
        mp_desc=state.mp_desc.at[tgt].set(
            jnp.where(put[:, None], desc_flat, state.mp_desc[tgt])),
        mp_descbuf=state.mp_descbuf.at[tgt, 0].set(
            jnp.where(put[:, None], desc_flat, state.mp_descbuf[tgt, 0])),
        mp_descbuf_n=state.mp_descbuf_n.at[tgt].set(
            jnp.where(put, 1, state.mp_descbuf_n[tgt])),
        mp_normal=state.mp_normal.at[tgt].set(
            jnp.where(put[:, None], normal, state.mp_normal[tgt])),
        mp_min_dist=state.mp_min_dist.at[tgt].set(
            jnp.where(put, min_d, state.mp_min_dist[tgt])),
        mp_max_dist=state.mp_max_dist.at[tgt].set(
            jnp.where(put, max_d, state.mp_max_dist[tgt])),
        mp_first_kf=state.mp_first_kf.at[tgt].set(
            jnp.where(put, kf_a, state.mp_first_kf[tgt])),
        mp_first_frame=state.mp_first_frame.at[tgt].set(
            jnp.where(put, state.kf_frame_id[kf_a], state.mp_first_frame[tgt])),
        mp_visible=state.mp_visible.at[tgt].set(jnp.where(put, 1, state.mp_visible[tgt])),
        mp_found=state.mp_found.at[tgt].set(jnp.where(put, 1, state.mp_found[tgt])),
        n_mp=state.n_mp + jnp.sum(created.astype(jnp.int32)),
        n_alloc_failed=state.n_alloc_failed + n_failed,
    )
    return new_state, jnp.sum(created.astype(jnp.int32))


@partial(jax.jit, static_argnums=(3, 4))
def triangulate_new_points(
    state: ms.MapState, kf_slot, calib: cam_mod.CameraParams, cfg: SlamConfig,
    n_neighbors: int = 5,
):
    """Triangulate against the top covisible neighbors — ONE dispatch.

    The neighbor top-k runs on device and the per-pair triangulations are a
    lax.scan, so the whole CreateNewMapPoints pass costs zero host round
    trips (round-1 did a device_get of the covisibility row plus one
    dispatch per neighbor).  Empty neighbor ranks map to the reserved dummy
    keyframe slot K-1, whose features are never valid — a guaranteed no-op.
    """
    K = state.kf_mp.shape[0]
    W = ms.covisibility(state)
    w, nbrs = jax.lax.top_k(W[kf_slot], n_neighbors)
    slots = jnp.where(w > 0, nbrs, K - 1).astype(jnp.int32)
    kf_slot = jnp.asarray(kf_slot, jnp.int32)

    def step(st, kn):
        st2, n = triangulate_pair(st, kf_slot, kn, cfg, calib)
        return st2, n

    state, ns = jax.lax.scan(step, state, slots)
    return state, jnp.sum(ns)
