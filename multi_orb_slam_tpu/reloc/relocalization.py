"""Relocalization: recover tracking after loss.

Replaces `Tracking::Relocalization` (src/Tracking.cc:1967-2158): camera-0
BoW candidates from the keyframe database, brute-force descriptor matching
against each candidate's map points (SearchByBoW_cam1 analog), PnP RANSAC
for a prior-free pose, motion-only BA refinement, and a projection-search
top-up when inliers are thin (the reference's 50-inlier acceptance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, inv_sigma2_of_level
from ..frontend import frame as frame_mod
from ..geometry import camera as cam_mod
from ..mapping import map_state as ms
from ..ops import hamming, search
from ..optim import pose_opt
from ..placerec import database as db_mod, vocabulary as vocab_mod
from . import pnp

MIN_BOW_MATCHES = 15     # Tracking.cc:2030
MIN_ACCEPT_INLIERS = 50  # Tracking.cc:2144


def relocalize(
    state: ms.MapState,
    fr: frame_mod.FrameData,
    voc: vocab_mod.Vocabulary,
    db: db_mod.KeyFrameDB,
    calib: cam_mod.CameraParams,
    cfg: SlamConfig,
):
    """Try to relocalize the frame. Returns (ok, Tcw, frame_mp, n_inliers)."""
    M = cfg.max_mp
    candidates = db_mod.detect_relocalization_candidates(
        db, voc, state, fr.desc[0], fr.valid[0])
    for kf in candidates:
        # camera-0 matching against the candidate's map-point features
        kd = state.kf_desc[kf][0]
        has = (state.kf_mp[kf][0] >= 0) & state.kf_feat_valid[kf][0]
        d = hamming.pairwise_hamming(kd, fr.desc[0])
        cand = has[:, None] & fr.valid[0][None, :]
        bi, bd, b2 = hamming.masked_argmin2(d, cand)
        ok = (bd <= hamming.TH_LOW) & (
            bd.astype(jnp.float32) <= 0.75 * b2.astype(jnp.float32))
        if int(jnp.sum(ok)) < MIN_BOW_MATCHES:
            continue
        # build 2D-3D correspondences on frame features
        F = fr.valid.shape[1]
        feat_q = search.resolve_feature_conflicts(bi, bd, ok, F)
        mp_of_feat = jnp.where(
            feat_q >= 0,
            state.kf_mp[kf][0][jnp.clip(feat_q, 0, F - 1)], -1)
        matched = (mp_of_feat >= 0) & state.mp_valid[
            jnp.clip(mp_of_feat, 0, M - 1)]
        uv = fr.xy_und[0]
        Xw = state.mp_pos[jnp.clip(mp_of_feat, 0, M - 1)]
        Tcw0, inl, n_inl = pnp.pnp_ransac(
            jax.random.PRNGKey(int(kf)), uv, Xw, matched, calib.K[0])
        if int(n_inl) < 10:
            continue
        # motion-only BA on the PnP inliers
        C = cfg.n_cams
        frame_mp = jnp.full((C, F), -1, jnp.int32)
        frame_mp = frame_mp.at[0].set(jnp.where(matched & inl, mp_of_feat, -1))
        pw = state.mp_pos[jnp.clip(frame_mp, 0, M - 1)]
        cam_idx = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[:, None], (C, F))
        uvr = jnp.concatenate([fr.xy_und, fr.uright[..., None]], -1)
        obs = pose_opt.PoseObs(
            pw=pw.reshape(C * F, 3),
            uvr=uvr.reshape(C * F, 3),
            cam_idx=cam_idx.reshape(C * F),
            inv_sigma2=inv_sigma2_of_level(fr.level, cfg).reshape(C * F),
            mask=(frame_mp >= 0).reshape(C * F),
        )
        Tcw, inlier, n = pose_opt.optimize_pose(
            Tcw0, obs, calib.T_rc, calib.K, calib.bf)
        if int(n) < 10:
            continue
        frame_mp = jnp.where(inlier.reshape(C, F), frame_mp, -1)
        # projection-search top-up around the recovered pose
        # (Tracking.cc:2090-2130: SearchByProjection with th=10)
        own = state.kf_mp[kf].reshape(-1)
        local_mask = jnp.zeros(M, bool).at[
            jnp.where(own >= 0, own, M - 1)].max(own >= 0)
        local_mask = local_mask & state.mp_valid
        pts = search.gather_local_points(state, local_mask, cfg.local_cap)
        add_mp, _ = search.search_points_in_frame(
            pts, fr.xy_und, fr.uright, fr.level, fr.desc, fr.valid,
            frame_mp >= 0, Tcw, calib.T_rc, calib.K, calib.bf,
            cfg.width, cfg.height, cfg.scale_factor, cfg.n_levels,
            th_radius=10.0, nn_ratio=1.0, use_view_cos=False,
        )
        merged = jnp.where(frame_mp >= 0, frame_mp, add_mp)
        pw = state.mp_pos[jnp.clip(merged, 0, M - 1)]
        obs = obs._replace(
            pw=pw.reshape(C * F, 3), mask=(merged >= 0).reshape(C * F))
        Tcw, inlier, n = pose_opt.optimize_pose(
            Tcw, obs, calib.T_rc, calib.K, calib.bf)
        if int(n) >= MIN_ACCEPT_INLIERS:
            frame_mp = jnp.where(inlier.reshape(C, F), merged, -1)
            return True, Tcw, frame_mp, int(n)
    return False, None, None, 0
