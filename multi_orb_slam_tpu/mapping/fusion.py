"""Map-point fusion between covisible keyframes.

Replaces `LocalMapping::SearchInNeighbors` + `ORBmatcher::Fuse`
(src/LocalMapping.cc:700-792, src/ORBmatcher.cc:1986-2191): project map
points into a target keyframe's cameras; where a projected point lands on a
feature that already observes another point, merge the two (keep the one
with more observations, reference MapPoint::Replace src/MapPoint.cc:258-296);
where it lands on a free feature, add the observation.

All cameras are searched at once (the reference projects into both cameras
sequentially, ORBmatcher.cc:2030-2158).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam_mod
from ..ops import search
from . import map_state as ms


@partial(jax.jit, static_argnums=(3,))
def fuse_into_kf(
    state: ms.MapState,
    src_mask: jnp.ndarray,     # [M] candidate map points to project
    kf_t: jnp.ndarray,         # target keyframe slot
    cfg: SlamConfig,
    calib: cam_mod.CameraParams,
):
    """Project masked points into keyframe kf_t; add observations / merge."""
    M = cfg.max_mp
    K, C, F = state.kf_mp.shape
    pts = search.gather_local_points(state, src_mask & state.mp_valid, cfg.local_cap)
    # match against the KF's feature arrays (same layout as a frame);
    # frame_taken=False so already-matched features participate (merges)
    match_mp, _ = search.search_points_in_frame(
        pts,
        state.kf_xy_und[kf_t], state.kf_uright[kf_t], state.kf_level[kf_t],
        state.kf_desc[kf_t], state.kf_feat_valid[kf_t],
        jnp.zeros((C, F), bool),
        state.kf_Tcw[kf_t], calib.T_rc, calib.K, calib.bf,
        cfg.width, cfg.height, cfg.scale_factor, cfg.n_levels,
        th_radius=3.0, nn_ratio=1.0,  # Fuse has no ratio test (TH_LOW only)
        th_hamming=50, use_view_cos=True,
    )
    cur_mp = state.kf_mp[kf_t]                     # [C, F]
    new_obs = (match_mp >= 0) & (cur_mp < 0)
    conflict = (match_mp >= 0) & (cur_mp >= 0) & (match_mp != cur_mp)

    # --- add observations on free features ---
    kf_mp_row = jnp.where(new_obs, match_mp, cur_mp)
    kf_mp = state.kf_mp.at[kf_t].set(kf_mp_row)

    # --- merge conflicting pairs: loser -> winner by observation count ---
    # Winner by a STRICT total order (obs count, then lower slot id): both
    # orientations of the same pair agree, so no merge cycles can form.
    obs_cnt = ms.mp_weighted_obs(state)
    a = jnp.where(conflict, match_mp, 0)
    b = jnp.where(conflict, cur_mp, 0)
    key = obs_cnt * M + (M - jnp.arange(M, dtype=jnp.int32))
    a_wins = key[a] > key[b]
    winner = jnp.where(a_wins, a, b)
    loser = jnp.where(a_wins, b, a)
    replace = jnp.arange(M, dtype=jnp.int32)
    cfl = conflict.reshape(-1)
    lfl = jnp.where(conflict, loser, M - 1).reshape(-1)
    wfl = jnp.where(cfl, winner.reshape(-1), replace[lfl])
    replace = replace.at[lfl].set(jnp.where(cfl, wfl, replace[lfl]))
    # path compression: chains (c->b->a) terminate because edges strictly
    # increase the order key (DAG); 4 halvings cover depth 16
    for _ in range(4):
        replace = replace[replace]
    # apply replacement over the whole observation store, then erase
    # observations the remap made redundant: a (KF, camera) row must keep
    # at most ONE feature per landmark, preferring the feature that already
    # observed the winner over a remapped loser (MapPoint::Replace erases
    # exactly these, src/MapPoint.cc:258-296 — keeping an arbitrary
    # duplicate leaves wrong-pixel observations that drag points in BA)
    kf_mp_new = jnp.where(kf_mp >= 0, replace[jnp.clip(kf_mp, 0, M - 1)],
                          kf_mp)
    kf_mp = ms.dedupe_obs_rows(kf_mp_new, prefer_keep=(kf_mp_new == kf_mp))
    # losers die; their found/visible counters roll into the final winner
    is_loser = replace != jnp.arange(M, dtype=jnp.int32)
    wfin = replace[lfl]
    mp_found = state.mp_found.at[jnp.where(cfl, wfin, M - 1)].add(
        jnp.where(cfl, state.mp_found[lfl], 0))
    mp_visible = state.mp_visible.at[jnp.where(cfl, wfin, M - 1)].add(
        jnp.where(cfl, state.mp_visible[lfl], 0))
    mp_valid = state.mp_valid & ~is_loser

    n_merged = jnp.sum(is_loser.astype(jnp.int32))
    # forward pointers so stale frame matches can be redirected
    # (MapPoint::Replace keeps mpReplaced, src/MapPoint.cc:258-296)
    mp_replaced = jnp.where(is_loser, replace, state.mp_replaced)
    return state._replace(
        kf_mp=kf_mp, mp_valid=mp_valid,
        mp_found=mp_found, mp_visible=mp_visible,
        mp_replaced=mp_replaced,
        n_mp=state.n_mp - n_merged,
    ), n_merged


@partial(jax.jit, static_argnums=(3,))
def fuse_into_kfs(
    state: ms.MapState,
    src_mask: jnp.ndarray,     # [M] candidate map points to project
    kf_slots: jnp.ndarray,     # [Kc] int32 target slots; pad with K-1
    cfg: SlamConfig,
    calib: cam_mod.CameraParams,
):
    """Fuse masked points into a BATCH of keyframes in one dispatch.

    lax.scan over the slot batch keeps the sequential merge semantics of
    per-KF fusion (later targets see earlier merges) while costing one
    device round trip instead of Kc.  Padding entries use the reserved
    dummy slot K-1, whose features are never valid — a guaranteed no-op.
    Used by loop closing to fuse loop landmarks across the WHOLE corrected
    neighborhood (reference SearchAndFuse, src/LoopClosing.cc:824-856).
    """

    def step(st, slot):
        st2, n = fuse_into_kf(st, src_mask, slot, cfg, calib)
        return st2, n

    state, ns = jax.lax.scan(step, state, kf_slots)
    return state, jnp.sum(ns)


@partial(jax.jit, static_argnums=(3, 4))
def fuse_neighbors(
    state: ms.MapState, kf_slot, calib: cam_mod.CameraParams, cfg: SlamConfig,
    n_neighbors: int = 5,
):
    """Two-direction fusion with the top covisible neighbors — ONE dispatch.

    Reference SearchInNeighbors: current KF's points into neighbors, then
    neighbors' points into the current KF (src/LocalMapping.cc:700-792).
    Neighbor top-k and both directions run on device (round-1 pulled the
    covisibility row to host and dispatched per neighbor); empty ranks map
    to the reserved no-op dummy slot K-1.
    """
    M = cfg.max_mp
    K = state.kf_mp.shape[0]
    W = ms.covisibility(state)
    w, nbrs = jax.lax.top_k(W[kf_slot], n_neighbors)
    ok = w > 0
    slots = jnp.where(ok, nbrs, K - 1).astype(jnp.int32)
    kf_slot = jnp.asarray(kf_slot, jnp.int32)

    # direction 1: this KF's points into each neighbor (sequential scan —
    # later fuses see earlier merges, like the reference's serial loop)
    own = state.kf_mp[kf_slot].reshape(-1)
    own_mask = jnp.zeros(M, bool).at[
        jnp.where(own >= 0, own, M - 1)].max(own >= 0)
    state, n1 = fuse_into_kfs(state, own_mask, slots, cfg, calib)

    # direction 2: neighbors' points into this KF
    rows = state.kf_mp[slots].reshape(n_neighbors, -1)  # dummy rows all -1
    rows_ok = (rows >= 0) & ok[:, None]
    neigh_mask = jnp.zeros(M, bool).at[
        jnp.where(rows_ok, rows, M - 1).reshape(-1)].max(rows_ok.reshape(-1))
    state, n2 = fuse_into_kf(state, neigh_mask, kf_slot, cfg, calib)
    return state, n1 + n2
