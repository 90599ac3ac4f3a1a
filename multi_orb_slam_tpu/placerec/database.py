"""Keyframe database: BoW store + loop / relocalization candidate detection.

Replaces `KeyFrameDatabase` (src/KeyFrameDatabase.cc): the inverted-file
share-word counting + scoring pipeline becomes dense linear algebra over a
[K, n_words] BoW matrix — one matvec scores a query against every keyframe.

The reference keeps two inverted files (all-camera and cam1-only,
include/KeyFrameDatabase.h:68-69) and its loop path only ever uses the
cam1-only one (LoopClosing.cc:140,180,277); we store the camera-0 BoW for
loop detection, matching that behavior, plus the all-camera BoW for
relocalization parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..mapping import map_state as ms
from . import vocabulary as vocab_mod


class KeyFrameDB(NamedTuple):
    bow_cam0: jnp.ndarray    # [K, W] camera-0 BoW per keyframe slot
    bow_all: jnp.ndarray     # [K, W] all-camera BoW
    has_bow: jnp.ndarray     # [K] bool


def make_empty_db(max_kf: int, n_words: int) -> KeyFrameDB:
    return KeyFrameDB(
        bow_cam0=jnp.zeros((max_kf, n_words), jnp.float32),
        bow_all=jnp.zeros((max_kf, n_words), jnp.float32),
        has_bow=jnp.zeros(max_kf, bool),
    )


def add_keyframe(
    db: KeyFrameDB, voc: vocab_mod.Vocabulary, state: ms.MapState, kf_slot,
) -> KeyFrameDB:
    """KeyFrameDatabase::add / add_cam1 (KeyFrameDatabase.cc:43-58)."""
    desc = state.kf_desc[kf_slot]          # [C, F, 8]
    valid = state.kf_feat_valid[kf_slot]
    v0 = vocab_mod.bow_vector(voc, desc[0], valid[0])
    va = vocab_mod.bow_vector(
        voc, desc.reshape(-1, 8), valid.reshape(-1))
    return KeyFrameDB(
        bow_cam0=db.bow_cam0.at[kf_slot].set(v0),
        bow_all=db.bow_all.at[kf_slot].set(va),
        has_bow=db.has_bow.at[kf_slot].set(True),
    )


def remove_keyframe(db: KeyFrameDB, kf_slot) -> KeyFrameDB:
    return db._replace(has_bow=db.has_bow.at[kf_slot].set(False))


def detect_loop_candidates(
    db: KeyFrameDB,
    state: ms.MapState,
    query_kf: int,
    min_score: float,
    n_candidates: int = 10,
) -> list:
    """DetectLoopCandidates_cam1 (reference KeyFrameDatabase.cc:119-267).

    The reference pipeline: share-word gate (0.8 * maxCommonWords) -> score
    >= minScore -> covisibility-group accumulated score -> keep groups above
    0.75 * bestAccScore.  Dense equivalent: score all KFs at once, exclude
    covisibility-connected ones, accumulate scores over each candidate's
    covisibility group, threshold.
    Host-side (returns python list of slots): runs once per keyframe.
    """
    q = db.bow_cam0[query_kf]
    scores = np.asarray(db.bow_cam0 @ q)  # [K] L2-ish... use L1 pair score
    # L1 score needs |a-b|; do it exactly for the shortlist below
    K = scores.shape[0]
    has = np.asarray(db.has_bow & state.kf_valid).copy()
    has[query_kf] = False
    # exclude covisibility-connected keyframes (weight >= 15)
    W = np.asarray(ms.covisibility(state, cam0_only=True))
    connected = W[query_kf] >= 15.0
    cand_mask = has & ~connected
    if not cand_mask.any():
        return []
    # exact L1 scores for masked candidates
    l1 = np.asarray(vocab_mod.score_l1(db.bow_cam0, q))
    l1 = np.where(cand_mask, l1, -1.0)
    ok = l1 >= min_score
    if not ok.any():
        return []
    # accumulate over covisibility groups (top-10 covis of each candidate)
    acc = np.full(K, -1.0, np.float32)
    best_of_group = np.arange(K).copy()
    for k in np.nonzero(ok)[0]:
        group = np.argsort(-W[k])[:10]
        group = group[W[k][group] > 0]
        members = [k] + [g for g in group if ok[g]]
        sc = sum(float(l1[m]) for m in members)
        best = max(members, key=lambda m: l1[m])
        acc[k] = sc
        best_of_group[k] = best
    best_acc = float(acc.max())
    keep = acc >= 0.75 * best_acc
    out = sorted({int(best_of_group[k]) for k in np.nonzero(keep)[0]},
                 key=lambda k: -l1[k])
    return out[:n_candidates]


def detect_relocalization_candidates(
    db: KeyFrameDB,
    voc: vocab_mod.Vocabulary,
    state: ms.MapState,
    frame_desc_cam0: jnp.ndarray,
    frame_valid_cam0: jnp.ndarray,
    n_candidates: int = 5,
) -> list:
    """DetectRelocalizationCandidates (KeyFrameDatabase.cc:415-543):
    same scheme as loop candidates but scored against a frame and without
    the min-score/connected-KF gates."""
    q = vocab_mod.bow_vector(voc, frame_desc_cam0, frame_valid_cam0)
    l1 = np.asarray(vocab_mod.score_l1(db.bow_cam0, q))
    has = np.asarray(db.has_bow & state.kf_valid)
    l1 = np.where(has, l1, -1.0)
    order = np.argsort(-l1)[:n_candidates]
    return [int(k) for k in order if l1[k] > 0]
