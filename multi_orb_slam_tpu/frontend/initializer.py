"""Monocular two-view initialization: batched H/F RANSAC + reconstruction.

Re-designs `Initializer` (reference src/Initializer.cc:33-124 Initialize,
:125-282 FindHomography/FindFundamental, :283-754 ReconstructF/H): the
reference runs 200 sequential RANSAC iterations in two threads (one for H,
one for F); here every hypothesis for BOTH models is generated and scored
in one batch — two batched SVDs and two dense scoring passes.

Model selection and thresholds mirror the reference exactly:
- symmetric transfer scoring with chi2 gates 5.991 (H) / 3.841 (F) and
  score offset th_score = 5.991 (Initializer.cc:462-576)
- RH = SH / (SH + SF) > 0.40 selects the homography (Initializer.cc:118)
- reconstruction requires a dominant cheirality winner with enough
  parallax (ReconstructF: nGood > 0.9*nsimilar, parallax > 1 deg)

The monocular pipeline is dormant in the reference itself (the fork's
Tracking::MonocularInitialization is never exercised by its drivers,
Tracking.cc:305-332); this module completes the capability row and is
exercised by synthetic two-view tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

CHI2_H = 5.991
CHI2_F = 3.841
TH_SCORE = 5.991


class InitResult(NamedTuple):
    ok: jnp.ndarray          # [] bool
    used_homography: jnp.ndarray  # [] bool
    R: jnp.ndarray           # [3, 3] rotation cam1 -> cam2
    t: jnp.ndarray           # [3] unit translation
    points: jnp.ndarray      # [N, 3] triangulated points in cam1 frame
    is_good: jnp.ndarray     # [N] bool inlier & positive-depth & parallax


def _normalize(pts, mask):
    """Hartley normalization (reference Normalize, Initializer.cc:756-800)."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    d = jnp.abs(pts - mean) * w[:, None]
    md = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], pts.dtype)
    return (pts - mean) * s, T


def _dlt_h(p1, p2):
    """4-point homography DLT: p1, p2 [4, 2] -> H [3, 3] with p2 ~ H p1."""
    def rows(a, b):
        x, y = a[0], a[1]
        u, v = b[0], b[1]
        r1 = jnp.array([0., 0., 0., -x, -y, -1., v * x, v * y, v])
        r2 = jnp.array([x, y, 1., 0., 0., 0., -u * x, -u * y, -u])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(p1[i], p2[i]) for i in range(4)])  # [8, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _eight_point_f(p1, p2):
    """8-point fundamental: [8, 2] x2 -> F [3, 3] (rank-2 enforced)."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], axis=-1)  # [8, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    uf, sf, vf = jnp.linalg.svd(F)
    return uf @ jnp.diag(sf.at[2].set(0.0)) @ vf


def _score_h(H, H_inv, p1, p2, mask, sigma2=1.0):
    """Symmetric transfer score (CheckHomography, Initializer.cc:462-521)."""
    def transfer(M, a):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1), a.dtype)], -1)
        q = ah @ M.T
        return q[:, :2] / jnp.where(jnp.abs(q[:, 2:]) > 1e-12, q[:, 2:], 1e-12)

    e12 = jnp.sum((transfer(H, p1) - p2) ** 2, -1) / sigma2
    e21 = jnp.sum((transfer(H_inv, p2) - p1) ** 2, -1) / sigma2
    ok = (e12 < CHI2_H) & (e21 < CHI2_H) & mask
    score = jnp.sum(jnp.where(mask & (e12 < CHI2_H), TH_SCORE - e12, 0.0)
                    + jnp.where(mask & (e21 < CHI2_H), TH_SCORE - e21, 0.0))
    return score, ok


def _score_f(F, p1, p2, mask, sigma2=1.0):
    """Epipolar-distance score (CheckFundamental, Initializer.cc:523-576)."""
    p1h = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1), p1.dtype)], -1)
    p2h = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1), p2.dtype)], -1)
    l2 = p1h @ F.T          # line in image 2
    l1 = p2h @ F            # line in image 1
    d2 = (jnp.sum(l2 * p2h, -1) ** 2
          / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)) / sigma2
    d1 = (jnp.sum(l1 * p1h, -1) ** 2
          / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)) / sigma2
    ok = (d1 < CHI2_F) & (d2 < CHI2_F) & mask
    score = jnp.sum(jnp.where(mask & (d2 < CHI2_F), TH_SCORE - d2, 0.0)
                    + jnp.where(mask & (d1 < CHI2_F), TH_SCORE - d1, 0.0))
    return score, ok


def _triangulate(R, t, K, p1, p2):
    """Midpoint triangulation of calibrated rays (cam1 frame)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    d1 = jnp.stack([(p1[:, 0] - cx) / fx, (p1[:, 1] - cy) / fy,
                    jnp.ones_like(p1[:, 0])], -1)
    d2c = jnp.stack([(p2[:, 0] - cx) / fx, (p2[:, 1] - cy) / fy,
                     jnp.ones_like(p2[:, 0])], -1)
    d2 = d2c @ R            # ray direction in cam1 frame
    o2 = -R.T @ t           # cam2 center in cam1 frame
    r = o2[None, :]
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    d_ = jnp.sum(r * d1, -1)
    e_ = jnp.sum(r * d2, -1)
    den = a * c - b * b
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    s1 = (c * d_ - b * e_) / den
    s2 = (b * d_ - a * e_) / den
    X1 = d1 * s1[:, None]
    X2 = r + d2 * s2[:, None]
    X = 0.5 * (X1 + X2)
    # parallax between the two rays
    cosp = jnp.sum(d1 * d2, -1) / jnp.maximum(
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1), 1e-12)
    z2 = X @ R.T[:, 2] + t[2]
    return X, (s1 > 0) & (s2 > 0) & (X[:, 2] > 0) & (z2 > 0), cosp


def _check_rt(R, t, K, p1, p2, inlier):
    X, pos, cosp = _triangulate(R, t, K, p1, p2)

    # reprojection gate in BOTH views (reference CheckRT requires < 4 px,
    # Initializer.cc:850-980) — this is what disambiguates the twisted
    # pair of a homography decomposition
    def reproj(Xc, uv):
        z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-9, Xc[:, 2], 1e-9)
        u = K[0] * Xc[:, 0] / z + K[2]
        v = K[1] * Xc[:, 1] / z + K[3]
        return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

    e1 = reproj(X, p1)
    e2 = reproj(X @ R.T + t[None, :], p2)
    good = (inlier & pos & (cosp < 0.99998)     # parallax > ~0.36 deg
            & (e1 < 4.0) & (e2 < 4.0))          # 4*sigma^2 px^2, CheckRT
    n_good = jnp.sum(good.astype(jnp.int32))
    # model-quality score over ALL positive-depth inliers (not just the
    # gated ones — gating would cap the very signal that separates a
    # wrong interpretation), clipped so gross outliers don't dominate
    sel = inlier & pos
    n_sel = jnp.sum(sel.astype(jnp.int32))
    mean_err = jnp.sum(jnp.where(sel, jnp.minimum(e1 + e2, 100.0), 0.0)) \
        / jnp.maximum(n_sel.astype(e1.dtype), 1.0)
    return n_good, X, good, mean_err


@partial(jax.jit, static_argnums=(4,))
def initialize_two_view(
    key: jnp.ndarray,
    xy1: jnp.ndarray,       # [N, 2] matched pixel coords, first frame
    xy2: jnp.ndarray,       # [N, 2] second frame
    mask: jnp.ndarray,      # [N] valid matches
    n_hyp: int = 256,
    K: jnp.ndarray = None,  # [4] fx fy cx cy
) -> InitResult:
    """Full two-view initialization (reference Initialize,
    src/Initializer.cc:33-124): batched H and F RANSAC, model selection by
    RH > 0.4, pose recovery (E decomposition for F; plane-induced
    decomposition folded into the same cheirality test for H), and
    triangulation of the winning model's inliers."""
    N = xy1.shape[0]
    n1, T1 = _normalize(xy1, mask)
    n2, T2 = _normalize(xy2, mask)
    T2inv = jnp.linalg.inv(T2)

    keys = jax.random.split(key, n_hyp)

    def sample(k, m):
        g = jax.random.gumbel(k, (N,)) + jnp.where(mask, 0.0, -1e9)
        _, idx = jax.lax.top_k(g, m)
        return idx

    # --- homography hypotheses (4-point) ---
    idx_h = jax.vmap(lambda k: sample(k, 4))(keys)           # [Hyp, 4]
    Hn = jax.vmap(lambda i: _dlt_h(n1[i], n2[i]))(idx_h)     # normalized
    Hs = jax.vmap(lambda Hm: T2inv @ Hm @ T1)(Hn)            # pixel space
    Hs_inv = jnp.linalg.inv(
        Hs + 1e-12 * jnp.eye(3)[None])
    sh, okh = jax.vmap(lambda Hm, Hi: _score_h(Hm, Hi, xy1, xy2, mask))(
        Hs, Hs_inv)
    bh = jnp.argmax(sh)
    SH, H_best, H_inl = sh[bh], Hs[bh], okh[bh]

    # --- fundamental hypotheses (8-point) ---
    idx_f = jax.vmap(lambda k: sample(k, 8))(keys)
    Fn = jax.vmap(lambda i: _eight_point_f(n1[i], n2[i]))(idx_f)
    Fs = jax.vmap(lambda Fm: T2.T @ Fm @ T1)(Fn)
    sf, okf = jax.vmap(lambda Fm: _score_f(Fm, xy1, xy2, mask))(Fs)
    bf = jnp.argmax(sf)
    SF, F_best, F_inl = sf[bf], Fs[bf], okf[bf]

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40

    # --- pose candidates ---
    Km = jnp.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1]], xy1.dtype)

    # F path: E = K^T F K, 4 (R, t) candidates
    E = Km.T @ F_best @ Km
    Ue, Se, Vte = jnp.linalg.svd(E)
    W = jnp.array([[0., -1., 0.], [1., 0., 0.], [0., 0., 1.]], xy1.dtype)

    def fix_det(R):
        return R * jnp.sign(jnp.linalg.det(R))

    R1 = fix_det(Ue @ W @ Vte)
    R2 = fix_det(Ue @ W.T @ Vte)
    tf_ = Ue[:, 2]
    tf_ = tf_ / jnp.maximum(jnp.linalg.norm(tf_), 1e-12)
    f_cands = [(R1, tf_), (R1, -tf_), (R2, tf_), (R2, -tf_)]

    # H path: Faugeras-style decomposition of the calibrated homography.
    # A = K^-1 H K; its SVD-based plane-induced decomposition yields (R, t)
    # candidates; the same cheirality + parallax vote picks the winner
    # (reference ReconstructH, Initializer.cc:584-754).
    A = jnp.linalg.inv(Km) @ H_best @ Km
    Ua, Sa, Vta = jnp.linalg.svd(A)
    d1s, d2s, d3s = Sa[0], Sa[1], Sa[2]
    A = A / jnp.where(jnp.abs(d2s) > 1e-12, d2s, 1e-12)
    Ua, Sa, Vta = jnp.linalg.svd(A)
    d1s, d3s = Sa[0], Sa[2]
    s_det = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    x1_ = jnp.sqrt(jnp.maximum((d1s * d1s - 1.0)
                               / jnp.maximum(d1s * d1s - d3s * d3s, 1e-12),
                               0.0))
    x3_ = jnp.sqrt(jnp.maximum((1.0 - d3s * d3s)
                               / jnp.maximum(d1s * d1s - d3s * d3s, 1e-12),
                               0.0))
    st_ = jnp.sqrt(jnp.maximum((d1s * d1s - 1.0) * (1.0 - d3s * d3s),
                               0.0)) / jnp.maximum(d1s + d3s, 1e-12)
    ct_ = (1.0 + d1s * d3s) / jnp.maximum(d1s + d3s, 1e-12)

    h_cands = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            Rp = jnp.array([[ct_, 0., -e1 * e3 * st_],
                            [0., 1., 0.],
                            [e1 * e3 * st_, 0., ct_]], xy1.dtype)
            tp = jnp.array([e1 * x1_, 0.0, -e3 * x3_], xy1.dtype) \
                * (d1s - d3s)
            Rh = fix_det(s_det * Ua @ Rp @ Vta)
            th = Ua @ tp
            th = th / jnp.maximum(jnp.linalg.norm(th), 1e-12)
            h_cands.append((Rh, th))

    def pick(cands, inl):
        counts, Xs, goods, errs = [], [], [], []
        for R_, t_ in cands:
            n_, X_, g_, me_ = _check_rt(R_, t_, K, xy1, xy2, inl)
            counts.append(n_)
            Xs.append(X_)
            goods.append(g_)
            errs.append(me_)
        counts = jnp.stack(counts)
        errs = jnp.stack(errs)
        best = jnp.argmax(counts)
        Xs = jnp.stack(Xs)
        goods = jnp.stack(goods)
        Rall = jnp.stack([c[0] for c in cands])
        tall = jnp.stack([c[1] for c in cands])
        Rb = Rall[best]
        tb = tall[best]
        n_best = counts[best]
        # dominant winner: the runner-up must be clearly worse.  Degenerate
        # decompositions can emit the SAME (R, t) twice (e.g. x1 ~ 0 makes
        # the +-e1 homography candidates coincide) — such duplicates are
        # not competing interpretations and are excluded from the test.
        tr = jnp.einsum("cij,ij->c", Rall, Rb)
        same = (tr > 2.999) & (jnp.abs(tall @ tb) > 0.999)
        others = jnp.where(
            same | (jnp.arange(len(cands)) == best), -1, counts)
        second_idx = jnp.argmax(others)
        second = others[second_idx]
        # dominance by count (the reference's secondBest < 0.75*best gate,
        # ReconstructF/H), with an error-ratio tiebreak: a homography's
        # twisted-pair runner-up can reconstruct almost as many points on
        # near-planar scenes, but its skew rays leave a decisively larger
        # mean reprojection residual than the true interpretation
        dominant = second < 0.75 * n_best
        tiebreak = errs[best] * 2.0 < errs[second_idx]
        ok = (n_best > 0.7 * jnp.sum(inl.astype(jnp.int32))) \
            & (dominant | tiebreak) & (n_best >= 8)
        return ok, Rb, tb, Xs[best], goods[best]

    okf_, Rf_, tf2_, Xf_, gf_ = pick(f_cands, F_inl)
    okh_, Rh_, th_, Xh_, gh_ = pick(h_cands, H_inl)

    ok = jnp.where(use_h, okh_, okf_)
    R = jnp.where(use_h, Rh_, Rf_)
    t = jnp.where(use_h, th_, tf2_)
    X = jnp.where(use_h, Xh_, Xf_)
    good = jnp.where(use_h, gh_, gf_)
    return InitResult(ok=ok, used_homography=use_h, R=R, t=t,
                      points=X, is_good=good)
