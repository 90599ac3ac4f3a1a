"""Stereo matching: left/right ORB features -> per-feature depth.

Replaces `Frame::ComputeStereoMatches` (reference src/Frame.cc:782-956,
the stock ORB-SLAM2 stereo path; stereo example binaries are disabled in the
reference build but the capability exists): for each left keypoint, match
right keypoints in a +/-2-row band at compatible scale, take the Hamming
best within the disparity range, and convert disparity to depth via
z = bf / d.  The reference's SAD subpixel refinement is replaced by the
feature-position disparity (sufficient at ORB accuracy; parity is ATE-level,
not bit-level — SURVEY.md §7.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import hamming
from ..ops import orb


def stereo_match_depth(
    featsL: "orb.Features",
    featsR: "orb.Features",
    bf: jnp.ndarray,
    scale_factor: float = 1.2,
    min_disp: float = 0.5,
    max_disp: float = 192.0,
    th_hamming: int = hamming.TH_HIGH,
    row_band: float = 2.0,
):
    """Returns (depth [F], uright [F]) for the left features."""
    xL = featsL.xy[:, 0]
    yL = featsL.xy[:, 1]
    xR = featsR.xy[:, 0]
    yR = featsR.xy[:, 1]
    # row band scales with the left keypoint's level (reference Frame.cc:807)
    band = row_band * (scale_factor ** featsL.level.astype(jnp.float32))
    dy = jnp.abs(yL[:, None] - yR[None, :])
    disp = xL[:, None] - xR[None, :]
    lv_ok = (
        (featsR.level[None, :] >= featsL.level[:, None] - 1)
        & (featsR.level[None, :] <= featsL.level[:, None] + 1)
    )
    cand = (
        (dy <= band[:, None])
        & (disp >= min_disp) & (disp <= max_disp)
        & lv_ok
        & featsL.valid[:, None] & featsR.valid[None, :]
    )
    d = hamming.pairwise_hamming(featsL.desc, featsR.desc)
    bi, bd, b2 = hamming.masked_argmin2(d, cand)
    ok = (bd <= th_hamming) & (
        bd.astype(jnp.float32) <= 0.9 * b2.astype(jnp.float32))
    best_disp = xL - xR[bi]
    depth = jnp.where(ok, bf / jnp.maximum(best_disp, min_disp), 0.0)
    uright = jnp.where(ok, xR[bi], -1.0)
    return depth, uright


def subpixel_refine(
    gray_left: jnp.ndarray,   # [H, W]
    gray_right: jnp.ndarray,  # [H, W]
    xL: jnp.ndarray, yL: jnp.ndarray,   # [F] left keypoint coords
    uright: jnp.ndarray,      # [F] integer-accuracy right x (-1 invalid)
    bf: jnp.ndarray,
    win: int = 5,
    search: int = 5,
):
    """SAD parabola subpixel disparity (reference Frame.cc:860-940).

    An 11x11 left patch is slid over +/-`search` px of the matched right
    column; the SAD minimum is refined by parabola interpolation.
    Returns (depth [F], uright_refined [F]).
    """
    import jax

    H, W = gray_left.shape
    side = 2 * win + 1
    strip_w = side + 2 * search
    ixL = jnp.round(xL).astype(jnp.int32)
    y0 = jnp.clip(jnp.round(yL).astype(jnp.int32) - win, 0, H - side)
    xl0 = jnp.clip(ixL - win, 0, W - side)
    xr0 = jnp.clip(jnp.round(uright).astype(jnp.int32) - win - search,
                   0, W - strip_w)

    def patches(yy, xx_l, xx_r):
        lp = jax.lax.dynamic_slice(gray_left, (yy, xx_l), (side, side))
        rp = jax.lax.dynamic_slice(gray_right, (yy, xx_r), (side, strip_w))
        return lp, rp

    Lp, Rp = jax.vmap(patches)(y0, xl0, xr0)   # [F,11,11], [F,11,21]
    sads = jnp.stack(
        [jnp.sum(jnp.abs(Lp - Rp[:, :, r:r + side]), axis=(1, 2))
         for r in range(2 * search + 1)], axis=-1)   # [F, 11]
    best = jnp.argmin(sads, axis=-1)
    b_ok = (best > 0) & (best < 2 * search)
    c0 = jnp.take_along_axis(sads, jnp.maximum(best - 1, 0)[:, None], 1)[:, 0]
    c1 = jnp.take_along_axis(sads, best[:, None], 1)[:, 0]
    c2 = jnp.take_along_axis(sads, jnp.minimum(best + 1, 2 * search)[:, None], 1)[:, 0]
    denom = jnp.maximum(c0 + c2 - 2.0 * c1, 1e-6)
    delta = jnp.clip(0.5 * (c0 - c2) / denom, -1.0, 1.0)
    delta = jnp.where(b_ok, delta, 0.0)
    # refined right x: strip origin + best offset + subpixel + window center.
    # Disparity compares against the INTEGER left patch center (the patch was
    # extracted there); using the float xL would bias disparity by frac(xL).
    xr_ref = (xr0.astype(jnp.float32) + best.astype(jnp.float32) + delta
              + win)
    disp = (xl0 + win).astype(jnp.float32) - xr_ref
    valid = (uright >= 0) & (disp > 0.1)
    depth = jnp.where(valid, bf / jnp.maximum(disp, 0.1), 0.0)
    # report uright consistent with the float keypoint coordinate
    ur_out = xL - disp
    return depth, jnp.where(valid, ur_out, -1.0)
