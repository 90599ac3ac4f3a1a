"""Pallas TPU kernels for the hot front-end ops.

The XLA versions of these ops materialize many [H, W] intermediates in HBM;
the Pallas kernels keep the whole working set in VMEM and write each output
once, which is the difference between bandwidth-bound chains of ~50 passes
and a single fused pass.

- `fast_score_pallas`: FAST-9/16 segment-test corner strength
  (same math as ops/orb.fast_score; reference ORBextractor uses cv::FAST,
  ORBextractor.cc:822,839).  Wired into extract_orb on TPU.
- `window_match_pallas`: fused gated best/second Hamming matcher.  Measured
  ~1.3 ms vs ~1.5 ms for the XLA version at [2048 x 1024] (XLA already fuses
  this chain well), so the searches keep the jnp formulation; the kernel is
  maintained and parity-tested as the building block for future batched-rig
  match fusion.

Kernels run on TPU; on CPU backends the pure-jnp fallback is used (tests),
selected by `jax.default_backend()` at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bresenham circle of radius 3 (dy, dx), FAST-16 order
_FAST_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

_R = 3          # circle radius
_BAND = 64      # output rows per grid program


def _fast_kernel(img_ref, out_ref, win, sem):
    """One program scores one _BAND-row band of the image.

    The padded image stays in HBM; each program DMAs its band plus the
    ring halo into VMEM (gridding by bands bounds VMEM at any image width
    — the whole-image-in-VMEM formulation OOMs at KITTI's 376x1241).  The
    16 ring samples come from statically-shifted slices of the VMEM
    window; the 16 wrapped 9-arcs reduce with an unrolled min/max chain.
    """
    i = pl.program_id(0)
    B, W = out_ref.shape
    cp = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * B, B + 16), :], win, sem)
    cp.start()
    cp.wait()
    img = win[...]
    center = img[_R:_R + B, _R:_R + W]
    ds = []
    for dy, dx in _FAST_OFFSETS:
        ds.append(img[_R + dy:_R + dy + B, _R + dx:_R + dx + W] - center)
    # wrapped arcs of 9 consecutive samples
    bright = None
    dark = None
    for k in range(16):
        amin = ds[k % 16]
        amax = ds[k % 16]
        for j in range(1, 9):
            d = ds[(k + j) % 16]
            amin = jnp.minimum(amin, d)
            amax = jnp.maximum(amax, d)
        bright = amin if bright is None else jnp.maximum(bright, amin)
        dark = -amax if dark is None else jnp.maximum(dark, -amax)
    out_ref[...] = jnp.maximum(bright, dark)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _fast_score_pallas_2d(img: jnp.ndarray, h: int, w: int,
                          interpret: bool = False) -> jnp.ndarray:
    # pad to a whole number of bands (rows) and lanes (cols), plus the
    # ring halo; the kernel only requires a >= _R margin at the top-left
    hp = (h + _BAND - 1) // _BAND * _BAND
    wp = (w + 127) // 128 * 128
    padded = jnp.pad(img, ((_R, hp + 16 - h - _R), (_R, wp + 128 - w - _R)))
    out = pl.pallas_call(
        _fast_kernel,
        grid=(hp // _BAND,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_BAND, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((_BAND + 16, wp + 128), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the 16 live ring-difference arrays exceed the default 16 MiB
        # scoped-vmem budget at KITTI widths; a v5e has 128 MiB of VMEM
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded)
    return out[:h, :w]


def fast_score_pallas(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """FAST-9/16 corner strength; drop-in for ops.orb.fast_score.

    NOTE: unlike the roll-based jnp version (which wraps around edges and
    relies on the caller's border mask), the padded Pallas version reads
    zeros outside the image — identical results inside the border margin.
    """
    h, w = img.shape[-2], img.shape[-1]
    if img.ndim == 2:
        return _fast_score_pallas_2d(img, h, w, interpret)
    # batch via an unrolled loop, not vmap: the pallas vmap batching rule
    # inserts the batch dim before the minor dims, which Mosaic rejects
    # for non-(8,128)-aligned shapes (NOTES_ROUND2 gotcha #3)
    batch = img.shape[:-2]
    flat = img.reshape((-1, h, w))
    out = jnp.stack([
        _fast_score_pallas_2d(flat[i], h, w, interpret)
        for i in range(flat.shape[0])])
    return out.reshape(batch + (h, w))


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused window matcher
# ---------------------------------------------------------------------------
#
# The projection searches all share one inner loop: for each query (a
# projected map point or a previous-frame feature), find the best and
# second-best Hamming match among frame features inside a search window,
# level range, and virtual-stereo gate.  The XLA version materializes
# several [L, F] float masks plus the distance matrix in HBM; this kernel
# fuses gating + popcount + argmin into one VMEM pass per query tile.

_QT = 256  # queries per program


def _popcount_i32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _window_match_kernel(
    q_ref, q_desc_ref, f_ref, f_desc_ref,
    out_ref,
):
    """Lane-friendly layout: q_ref [6, QT] (u, v, rad, lmin, lmax, ur),
    q_desc_ref [8, QT]; f_ref [4, F] (x, y, ur, level*mask packing:
    row3 = level where masked valid else -1e9); f_desc_ref [8, F];
    out_ref [4, QT] int32 (bi, bd, b2, b2i)."""
    F = f_ref.shape[1]
    qu = q_ref[0, :][:, None]          # [QT, 1]
    qv = q_ref[1, :][:, None]
    rad = q_ref[2, :][:, None]
    lmin = q_ref[3, :][:, None]
    lmax = q_ref[4, :][:, None]
    qur = q_ref[5, :][:, None]

    fx = f_ref[0, :][None, :]          # [1, F]
    fy = f_ref[1, :][None, :]
    fur = f_ref[2, :][None, :]
    flv = f_ref[3, :][None, :]         # -1e9 where invalid

    in_win = (jnp.abs(qu - fx) < rad) & (jnp.abs(qv - fy) < rad)
    lv_ok = (flv >= lmin) & (flv <= lmax)
    # stereo gate: frame feature without uR passes; otherwise |dur| < rad.
    # query ur < -1e8 disables the gate entirely (brute-force mode).
    ur_ok = (fur < 0) | (jnp.abs(qur - fur) < rad) | (qur < -1e8)
    cand = in_win & lv_ok & ur_ok

    acc = jnp.zeros((_QT, F), jnp.int32)
    for w in range(8):
        x = jnp.bitwise_xor(q_desc_ref[w, :][:, None], f_desc_ref[w, :][None, :])
        acc = acc + _popcount_i32(x)

    # Mosaic argmin supports f32 only; distances <= 256 so floats are exact
    BIGD = jnp.float32(1 << 20)
    d = jnp.where(cand, acc.astype(jnp.float32), BIGD)
    bi = jnp.argmin(d, axis=1).astype(jnp.int32)
    bd = jnp.min(d, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (_QT, F), 1)
    d2 = jnp.where(col == bi[:, None], BIGD, d)
    b2i = jnp.argmin(d2, axis=1).astype(jnp.int32)
    b2 = jnp.min(d2, axis=1)
    out_ref[0, :] = bi
    out_ref[1, :] = bd.astype(jnp.int32)
    out_ref[2, :] = b2.astype(jnp.int32)
    out_ref[3, :] = b2i


@functools.partial(jax.jit, static_argnums=(11,))
def window_match_pallas(
    q_uv, q_rad, q_lmin, q_lmax, q_ur, q_desc,
    f_xy, f_ur, f_level, f_mask, f_desc, interpret: bool = False,
):
    """Fused gated best/second-best Hamming match.

    Shapes: queries [L, ...], frame [F, ...].  Returns (best_idx [L],
    best_d [L], second_d [L], second_idx [L]); no-candidate entries = 2^20.
    """
    L = q_uv.shape[0]
    F = f_xy.shape[0]
    pad = (-L) % _QT
    q = jnp.stack([
        q_uv[:, 0], q_uv[:, 1], q_rad,
        q_lmin.astype(jnp.float32), q_lmax.astype(jnp.float32), q_ur,
    ])                                             # [6, L]
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad)))
        q_desc = jnp.pad(q_desc, ((0, pad), (0, 0)))
    Lp = L + pad
    qd = jax.lax.bitcast_convert_type(q_desc, jnp.int32).T        # [8, Lp]
    flv = jnp.where(f_mask, f_level.astype(jnp.float32), -1e9)
    f = jnp.stack([f_xy[:, 0], f_xy[:, 1], f_ur, flv])  # [4, F]
    fd = jax.lax.bitcast_convert_type(f_desc, jnp.int32).T        # [8, F]

    grid = (Lp // _QT,)
    out = pl.pallas_call(
        _window_match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, _QT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _QT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, _QT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, Lp), jnp.int32),
        interpret=interpret,
    )(q, qd, f, fd)
    return out[0, :L], out[1, :L], out[2, :L], out[3, :L]


def window_match_reference(
    q_uv, q_rad, q_lmin, q_lmax, q_ur, q_desc,
    f_xy, f_ur, f_level, f_mask, f_desc,
):
    """jnp fallback with identical semantics (CPU tests / non-TPU)."""
    from . import hamming

    du = jnp.abs(q_uv[:, 0:1] - f_xy[None, :, 0])
    dv = jnp.abs(q_uv[:, 1:2] - f_xy[None, :, 1])
    in_win = (du < q_rad[:, None]) & (dv < q_rad[:, None])
    lv_ok = ((f_level[None, :] >= q_lmin[:, None])
             & (f_level[None, :] <= q_lmax[:, None]))
    ur_ok = ((f_ur[None, :] < 0)
             | (jnp.abs(q_ur[:, None] - f_ur[None, :]) < q_rad[:, None])
             | (q_ur[:, None] < -1e8))
    cand = in_win & lv_ok & ur_ok & f_mask[None, :]
    d = hamming.pairwise_hamming(q_desc, f_desc)
    BIGD = 1 << 20
    dm = jnp.where(cand, d, BIGD)
    bi = jnp.argmin(dm, axis=1).astype(jnp.int32)
    bd = jnp.min(dm, axis=1)
    col = jnp.arange(f_xy.shape[0])[None, :]
    d2 = jnp.where(col == bi[:, None], BIGD, dm)
    b2i = jnp.argmin(d2, axis=1).astype(jnp.int32)
    b2 = jnp.min(d2, axis=1)
    return bi, bd, b2, b2i


def window_match(q_uv, q_rad, q_lmin, q_lmax, q_ur, q_desc,
                 f_xy, f_ur, f_level, f_mask, f_desc):
    if use_pallas():
        return window_match_pallas(
            q_uv, q_rad, q_lmin, q_lmax, q_ur, q_desc,
            f_xy, f_ur, f_level, f_mask, f_desc)
    return window_match_reference(
        q_uv, q_rad, q_lmin, q_lmax, q_ur, q_desc,
        f_xy, f_ur, f_level, f_mask, f_desc)


# ---------------------------------------------------------------------------
# Per-keypoint patch gather (descriptor/orientation support regions)
# ---------------------------------------------------------------------------
#
# extract_orb needs one [side, side] patch per keypoint from the [L, H, W]
# pyramid canvas.  The XLA formulation (vmap of dynamic_slice) lowers to a
# serialized per-feature loop (~6 ms for 2048 patches); this kernel issues
# the patch reads as overlapping async DMAs straight from the HBM canvas
# into the blocked VMEM output — a pure DMA-gather, no compute.

_PT = 16       # patches per program (DMAs in flight per grid step)
_WROW = 56     # DMA window rows (mult of 8 sublanes; >= side + 8 slack)
_WCOL = 256    # DMA window cols (mult of 128 lanes; >= side + 128 slack)


def _gather_patches_kernel(yb_ref, xb_ref, dy_ref, dx_ref, lvl_ref,
                           canvas_ref, out_ref, win, sems):
    """DMA an aligned [_WROW, _WCOL] window per patch (Mosaic requires HBM
    slice shapes aligned to the (8, 128) tiling), then shift the [side,
    side] region to the window origin with dynamic rolls in VMEM."""
    i = pl.program_id(0)
    side = out_ref.shape[1]

    def issue(p):
        f = i * _PT + p
        return pltpu.make_async_copy(
            canvas_ref.at[lvl_ref[f]].at[
                pl.ds(pl.multiple_of(yb_ref[f], 8), _WROW),
                pl.ds(pl.multiple_of(xb_ref[f], 128), _WCOL)],
            win.at[p],
            sems.at[p],
        )

    for p in range(_PT):
        issue(p).start()
    for p in range(_PT):
        f = i * _PT + p
        issue(p).wait()
        w = win[p]
        # positive shifts only: hardware dynamic_rotate is unsigned
        w = pltpu.roll(w, _WROW - dy_ref[f], axis=0)
        w = pltpu.roll(w, _WCOL - dx_ref[f], axis=1)
        out_ref[p] = w[:side, :side]


@functools.partial(jax.jit, static_argnums=(4, 5))
def gather_patches_pallas(canvas, level, y0, x0, side: int,
                          interpret: bool = False):
    """[F] patches of [side, side] from canvas [L, H, W] at (level, y0, x0).

    y0/x0 must be pre-clipped to [0, H-side] / [0, W-side] by the caller
    (extract_orb already does).  Drop-in for
    vmap(lambda l, y, x: dynamic_slice(canvas, (l, y, x), (1, s, s))).
    Requires side <= min(_WROW - 8, _WCOL - 128) and canvas H >= _WROW,
    W >= _WCOL.
    """
    assert side <= _WROW - 8 and side <= _WCOL - 128
    H, W = canvas.shape[1], canvas.shape[2]
    # Mosaic requires the per-level memref slice to be tiling-aligned:
    # sublane dim (H) a multiple of 8 and lane dim (W) a multiple of 128,
    # and the DMA window needs H >= _WROW, W >= _WCOL.  640x480 is
    # accidentally aligned; 320-wide or KITTI-width canvases are not
    # (NOTES_ROUND2 §3 crash) — pad here, once, in HBM.
    Hp = max(-(-H // 8) * 8, _WROW)
    Wp = max(-(-W // 128) * 128, _WCOL)
    if (Hp, Wp) != (H, W):
        canvas = jnp.pad(canvas, ((0, 0), (0, Hp - H), (0, Wp - W)))
        H, W = Hp, Wp
    F = level.shape[0]
    # aligned window origins + in-window offsets
    yb = jnp.minimum((y0 // 8) * 8, H - _WROW).astype(jnp.int32)
    xb = jnp.minimum((x0 // 128) * 128, W - _WCOL).astype(jnp.int32)
    dy = y0.astype(jnp.int32) - yb
    dx = x0.astype(jnp.int32) - xb
    pad = (-F) % _PT
    if pad:
        level = jnp.pad(level, (0, pad))
        yb, xb = jnp.pad(yb, (0, pad)), jnp.pad(xb, (0, pad))
        dy, dx = jnp.pad(dy, (0, pad)), jnp.pad(dx, (0, pad))
    Fp = F + pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(Fp // _PT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_PT, side, side), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_PT, _WROW, _WCOL), canvas.dtype),
            pltpu.SemaphoreType.DMA((_PT,)),
        ],
    )
    out = pl.pallas_call(
        _gather_patches_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Fp, side, side), canvas.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(yb, xb, dy, dx, level.astype(jnp.int32), canvas)
    return out[:F]


# ---------------------------------------------------------------------------
# Point-block accumulation for local BA
# ---------------------------------------------------------------------------
#
# The Schur solver's per-iteration floor is accumulating per-observation
# blocks (H_pp 9 + b_p 3 + W_cp 18 floats) into per-point bins through the
# inverse observation map inv[LC, P] (feature index observing point p in
# row r, or -1).  The XLA gather formulation pays a ~3.5 ms latency floor
# per iteration at [48, 4096]; here each (row, point-tile) step builds the
# one-hot selection ON THE FLY in VMEM and contracts it with the row's
# value matrix on the MXU — the [LC, P, F] one-hot never exists in HBM.

_PS_PT = 1024    # point-tile width (1-D s32 inputs are XLA-tiled T(1024);
                 # Mosaic requires the block to match that layout)
_PS_VD = 32      # padded value depth (30 -> 32 lanes)


def _point_sums_kernel(inv_ref, v_ref, summed_ref, gathered_ref, acc):
    r = pl.program_id(1)
    n_rows = pl.num_programs(1)
    F = v_ref.shape[0]
    inv_tile = inv_ref[...]                     # [PT] int32
    onehot = (inv_tile[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (_PS_PT, F), 1))
    g = jax.lax.dot_general(
        onehot.astype(jnp.float32), v_ref[...],
        (((1,), (0,)), ((), ())),
        # HIGHEST: default MXU bf16 passes truncate the selected f32
        # values (~1e-2 relative error — poison for LM normal equations)
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)      # [PT, VD]
    gathered_ref[...] = g

    @pl.when(r == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += g

    @pl.when(r == n_rows - 1)
    def _emit():
        summed_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnums=(2,))
def point_sums_pallas(V, inv, interpret: bool = False):
    """V [LC, F, D], inv [LC, P] (-1 = no observation) ->
    (summed [P, D], gathered [LC, P, D]).

    gathered[r, p] = V[r, inv[r, p]] (zeros where inv < 0);
    summed = gathered.sum(0).  Exact: the one-hot contraction is a
    selection, f32 throughout.
    """
    LC, F, D = V.shape
    P = inv.shape[1]
    assert D <= _PS_VD
    pad_p = (-P) % _PS_PT
    if pad_p:
        inv = jnp.pad(inv, ((0, 0), (0, pad_p)), constant_values=-1)
    Pp = P + pad_p
    Vp = jnp.pad(V, ((0, 0), (0, 0), (0, _PS_VD - D)))
    grid = (Pp // _PS_PT, LC)
    n_ptiles = Pp // _PS_PT
    summed, gathered = pl.pallas_call(
        _point_sums_kernel,
        grid=grid,
        in_specs=[
            # inv arrives flattened to 1-D: a (1, PT) or squeezed-row 2-D
            # block is Mosaic-illegal (second-minor must be divisible by 8
            # or the full dim); 1-D blocks only need lane divisibility
            pl.BlockSpec((_PS_PT,), lambda p, r: (r * n_ptiles + p,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, F, _PS_VD), lambda p, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_PS_PT, _PS_VD), lambda p, r: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _PS_PT, _PS_VD), lambda p, r: (r, p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, _PS_VD), jnp.float32),
            jax.ShapeDtypeStruct((LC, Pp, _PS_VD), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_PS_PT, _PS_VD), jnp.float32)],
        interpret=interpret,
    )(inv.reshape(-1), Vp)
    return summed[:P, :D], gathered[:, :P, :D]
