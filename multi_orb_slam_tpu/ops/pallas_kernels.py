"""Pallas TPU kernels for the hot front-end ops.

The XLA versions of these ops materialize many [H, W] intermediates in HBM;
the Pallas kernels keep the whole working set in VMEM and write each output
once, which is the difference between bandwidth-bound chains of ~50 passes
and a single fused pass.

- `fast_score_pallas`: FAST-9/16 segment-test corner strength
  (same math as ops/orb.fast_score; reference ORBextractor uses cv::FAST,
  ORBextractor.cc:822,839).

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
_CHUNK = 64     # row chunk processed per inner iteration


def _fast_kernel(img_ref, out_ref):
    """One program scores one full image level held in VMEM.

    Processes the image in row chunks; for each chunk the 16 ring samples
    come from statically-shifted slices of the padded VMEM image, and the
    16 wrapped 9-arcs are reduced with an unrolled min/max chain.
    """
    H, W = out_ref.shape
    img = img_ref[...]  # [H + 2R, W + 2R] padded by caller

    n_chunks = (H + _CHUNK - 1) // _CHUNK
    for ci in range(n_chunks):
        r0 = ci * _CHUNK
        ch = min(_CHUNK, H - r0)
        center = img[r0 + _R:r0 + _R + ch, _R:_R + W]
        ds = []
        for dy, dx in _FAST_OFFSETS:
            ring = img[r0 + _R + dy:r0 + _R + dy + ch,
                       _R + dx:_R + dx + W]
            ds.append(ring - center)
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
        out_ref[r0:r0 + ch, :] = jnp.maximum(bright, dark)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fast_score_pallas_2d(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    padded = jnp.pad(img, ((_R, _R), (_R, _R)))
    return pl.pallas_call(
        _fast_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(padded)


def fast_score_pallas(img: jnp.ndarray) -> jnp.ndarray:
    """FAST-9/16 corner strength; drop-in for ops.orb.fast_score.

    NOTE: unlike the roll-based jnp version (which wraps around edges and
    relies on the caller's border mask), the padded Pallas version reads
    zeros outside the image — identical results inside the border margin.
    """
    h, w = img.shape[-2], img.shape[-1]
    if img.ndim == 2:
        return _fast_score_pallas_2d(img, h, w)
    batch = img.shape[:-2]
    flat = img.reshape((-1, h, w))
    out = jax.vmap(lambda x: _fast_score_pallas_2d(x, h, w))(flat)
    return out.reshape(batch + (h, w))


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"
