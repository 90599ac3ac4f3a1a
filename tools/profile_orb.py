"""Microprofile extract_orb sub-stages on the TPU."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np


def timeit(fn, args, reps, name):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax
    import jax.numpy as jnp
    from functools import partial

    from multi_orb_slam_tpu.ops import orb, pallas_kernels as pk

    H, W = 480, 640
    cfg = orb.ORBConfig(n_features=1024)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))

    timeit(jax.jit(partial(orb.extract_orb, cfg=cfg)), (img,), reps,
           "extract_orb total")

    # pyramid
    timeit(jax.jit(lambda im: orb.build_pyramid(im, cfg)[-1]), (img,), reps,
           "build_pyramid (antialias resize x7)")

    shapes = orb.pyramid_shapes(H, W, cfg)
    L = cfg.n_levels
    canvas = jnp.zeros((L, H, W), jnp.float32)

    @jax.jit
    def canvasify(im):
        pyr = orb.build_pyramid(im, cfg)
        cv = jnp.zeros((L, H, W), im.dtype)
        for lvl in range(L):
            h, w = shapes[lvl]
            cv = cv.at[lvl, :h, :w].set(pyr[lvl])
        return cv

    canvas = canvasify(img)
    jax.block_until_ready(canvas)
    timeit(canvasify, (img,), reps, "pyramid+canvas")
    timeit(jax.jit(pk.fast_score_pallas), (canvas,), reps,
           "fast_score_pallas [8,H,W]")

    @jax.jit
    def nms_topk(score):
        is_max = score >= jax.lax.reduce_window(
            score, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
        score = jnp.where(is_max, score, 0.0)
        cs = cfg.cell_size
        rank_p = jnp.pad(score, ((0, 0), (0, 0), (0, 0)))
        ncy, ncx = H // cs, W // cs
        cells = rank_p.reshape(L, ncy, cs, ncx, cs).transpose(0, 1, 3, 2, 4)
        cells = cells.reshape(L, ncy * ncx, cs * cs)
        cv, ci = jax.lax.top_k(cells, cfg.cell_top_k)
        fv = cv.reshape(L, -1)
        return jax.lax.top_k(fv, 1024)

    score0 = pk.fast_score_pallas(canvas)
    jax.block_until_ready(score0)
    timeit(nms_topk, (score0,), reps, "nms + cell topk + level topk")

    # patch gather via vmapped dynamic_slice
    F = 2048
    lvls = jnp.asarray(rng.randint(0, 8, F), jnp.int32)
    y0 = jnp.asarray(rng.randint(0, H - 45, F), jnp.int32)
    x0 = jnp.asarray(rng.randint(0, W - 45, F), jnp.int32)

    @jax.jit
    def gather_patches(canvas, lvls, y0, x0):
        def slice_patch(l, y, x):
            return jax.lax.dynamic_slice(canvas, (l, y, x), (1, 45, 45))[0]
        return jax.vmap(slice_patch)(lvls, y0, x0)

    timeit(gather_patches, (canvas, lvls, y0, x0), reps,
           "patch gather dynamic_slice [2048,45,45]")

    patches = gather_patches(canvas, lvls, y0, x0)
    jax.block_until_ready(patches)
    timeit(jax.jit(orb.gaussian_blur7_batched), (patches,), reps,
           "gaussian_blur7_batched [2048,45,45]")

    @jax.jit
    def brief_mm(patches):
        r = orb.DESC_PATCH_R
        bp = patches[:, 3:3 + 2 * r + 1, 3:3 + 2 * r + 1]
        side = 2 * r + 1
        Pb = bp.reshape(patches.shape[0], side * side).astype(jnp.bfloat16)
        W_all = orb.ROT_BRIEF_W.transpose(1, 0, 2).reshape(-1, orb.N_ROT * 256)
        proj = jnp.dot(Pb, W_all, preferred_element_type=jnp.float32)
        return proj

    timeit(brief_mm, (patches,), reps, "BRIEF rot matmul [2048x1521x7680]")


if __name__ == "__main__":
    main()
