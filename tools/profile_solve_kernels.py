"""Microbenchmark: dense LU solve vs PCG for the local-BA Schur system.

The local-BA LM loop solves S dx = rhs with S [6L, 6L] SPD (damped Schur
complement).  jnp.linalg.solve lowers to LU with sequential panel
factorization — suspected dominant per-iteration cost on TPU at L=12..32
(per-iter cost grows 8.8 -> 23.5 ms with L, tools/profile_mapping_stage).
This tool times, LICM-proof (state threaded through a fori carry, forced
via reduction — block_until_ready lies on the remote backend):

  - jnp.linalg.solve [6L, 6L]
  - jax.scipy cho_solve [6L, 6L]
  - block-Jacobi PCG (30 iters, dense matvec)
  - batched jnp.linalg.inv on [L, 6, 6] (the preconditioner candidate)
  - closed-form blockwise 6x6 inverse (3x3 adjugate Schur), batched

Run: python tools/profile_solve_kernels.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def force(x):
    tot = jnp.zeros((), jnp.float32)
    for l in jax.tree_util.tree_leaves(x):
        tot = tot + jnp.sum(l.astype(jnp.float32))
    return float(tot)


def amortized(name, step, init, reps=24):
    @partial(jax.jit, static_argnums=(1,))
    def loop(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)
    force(loop(init, 1))
    force(loop(init, reps + 1))
    t0 = time.perf_counter(); force(loop(init, 1)); t1 = time.perf_counter()
    force(loop(init, reps + 1)); t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / reps * 1e3
    print(f"{name:44s} {per:8.3f} ms", flush=True)
    return per


def inv3(H):
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e_, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e_ * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e_
    D = f * g - d * i
    E = a * i - c * g
    Ff = c * d - a * f
    G = d * h - e_ * g
    Hh = b * g - a * h
    I = a * e_ - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    adj = jnp.stack([
        jnp.stack([A, B, Cc], -1),
        jnp.stack([D, E, Ff], -1),
        jnp.stack([G, Hh, I], -1),
    ], -2)
    return adj / det[..., None, None]


def inv6_block(H):
    """Batched closed-form 6x6 SPD inverse via 3x3-block Schur."""
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    C = H[..., 3:, :3]
    D = H[..., 3:, 3:]
    Ai = inv3(A)
    S = D - C @ Ai @ B
    Si = inv3(S)
    AiB = Ai @ B
    top_left = Ai + AiB @ Si @ (C @ Ai)
    top_right = -AiB @ Si
    bot_left = -Si @ (C @ Ai)
    return jnp.concatenate([
        jnp.concatenate([top_left, top_right], axis=-1),
        jnp.concatenate([bot_left, Si], axis=-1),
    ], axis=-2)


def run_size(L):
    n = 6 * L
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n), jnp.float32)
    S = A @ A.T + n * jnp.eye(n)
    rhs = jax.random.normal(key, (n,), jnp.float32)
    blocks = S.reshape(L, 6, L, 6)[jnp.arange(L), :, jnp.arange(L), :]
    print(f"--- L={L} (n={n})", flush=True)

    def lu_step(c):
        r, acc = c
        x = jnp.linalg.solve(S, r)
        return (r + 1e-30 * x, acc + 1e-30 * jnp.sum(x))
    t_lu = amortized("jnp.linalg.solve", lu_step, (rhs, jnp.zeros(())))

    import jax.scipy.linalg as jsl

    def cho_step(c):
        r, acc = c
        cf = jsl.cho_factor(S)
        x = jsl.cho_solve(cf, r)
        return (r + 1e-30 * x, acc + 1e-30 * jnp.sum(x))
    t_cho = amortized("cho_factor+cho_solve", cho_step, (rhs, jnp.zeros(())))

    Pinv = inv6_block(blocks)

    def pcg_step(c):
        r, acc = c
        b = r.reshape(L, 6)

        def precond(v):
            return jnp.einsum("kij,kj->ki", Pinv, v)

        def body(_, cgc):
            x, rr, p, rz = cgc
            Sp = (S @ p.reshape(n)).reshape(L, 6)
            pSp = jnp.sum(p * Sp)
            alpha = rz / jnp.where(jnp.abs(pSp) < 1e-30, 1e-30, pSp)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = precond(rr)
            rzn = jnp.sum(rr * z)
            beta = rzn / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            return (x, rr, z + beta * p, rzn)

        z0 = precond(b)
        x, _, _, _ = jax.lax.fori_loop(
            0, 30, body, (jnp.zeros((L, 6)), b, z0, jnp.sum(b * z0)))
        return (r + 1e-30 * x.reshape(n), acc + 1e-30 * jnp.sum(x))
    t_pcg = amortized("block-Jacobi PCG(30)", pcg_step, (rhs, jnp.zeros(())))

    def inv_b_step(c):
        bl, acc = c
        I6 = jnp.linalg.inv(bl)
        return (bl + 1e-30 * I6, acc + 1e-30 * jnp.sum(I6))
    t_invb = amortized("jnp.linalg.inv [L,6,6]", inv_b_step,
                       (blocks, jnp.zeros(())))

    def inv_c_step(c):
        bl, acc = c
        I6 = inv6_block(bl)
        return (bl + 1e-30 * I6, acc + 1e-30 * jnp.sum(I6))
    t_invc = amortized("closed-form inv6 [L,6,6]", inv_c_step,
                       (blocks, jnp.zeros(())))

    # accuracy of PCG vs LU on this synthetic SPD system
    x_lu = jnp.linalg.solve(S, rhs)
    b = rhs.reshape(L, 6)
    def precond(v):
        return jnp.einsum("kij,kj->ki", Pinv, v)
    def body(_, cgc):
        x, rr, p, rz = cgc
        Sp = (S @ p.reshape(n)).reshape(L, 6)
        alpha = rz / jnp.sum(p * Sp)
        x = x + alpha * p
        rr = rr - alpha * Sp
        z = precond(rr)
        rzn = jnp.sum(rr * z)
        return (x, rr, z + rzn / rz * p, rzn)
    z0 = precond(b)
    x_cg, _, _, _ = jax.lax.fori_loop(
        0, 30, body, (jnp.zeros((L, 6)), b, z0, jnp.sum(b * z0)))
    rel = float(jnp.linalg.norm(x_cg.reshape(n) - x_lu)
                / jnp.linalg.norm(x_lu))
    print(f"  pcg-vs-lu rel err: {rel:.2e}", flush=True)
    return {"lu": t_lu, "cho": t_cho, "pcg": t_pcg,
            "inv_batched": t_invb, "inv_closed": t_invc}


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    out = {}
    for L in (12, 16, 24, 32, 48):
        out[L] = run_size(L)
    import json
    print(json.dumps({str(k): {kk: round(vv, 3) for kk, vv in v.items()}
                      for k, v in out.items()}))
