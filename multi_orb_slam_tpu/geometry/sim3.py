"""Sim(3) operations for loop closing and pose-graph optimization.

Replaces g2o's `Sim3` type (reference: Thirdparty/g2o/g2o/types/sim3.h) used by
`OptimizeEssentialGraph` / `OptimizeSim3` (reference: src/Optimizer.cc:1373,
1704).  A Sim3 element is stored as an (s, R, t) triple packed into a (..., 8)
array: [tx, ty, tz, qx, qy, qz, qw, s].  The group action is
`x -> s * R @ x + t`.  Tangent vectors are (..., 7): [upsilon, omega, sigma]
with sigma = log s.

All functions broadcast over leading batch dimensions and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def pack(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    q = se3.to_quaternion(R)
    s = jnp.asarray(s, dtype=t.dtype)
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def unpack(g: jnp.ndarray):
    t = g[..., 0:3]
    q = g[..., 3:7]
    s = g[..., 7]
    return s, se3.from_quaternion(q), t


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)


def from_se3(T: jnp.ndarray, s=None) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if s is None:
        s = jnp.ones(T.shape[:-2], dtype=T.dtype)
    return pack(s, R, t)


def to_se3(g: jnp.ndarray) -> jnp.ndarray:
    """SE3 from Sim3 by folding the scale into the translation: [R | t/s].

    Matches the loop-closing pose recovery in the reference
    (src/LoopClosing.cc:700-712 and src/Optimizer.cc:1680-1690: `[R | t/s]`).
    """
    s, R, t = unpack(g)
    return se3.from_rt(R, t / jnp.maximum(s[..., None], _EPS))


def apply(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Action on points: s*R@x + t. Supports (..., 3) or (..., N, 3)."""
    s, R, t = unpack(g)
    n_batch = g.ndim - 1
    if x.ndim == n_batch + 2:  # (..., N, 3)
        return s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, x) + t[..., None, :]
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Group product a*b acting as a(b(x))."""
    sa, Ra, ta = unpack(a)
    sb, Rb, tb = unpack(b)
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return pack(s, R, t)


def inverse(g: jnp.ndarray) -> jnp.ndarray:
    s, R, t = unpack(g)
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / jnp.maximum(s, _EPS)
    tinv = -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return pack(sinv, Rt, tinv)


def _W(omega: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) translation integral W with t = W @ upsilon.

    W = cI*I + cK*K + cK2*K^2 with the closed-form coefficients of
    Strasdat's Sim(3) exponential, series-expanded near theta=0 / sigma=0.
    """
    dtype = omega.dtype
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    s = jnp.exp(sigma)
    K = se3.hat(omega)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)

    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-4
    small_th = theta < 1e-4
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_sig2 = jnp.where(small_sig, 1.0, sig2)
    safe_th2 = jnp.where(small_th, 1.0, theta2)
    safe_th = jnp.where(small_th, 1.0, theta)
    c = sig2 + theta2
    safe_c = jnp.maximum(c, _EPS)

    # coeff of I: (s-1)/sigma, limit 1 + sigma/2 + sigma^2/6.
    cI = jnp.where(
        small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / safe_sig
    )

    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    # coeff of K
    cK_gen = (a * sigma + (1.0 - b) * theta) / (safe_th * safe_c)
    cK_sig0 = (1.0 - jnp.cos(theta)) / safe_th2
    cK_th0 = ((sigma - 1.0) * s + 1.0) / safe_sig2
    cK_both = 0.5 + sigma / 3.0
    cK = jnp.where(
        small_th,
        jnp.where(small_sig, cK_both, cK_th0),
        jnp.where(small_sig, cK_sig0, cK_gen),
    )

    # coeff of K^2
    cK2_gen = (cI - ((b - 1.0) * sigma + a * theta) / safe_c) / safe_th2
    cK2_sig0 = (theta - jnp.sin(theta)) / (safe_th2 * safe_th)
    cK2_th0 = (s * (0.5 * sig2 - sigma + 1.0) - 1.0) / (safe_sig2 * safe_sig)
    cK2_both = 1.0 / 6.0 + sigma / 8.0
    cK2 = jnp.where(
        small_th,
        jnp.where(small_sig, cK2_both, cK2_th0),
        jnp.where(small_sig, cK2_sig0, cK2_gen),
    )

    return cI[..., None, None] * eye + cK[..., None, None] * K + cK2[..., None, None] * K2


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent (..., 7) [upsilon, omega, sigma] -> Sim3 (..., 8)."""
    upsilon = xi[..., 0:3]
    omega = xi[..., 3:6]
    sigma = xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _W(omega, sigma), upsilon)
    return pack(s, R, t)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Sim3 (..., 8) -> tangent (..., 7). Solves t = W @ upsilon."""
    s, R, t = unpack(g)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    omega = se3.so3_log(R)
    W = _W(omega, sigma)
    upsilon = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([upsilon, omega, sigma[..., None]], axis=-1)
