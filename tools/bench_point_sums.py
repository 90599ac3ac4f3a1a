#!/usr/bin/env python3
"""Shootout: point-block accumulation formulations for local BA.

The solver's per-iteration floor is the [LC, P]-shaped accumulation of
per-observation blocks (H_pp/b_p/W_cp, 30 floats each) through the inverse
observation map.  Candidates:

  gather   take_along_axis through inv_lc (current local_ba formulation)
  onehot   one-hot MXU matmul per row: S[r] = (inv[r] == iota_F) @ V[r],
           batched over LC as one dot_general (trades a [LC, P, F] bf16
           one-hot stream for MXU throughput)

Times with the fori-loop harness (block_until_ready lies on the axon
backend; a data dependence through the carry defeats LICM).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

L, C, F, P = 24, 2, 1024, 4096
LC = L * C
N = LC * F


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    mp = np.stack([rng.permutation(P)[:F] for _ in range(LC)]).astype(np.int32)
    inv = np.full((LC, P + 1), -1, np.int32)
    rows = np.arange(LC)[:, None]
    inv[rows, mp] = np.arange(F, dtype=np.int32)
    inv = inv[:, :P]
    V = rng.rand(LC, F, 30).astype(np.float32)
    return jnp.asarray(inv), jnp.asarray(V)


def sums_gather(inv, V):
    has = inv >= 0
    g = jnp.take_along_axis(V, jnp.clip(inv, 0, F - 1)[..., None], axis=1)
    g = g * has[..., None]
    return jnp.sum(g, axis=0), g


def sums_onehot(inv, V):
    # one-hot [LC, P, F] contracted with V [LC, F, 30] on the MXU
    oh = (inv[:, :, None] ==
          jnp.arange(F, dtype=jnp.int32)[None, None, :])
    ohf = oh.astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        ohf, V.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [LC, P, 30]
    return jnp.sum(g, axis=0), g


def timed(piece, inv, V, reps=20):
    @jax.jit
    def run(V):
        def body(i, acc):
            s, g = piece(inv, V + acc * 1e-30)
            return acc + jnp.sum(s) * 1e-30 + g[0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.))
    float(run(V))
    t0 = time.perf_counter()
    s = float(run(V))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    inv, V = make_inputs()
    a, ga = sums_gather(inv, V)
    b, gb = sums_onehot(inv, V)
    err = float(jnp.abs(a - b).max())
    print(f"consistency: max err {err:.2e} "
          f"(bf16 products of f32 in [0,1): expect <1e-2)")
    for name, fn in (("gather", sums_gather), ("onehot", sums_onehot)):
        print(f"{name:8s} {timed(fn, inv, V):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
