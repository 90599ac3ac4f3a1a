#!/usr/bin/env python3
"""Distributed global-BA scaling protocol.

BASELINE.md's scaling target (>= 70% frames/s efficiency 1 -> N hosts on
distributed BA) needs N real chips; this container exposes ONE chip, so
this script documents + validates the protocol and measures what it can:

- on a multi-chip/multi-host slice: run with no arguments on every host
  (jax.distributed auto-init) and compare the reported walltime per outer
  iteration between N=1 and N=all runs;
- on this single-chip container: `--devices 8 --platform cpu` exercises the
  sharded program on the 8-device virtual CPU mesh (numerics parity with
  N=1 is asserted in tests/test_dist_ba.py; CPU walltime is NOT a scaling
  measurement).

Prints one JSON line with the per-iteration walltime.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="0 = all available devices")
    ap.add_argument("--platform", default=None,
                    help="force cpu to use the virtual-device mesh")
    ap.add_argument("--kfs", type=int, default=128)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--obs-per-kf", type=int, default=512)
    ap.add_argument("--outer", type=int, default=6)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu" and args.devices:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices}")
        # the session interpreter pins JAX_PLATFORMS=axon via sitecustomize
        # BEFORE main() runs; env vars alone cannot re-point the backend
        import jax
        import jax.extend.backend
        jax.config.update("jax_platforms", args.platform)
        jax.extend.backend.clear_backends()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from multi_orb_slam_tpu.parallel import dist_ba, multihost

    multihost.initialize()
    devs = jax.devices()
    n_dev = args.devices or len(devs)
    mesh = Mesh(np.array(devs[:n_dev]), ("data",))

    rng = np.random.RandomState(0)
    Kf, M = args.kfs, args.points
    M = (M // n_dev) * n_dev
    C, F = 1, args.obs_per_kf
    kf_Tcw = np.tile(np.eye(4, dtype=np.float32), (Kf, 1, 1))
    for k in range(Kf):
        kf_Tcw[k, 0, 3] = 0.05 * k
    kf_valid = np.ones(Kf, bool)
    kf_free = np.ones(Kf, bool)
    kf_free[0] = False
    pts = rng.uniform(-4, 4, (M, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    mp_valid = np.ones(M, bool)
    kf_mp = np.full((Kf, C, F), -1, np.int32)
    uvr = np.zeros((Kf, C, F, 3), np.float32)
    Kintr = np.array([[500.0, 500.0, 320.0, 240.0]], np.float32)
    bf = np.float32(40.0)
    for k in range(Kf):
        sel = rng.choice(M, F, replace=False)
        Xc = pts @ kf_Tcw[k, :3, :3].T + kf_Tcw[k, :3, 3]
        for j, p in enumerate(sel):
            if Xc[p, 2] < 0.3:
                continue
            u = Kintr[0, 0] * Xc[p, 0] / Xc[p, 2] + Kintr[0, 2]
            v = Kintr[0, 1] * Xc[p, 1] / Xc[p, 2] + Kintr[0, 3]
            kf_mp[k, 0, j] = p
            uvr[k, 0, j] = [u + rng.randn() * 0.5, v + rng.randn() * 0.5,
                            u - bf / Xc[p, 2]]
    is2 = np.ones((Kf, C, F), np.float32)

    flat = dist_ba.flatten_problem(
        kf_Tcw, kf_valid, kf_free, kf_mp, uvr, is2, pts, mp_valid, n_dev)
    step = dist_ba.make_dist_ba_step(mesh, n_outer=args.outer, cg_iters=40)
    T_rc = jnp.asarray(np.eye(4, dtype=np.float32)[None])

    def force(x):
        # block_until_ready returns before the queue drains on the axon
        # remote backend (NOTES_ROUND2 gotcha #1): force via reduction
        tot = 0.0
        for leaf in jax.tree_util.tree_leaves(x):
            tot += float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))
        return tot

    out = step(flat, T_rc, jnp.asarray(Kintr), jnp.asarray(bf))
    force(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(flat, T_rc, jnp.asarray(Kintr), jnp.asarray(bf))
        force(out)
    dt = (time.perf_counter() - t0) / reps
    costs = np.asarray(out[2])
    print(json.dumps({
        "metric": "dist_gba_s_per_outer_iter",
        "value": round(dt / args.outer, 4),
        "unit": "s",
        "devices": n_dev,
        "platform": devs[0].platform,
        "kfs": Kf, "points": M,
        "cost_first": float(costs[0]), "cost_last": float(costs[-1]),
    }))


if __name__ == "__main__":
    main()
