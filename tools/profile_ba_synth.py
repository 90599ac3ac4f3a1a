"""Fast local-BA profiling on a SYNTHETIC problem (no tracker warmup).

Builds a structurally realistic BAProblem directly — L keyframes on an
orbit, P points on a plane, ~56 observations per (KF, cam) row (the
measured occupancy of the benchmark steady state) — and measures
solve_ba schedules + a straightline LM iteration, LICM-proof.  Setup is
seconds instead of the tracker profilers' ~10 min, so solver changes can
be measured in one edit-run cycle.

Run: python tools/profile_ba_synth.py [n_free]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from multi_orb_slam_tpu.geometry import se3
from multi_orb_slam_tpu.optim import local_ba

C = 2
F = 1024
P = 2048
OBS_PER_ROW = 160   # upper end of real per-(KF,cam) observation counts


def make_problem(n_free, n_fixed, seed=0):
    rng = np.random.RandomState(seed)
    L = n_free + n_fixed
    # cameras on an arc looking at a point cloud 3m away
    kf_Tcw = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    for i in range(L):
        ang = 0.03 * i
        R = np.asarray(se3.so3_exp(jnp.asarray([0.0, ang, 0.0])))
        kf_Tcw[i, :3, :3] = R
        kf_Tcw[i, :3, 3] = [-0.1 * i, 0.0, 0.0]
    mp_pos = np.stack([
        rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
        rng.uniform(2.5, 3.5, P)], -1).astype(np.float32)
    obs_mp = np.full((L, C, F), -1, np.int32)
    obs_uvr = np.zeros((L, C, F, 3), np.float32)
    for l in range(L):
        for c in range(C):
            pts = rng.choice(P, OBS_PER_ROW, replace=False)
            obs_mp[l, c, :OBS_PER_ROW] = pts
            # plausible pixel obs with noise; stereo for half
            obs_uvr[l, c, :OBS_PER_ROW, 0] = rng.uniform(0, 640, OBS_PER_ROW)
            obs_uvr[l, c, :OBS_PER_ROW, 1] = rng.uniform(0, 480, OBS_PER_ROW)
            st = rng.rand(OBS_PER_ROW) < 0.5
            obs_uvr[l, c, :OBS_PER_ROW, 2] = np.where(
                st, obs_uvr[l, c, :OBS_PER_ROW, 0] - 13.0, -1.0)
    prob = local_ba.BAProblem(
        kf_slot=jnp.arange(L, dtype=jnp.int32),
        kf_Tcw=jnp.asarray(kf_Tcw),
        kf_free=jnp.asarray(np.arange(L) < n_free),
        kf_valid=jnp.ones(L, bool),
        mp_slot=jnp.arange(P, dtype=jnp.int32),
        mp_pos=jnp.asarray(mp_pos),
        mp_valid=jnp.ones(P, bool),
        obs_mp=jnp.asarray(obs_mp),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_inv_sigma2=jnp.ones((L, C, F), jnp.float32),
    )
    return prob


def force(x):
    tot = jnp.zeros((), jnp.float32)
    for l in jax.tree_util.tree_leaves(x):
        tot = tot + jnp.sum(l.astype(jnp.float32))
    return float(tot)


def amortized(name, step, init, reps=8):
    @partial(jax.jit, static_argnums=(1,))
    def loop(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)
    force(loop(init, 1))
    force(loop(init, reps + 1))
    t0 = time.perf_counter(); force(loop(init, 1)); t1 = time.perf_counter()
    force(loop(init, reps + 1)); t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / reps * 1e3
    print(f"{name:46s} {per:8.3f} ms", flush=True)
    return per


K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
T_rc1 = (jnp.eye(4).at[:3, :3].set(Ry)
         .at[:3, 3].set(jnp.asarray([0.161, 0.004, -0.071])))
T_rc = jnp.stack([jnp.eye(4), T_rc1])
bf = jnp.asarray(40.0)

solve_jit = jax.jit(local_ba.solve_ba, static_argnums=(4,))

if __name__ == "__main__":
    sizes = [int(sys.argv[1])] if len(sys.argv) > 1 else [12, 16, 24, 32]
    print(f"platform: {jax.devices()[0].platform}  F={F} P={P} "
          f"obs/row={OBS_PER_ROW}", flush=True)
    out = {}
    for nf in sizes:
        prob = make_problem(nf, nf)
        force(prob)
        print(f"--- window {nf}/{nf} (L={2*nf}, N={2*nf*C*F})", flush=True)

        def one(p, phases=((1, True),)):
            kT, mp, inl = solve_jit(p, T_rc, K, bf, phases)
            return p._replace(kf_Tcw=p.kf_Tcw + 1e-30 * kT,
                              mp_pos=p.mp_pos + 1e-30 * mp)

        t1 = amortized("solve_ba ((1,True),)", lambda p: one(p), prob)
        t5 = amortized("solve_ba ((5,True),)",
                       lambda p: one(p, ((5, True),)), prob)
        tfull = amortized("solve_ba ((5,T),(8,F))",
                          lambda p: one(p, ((5, True), (8, False))), prob,
                          reps=6)
        per_it = (t5 - t1) / 4
        print(f"  marginal/iter {per_it:.3f} ms   fixed/call "
              f"{t1 - per_it:.3f} ms", flush=True)
        out[nf] = {"it1": round(t1, 2), "it5": round(t5, 2),
                   "full": round(tfull, 2), "per_iter": round(per_it, 3)}
    import json
    print(json.dumps(out), flush=True)
