"""Decompose the local-BA per-iteration cost on TPU.

Times `linearize` and `solve_step` (the two halves of one LM iteration of
`optim/local_ba.solve_ba`) separately, with outputs THREADED through the
fori carry (LICM-proof: each step's input depends on the previous step's
output) and values forced via a reduction (block_until_ready is unreliable
on the remote-attached backend, NOTES_ROUND2 #1).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from multi_orb_slam_tpu.config import SlamConfig
from multi_orb_slam_tpu.frontend import tracking
from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
from multi_orb_slam_tpu.mapping import local_mapping
from multi_orb_slam_tpu.ops import orb
from multi_orb_slam_tpu.optim import residuals, local_ba
from multi_orb_slam_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO

H, W, C = 480, 640, 2
cfg = SlamConfig(n_cams=C, width=W, height=H, orb=orb.ORBConfig(n_features=1024))
K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
T_rc1 = jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(jnp.asarray([0.161, 0.004, -0.071]))
T_rc = jnp.stack([jnp.eye(4), T_rc1])
calib = cam_mod.CameraParams(K=K, dist=jnp.zeros((C, 5)), T_rc=T_rc,
                             bf=jnp.asarray(40.0), width=W, height=H)

from _bench_data import load_bench_frames
grays, depths = load_bench_frames()

tr = tracking.Tracker(calib, cfg)
tr.kf_inserted_cb = lambda s: local_mapping.run_mapping_stage(
    tr.map, s, tr.frame_id, calib, cfg)
for i in range(34):
    tr.process(jnp.asarray(grays[i]), jnp.asarray(depths[i]))
st = tr.map
ks = jnp.asarray(tr.last_kf_slot, jnp.int32)
print(f"warm: n_kf={int(st.n_kf)} n_mp={int(st.n_mp)}", flush=True)


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    tot = jnp.zeros((), jnp.float32)
    for l in leaves:
        tot = tot + jnp.sum(l.astype(jnp.float32))
    return float(tot)


def amortized(name, step, init, reps=16):
    @partial(jax.jit, static_argnums=(1,))
    def loop(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)
    force(loop(init, 1))
    force(loop(init, reps + 1))
    t0 = time.perf_counter(); force(loop(init, 1)); t1 = time.perf_counter()
    force(loop(init, reps + 1)); t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / reps * 1e3
    print(f"{name:46s} {per:8.3f} ms/iter", flush=True)
    return per


def run_window(n_free, n_fixed):
    prob = local_mapping.build_local_problem(st, ks, cfg, n_free, n_fixed)
    force(prob)
    L, Cc, F = prob.obs_mp.shape
    P = prob.mp_pos.shape[0]
    N = L * Cc * F
    print(f"--- window {n_free}/{n_fixed}: L={L} P={P} N={N} "
          f"n_obs={int(jnp.sum(prob.obs_mp >= 0))}", flush=True)

    obs_kf = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[:, None, None], (L, Cc, F)).reshape(N)
    obs_cam = jnp.broadcast_to(
        jnp.arange(Cc, dtype=jnp.int32)[None, :, None], (L, Cc, F)).reshape(N)
    obs_mp = prob.obs_mp.reshape(N)
    obs_uvr = prob.obs_uvr.reshape(N, 3)
    mp_idx = jnp.clip(obs_mp, 0, P - 1)

    # residual+jacobian evaluation alone (threaded via mp_pos nudge)
    def res_step(c):
        mp_pos, acc = c
        Tcw_o = prob.kf_Tcw[obs_kf]
        Xw_o = mp_pos[mp_idx]
        e, Jc, Jp, is_st, posd = residuals.reproj_residual(
            Tcw_o, Xw_o, T_rc[obs_cam], K[obs_cam], calib.bf, obs_uvr)
        return (mp_pos + 1e-30 * jnp.sum(e) , acc + jnp.sum(Jc[0]) * 1e-30)

    amortized("reproj_residual+J [N]", res_step,
              (prob.mp_pos, jnp.zeros(())))

    # full solve at schedules (threaded through prob)
    def mk(phases):
        def stp(p):
            kf_Tcw, mp_pos, inl = local_mapping.solve_ba_jit(
                p, calib.T_rc, calib.K, calib.bf, phases)
            return p._replace(kf_Tcw=p.kf_Tcw + 1e-30 * kf_Tcw,
                              mp_pos=p.mp_pos + 1e-30 * mp_pos)
        return stp

    t1i = amortized("solve_ba ((1,True),)", mk(((1, True),)), prob, reps=8)
    t3 = amortized("solve_ba ((3,True),)", mk(((3, True),)), prob, reps=8)
    t5 = amortized("solve_ba ((5,True),)", mk(((5, True),)), prob, reps=8)
    print(f"  marginal/iter: {(t5 - t1i) / 4:.3f} ms", flush=True)
    full = amortized("solve_ba ((5,T),(8,F))", mk(((5, True), (8, False))),
                     prob, reps=6)
    return full


run_window(12, 12)
run_window(16, 16)
run_window(24, 24)
