"""Trustworthy (fori-amortized, value-forced) tracking-path profile on TPU.

`jax.block_until_ready` does not wait on the axon remote backend
(NOTES_ROUND2 gotcha #1), so every timing here threads a data dependence
through a fori_loop carry and forces one scalar at the end.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from multi_orb_slam_tpu.config import SlamConfig
from multi_orb_slam_tpu.frontend import frame as frame_mod, tracking
from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
from multi_orb_slam_tpu.ops import orb, search
from multi_orb_slam_tpu.optim import pose_opt

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
for i in range(12):
    tr.process(jnp.asarray(grays[i]), jnp.asarray(depths[i]))
st = tr.map
print(f"warm: n_kf={int(st.n_kf)} n_mp={int(st.n_mp)}", flush=True)

g = jnp.asarray(grays[12])
d = jnp.asarray(depths[12])
fr = frame_mod.build_frame(g, d, calib, cfg.orb)
prev = tr.prev_frame
prev_mp = tr.prev_mp
prev_Tcw = tr.prev_Tcw
vel = tr.velocity
tstate = jnp.asarray([tr.last_kf_frame, tr.ref_kf_tracked, 0], jnp.int32)
fid = jnp.asarray(tr.frame_id, jnp.int32)
lpts = tracking.build_local_points_cache(
    st, jnp.asarray(tr.last_kf_slot, jnp.int32), cfg)


def force(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def amortized(name, step, init, reps=12):
    @partial(jax.jit, static_argnums=(1,))
    def loop(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)
    force(loop(init, 1))
    force(loop(init, reps + 1))
    t0 = time.perf_counter()
    force(loop(init, 1))
    t1 = time.perf_counter()
    force(loop(init, reps + 1))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / reps * 1e3
    print(f"{name:44s} {per:8.2f} ms/iter", flush=True)
    return per


# --- frame building / extraction ---
def bf_step(c):
    img, acc = c
    f = frame_mod.build_frame(img, d, calib, cfg.orb)
    return (img + 1e-30 * f.xy[0, 0, 0], acc)

amortized("build_frame (2 cams)", bf_step, (g, jnp.zeros(())))


def ex_step(c):
    img, acc = c
    feats = orb.extract_orb(img[0], cfg.orb)
    return (img + 1e-30 * feats.xy[0, 0], acc)

amortized("extract_orb (1 cam)", ex_step, (g, jnp.zeros(())))

# --- full fused tracking step (state-preserving: feed output state back) ---
def fused_step(s):
    s2, Tcw, fmp, vel2, ts2, scal, _rs, _rp, _rf = tracking.track_frame_fused(
        s, prev, prev_Tcw, prev_mp, vel, tstate, lpts, fr, calib, cfg,
        fid)
    return s2

amortized("track_frame_fused", fused_step, st, reps=8)


# --- substages ---
def mm_step(c):
    s, T = c
    Tcw, fmp, nm, ni, nmi = tracking.track_motion_model(
        s, prev, T, prev_mp, vel, fr, calib, cfg)
    return (s, T + 1e-30 * Tcw)

amortized("track_motion_model (search+poseopt)", mm_step, (st, prev_Tcw))


def lm_step(c):
    s, T = c
    s2, Tcw, fmp, ni, nct, ncu = tracking.track_local_map(
        s, T, fr, prev_mp, lpts, calib, cfg)
    return (s2, T + 1e-30 * Tcw)

amortized("track_local_map (gather+search+poseopt)", lm_step, (st, prev_Tcw))

# pose opt alone
prev_pw, prev_ok = tracking.unproject_features(prev, prev_Tcw, calib)
obs = tracking._pose_obs_from_matches(
    fr, prev_pw, prev_ok & (prev_mp >= 0), cfg)


def po_step(c):
    T, acc = c
    Tcw, inl, ni = pose_opt.optimize_pose(T, obs, calib.T_rc, calib.K, calib.bf)
    return (T + 1e-30 * Tcw, acc)

amortized("optimize_pose (4x10)", po_step, (prev_Tcw, jnp.zeros(())))


def sp_step(c):
    T, acc = c
    msrc, mpw, mmp = search.search_prev_frame(
        prev_pw, prev_ok, prev.desc, prev.level, prev.angle, prev_mp,
        fr.xy_und, fr.uright, fr.level, fr.angle, fr.desc, fr.valid,
        T, calib.T_rc, calib.K, calib.bf,
        cfg.width, cfg.height, cfg.scale_factor, cfg.n_levels, th_radius=7.0)
    return (T + 1e-30 * mpw[0, 0, 0], acc)

amortized("search_prev_frame", sp_step, (prev_Tcw, jnp.zeros(())))


def ins_step(s):
    s2, kfmp = tracking.insert_keyframe_impl(
        s, fr, prev_Tcw, prev_mp, calib, cfg, fid)
    # keep shapes: use s2 but reset counters to avoid overflow drift
    return s2._replace(n_kf=s.n_kf, n_mp=s.n_mp, next_kf_id=s.next_kf_id,
                       kf_valid=s.kf_valid, mp_valid=s.mp_valid)

amortized("insert_keyframe_impl", ins_step, st, reps=8)
