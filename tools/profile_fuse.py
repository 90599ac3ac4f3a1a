"""Micro-profile of fuse_into_kf internals on TPU (fori-amortized)."""
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
from multi_orb_slam_tpu.mapping import local_mapping, fusion, map_state as ms
from multi_orb_slam_tpu.ops import orb, search, hamming

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
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def amortized(name, step, init, reps=10):
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


M = cfg.max_mp
own = st.kf_mp[ks].reshape(-1)
own_mask = jnp.zeros(M, bool).at[jnp.where(own >= 0, own, M - 1)].max(own >= 0)

# 1. whole fuse_into_kf
amortized("fuse_into_kf",
          lambda s: fusion.fuse_into_kf(s, own_mask, ks, cfg, calib)[0], st)

# 2. gather_local_points (cap=2048 over M=24576)
def g_step(s):
    pts = search.gather_local_points(s, own_mask & s.mp_valid, cfg.local_cap)
    return s._replace(mp_pos=s.mp_pos + 1e-30 * pts.pos[0, 0])
amortized("gather_local_points (top_k 2048/24576)", g_step, st)

pts = search.gather_local_points(st, own_mask & st.mp_valid, cfg.local_cap)
force(pts.pos)

# 3. search_points_in_frame
def s_step(s):
    match_mp, vis = search.search_points_in_frame(
        pts, s.kf_xy_und[ks], s.kf_uright[ks], s.kf_level[ks],
        s.kf_desc[ks], s.kf_feat_valid[ks],
        jnp.zeros((C, cfg.orb.n_features), bool),
        s.kf_Tcw[ks], calib.T_rc, calib.K, calib.bf,
        cfg.width, cfg.height, cfg.scale_factor, cfg.n_levels,
        th_radius=3.0, nn_ratio=1.0, th_hamming=50, use_view_cos=True)
    return s._replace(kf_Tcw=s.kf_Tcw + 1e-30 * match_mp[0, 0])
amortized("search_points_in_frame", s_step, st)

# 4. pairwise hamming alone [2048, 1024] x2 cams
def h_step(s):
    d0 = hamming.pairwise_hamming(pts.desc, s.kf_desc[ks][0])
    d1 = hamming.pairwise_hamming(pts.desc, s.kf_desc[ks][1])
    return s._replace(kf_Tcw=s.kf_Tcw + 1e-30 * (d0[0, 0] + d1[0, 0]))
amortized("pairwise_hamming x2", h_step, st)

# 5. mp_weighted_obs
def w_step(s):
    w = ms.mp_weighted_obs(s)
    return s._replace(kf_Tcw=s.kf_Tcw + 1e-30 * w[0])
amortized("mp_weighted_obs", w_step, st)

# 6. dedupe_obs_rows over full store
def d_step(s):
    kf = ms.dedupe_obs_rows(s.kf_mp, prefer_keep=(s.kf_mp >= 0))
    return s._replace(kf_mp=kf)
amortized("dedupe_obs_rows (full store)", d_step, st)

# 7. full-store remap gather
def r_step(s):
    repl = jnp.arange(M, dtype=jnp.int32)
    kf = jnp.where(s.kf_mp >= 0, repl[jnp.clip(s.kf_mp, 0, M - 1)], s.kf_mp)
    return s._replace(kf_mp=kf)
amortized("full-store replace gather", r_step, st)
