"""Micro-profile of mapping-stage primitives on TPU (amortized, DCE-proof).

Every step threads a reduction over ALL outputs into the fori carry so XLA
cannot dead-code-eliminate any part of the measured op.
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
from multi_orb_slam_tpu.mapping import (fusion, local_mapping, map_state as ms,
                                        triangulation)
from multi_orb_slam_tpu.ops import orb, search
from multi_orb_slam_tpu.optim import local_ba

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
fid = jnp.asarray(tr.frame_id, jnp.int32)
print(f"warm: n_kf={int(st.n_kf)} n_mp={int(st.n_mp)}", flush=True)


def _redsum(x):
    leaves = jax.tree_util.tree_leaves(x)
    tot = jnp.zeros((), jnp.float32)
    for l in leaves:
        tot = tot + jnp.sum(l.astype(jnp.float32))
    return tot


def force(x):
    return float(_redsum(x))


def amortized(name, step, init, reps=10):
    """step: carry -> carry.  Carry should fold _redsum of outputs back in."""
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
KK = cfg.max_kf
acc0 = jnp.zeros((), jnp.float32)

# --- primitive: mp_weighted_obs (scatter-add 393k -> M) ---
def wobs_step(c):
    s, acc = c
    w = ms.mp_weighted_obs(s)
    return (s, acc + _redsum(w) * 1e-30)

amortized("mp_weighted_obs (scatter-add)", wobs_step, (st, acc0))

# --- primitive: observation_matrix + covisibility matmul ---
def cov_step(c):
    s, acc = c
    Wc = ms.covisibility(s)
    return (s, acc + _redsum(Wc) * 1e-30)

amortized("covisibility ([K,M] scatter + matmul)", cov_step, (st, acc0))

# --- primitive: gather_local_points (top_k over M) ---
mask = st.mp_valid
def glp_step(c):
    s, acc = c
    pts = search.gather_local_points(s, mask, cfg.local_cap)
    return (s, acc + _redsum(pts) * 1e-30)

amortized("gather_local_points (top_k M=24k)", glp_step, (st, acc0))

# --- primitive: dedupe_obs_rows over full store ---
def dd_step(c):
    s, acc = c
    r = ms.dedupe_obs_rows(s.kf_mp)
    return (s, acc + _redsum(r) * 1e-30)

amortized("dedupe_obs_rows (full store argsort)", dd_step, (st, acc0))

# --- one _fuse_step ---
pts = search.gather_local_points(st, st.mp_valid, cfg.local_cap)
rep0 = jnp.arange(M, dtype=jnp.int32)
cnt0 = ms.mp_weighted_obs(st)
def fs_step(c):
    s, acc = c
    s2, rep, cnt, n = fusion._fuse_step(s, pts, ks, rep0, cnt0, cfg, calib)
    return (s, acc + _redsum((rep, cnt, n)) * 1e-30
            + _redsum(s2.kf_mp) * 1e-30)

amortized("_fuse_step (one target)", fs_step, (st, acc0))

# --- search_points_in_frame on a KF (as used by fusion) ---
def spif_step(c):
    s, acc = c
    m, vis = search.search_points_in_frame(
        pts, s.kf_xy_und[ks], s.kf_uright[ks], s.kf_level[ks],
        s.kf_desc[ks], s.kf_feat_valid[ks], jnp.zeros((C, cfg.max_feat), bool),
        s.kf_Tcw[ks], calib.T_rc, calib.K, calib.bf,
        cfg.width, cfg.height, cfg.scale_factor, cfg.n_levels,
        th_radius=3.0, nn_ratio=1.0, th_hamming=50, use_view_cos=True)
    return (s, acc + _redsum((m, vis)) * 1e-30)

amortized("search_points_in_frame (fuse-style)", spif_step, (st, acc0))

# --- build_local_problem (full outputs forced) ---
def blp_step(c):
    s, acc = c
    prob = local_mapping.build_local_problem(s, ks, cfg, 12, 12)
    return (s, acc + _redsum(prob) * 1e-30)

amortized("build_local_problem (forced)", blp_step, (st, acc0))

# --- point_sums_pallas at solver shapes ---
from multi_orb_slam_tpu.ops import pallas_kernels as pk
L = 24
LC = L * C
F = cfg.max_feat
P = cfg.ba_local_cap
key = jax.random.PRNGKey(0)
V = jax.random.normal(key, (LC, F, 30), jnp.float32)
inv = jnp.where(jax.random.uniform(key, (LC, P)) < 0.15,
                jax.random.randint(key, (LC, P), 0, F), -1).astype(jnp.int32)

def psum_step(c):
    v, acc = c
    summed, gathered = pk.point_sums_pallas(v, inv)
    return (v + 1e-30 * summed[0, 0], acc + _redsum(gathered) * 1e-30)

amortized("point_sums_pallas [48,1024,4096,30]", psum_step, (V, acc0))

# --- linalg.solve at [144, 144] ---
A = jax.random.normal(key, (L * 6, L * 6), jnp.float32)
A = A @ A.T + 144 * jnp.eye(L * 6)
b = jax.random.normal(key, (L * 6,), jnp.float32)

def solve_step(c):
    bb, acc = c
    x = jnp.linalg.solve(A, bb)
    return (bb + 1e-30 * x, acc)

amortized("jnp.linalg.solve [144]", solve_step, (b, acc0))

def cho_step(c):
    bb, acc = c
    cf = jax.scipy.linalg.cho_factor(A)
    x = jax.scipy.linalg.cho_solve(cf, bb)
    return (bb + 1e-30 * x, acc)

amortized("cho_factor+solve [144]", cho_step, (b, acc0))

# --- solve_ba phase scaling: per-iteration marginal cost ---
prob = local_mapping.build_local_problem(st, ks, cfg, 12, 12)
force(prob)

def mk_ba(phases):
    def step(p):
        kf_Tcw, mp_pos, inl = local_mapping.solve_ba_jit(
            p, calib.T_rc, calib.K, calib.bf, phases)
        return p._replace(kf_Tcw=p.kf_Tcw + 1e-30 * kf_Tcw,
                          mp_pos=p.mp_pos + 1e-30 * mp_pos)
    return step

t2 = amortized("solve_ba ((2,True),)", mk_ba(((2, True),)), prob, reps=6)
t4 = amortized("solve_ba ((4,True),)", mk_ba(((4, True),)), prob, reps=6)
print(f"  -> marginal per-LM-iteration: {(t4 - t2) / 2:.2f} ms", flush=True)

# --- triangulation ---
def tri_step(c):
    s, acc = c
    s2, n = triangulation.triangulate_new_points(s, ks, calib, cfg)
    return (s, acc + _redsum((s2.mp_pos, n)) * 1e-30)

amortized("triangulate_new_points (forced)", tri_step, (st, acc0))

# --- cull paths (forced) ---
def cmp_step(c):
    s, acc = c
    s2 = local_mapping.cull_map_points(s, fid, cfg)
    return (s, acc + _redsum((s2.mp_valid, s2.kf_mp, s2.n_mp)) * 1e-30)

amortized("cull_map_points (forced)", cmp_step, (st, acc0))

def ckf_step(c):
    s, acc = c
    s2 = local_mapping.cull_keyframes(s, ks, cfg)
    return (s, acc + _redsum((s2.kf_valid, s2.kf_mp, s2.n_kf)) * 1e-30)

amortized("cull_keyframes (forced)", ckf_step, (st, acc0))

def upg_step(c):
    s, acc = c
    s2 = tracking.update_point_geometry(s, cfg)
    return (s, acc + _redsum((s2.mp_normal, s2.mp_min_dist)) * 1e-30)

amortized("update_point_geometry (forced)", upg_step, (st, acc0))
