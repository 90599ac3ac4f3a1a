"""Trustworthy (fori-amortized, value-forced) mapping-stage profile on TPU."""
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
from multi_orb_slam_tpu.mapping import local_mapping, triangulation, fusion
from multi_orb_slam_tpu.ops import orb

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


def force(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def sync_overhead():
    x = jnp.zeros(())
    float(jnp.sum(x + 1.0))  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        float(jnp.sum(x + 1.0))
    return (time.perf_counter() - t0) / 5 * 1e3


def amortized(name, step, init, reps=8):
    """step: carry -> carry (shape-preserving). Times reps inside one jit."""
    @partial(jax.jit, static_argnums=(1,))
    def loop(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)
    # compile BOTH trip counts before timing (distinct static args)
    force(loop(init, 1))
    force(loop(init, reps + 1))
    t0 = time.perf_counter()
    o1 = loop(init, 1)
    force(o1)
    t1 = time.perf_counter()
    o2 = loop(init, reps + 1)
    force(o2)
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / reps * 1e3
    print(f"{name:40s} {per:8.2f} ms/iter", flush=True)
    return per


print(f"host sync overhead ~{sync_overhead():.1f} ms", flush=True)

# full mapping stage
amortized("run_mapping_stage (full)",
          lambda s: local_mapping._mapping_stage_fused(
              s, ks, fid, calib, cfg, cfg.ba_free_kfs, cfg.ba_fixed_kfs),
          st, reps=6)

# substages
amortized("cull_map_points",
          lambda s: local_mapping.cull_map_points(s, fid, cfg), st)
amortized("triangulate_new_points",
          lambda s: triangulation.triangulate_new_points(s, ks, calib, cfg)[0],
          st)
amortized("fuse_neighbors",
          lambda s: fusion.fuse_neighbors(s, ks, calib, cfg)[0], st)
amortized("cull_keyframes",
          lambda s: local_mapping.cull_keyframes(s, ks, cfg), st)
amortized("update_point_geometry",
          lambda s: tracking.update_point_geometry(s, cfg), st)

prob = local_mapping.build_local_problem(st, ks, cfg)
force(prob.kf_Tcw)
amortized("build_local_problem",
          lambda s: s._replace(
              kf_Tcw=s.kf_Tcw + 1e-30 * local_mapping.build_local_problem(
                  s, ks, cfg).kf_Tcw[0, 0, 0]),
          st)


def ba_step(p):
    kf_Tcw, mp_pos, inl = local_mapping.solve_ba_jit(
        p, calib.T_rc, calib.K, calib.bf, ((5, True), (8, False)))
    return p._replace(kf_Tcw=p.kf_Tcw + 1e-30 * kf_Tcw,
                      mp_pos=p.mp_pos + 1e-30 * mp_pos)

amortized("solve_ba (5+8)", ba_step, prob, reps=6)


def ba1_step(p):
    kf_Tcw, mp_pos, inl = local_mapping.solve_ba_jit(
        p, calib.T_rc, calib.K, calib.bf, ((1, True),))
    return p._replace(kf_Tcw=p.kf_Tcw + 1e-30 * kf_Tcw,
                      mp_pos=p.mp_pos + 1e-30 * mp_pos)

amortized("solve_ba (1 iter)", ba1_step, prob, reps=6)
