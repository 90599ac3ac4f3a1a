"""End-to-end mapping-stage latency per adaptive bucket, LICM/DCE-proof.

Times `_mapping_stage_fused` (cull -> triangulate -> fuse -> local BA ->
KF cull -> geometry refresh) per (window, schedule) bucket with the state
THREADED through the fori carry (the output map feeds the next call's
input, so XLA cannot hoist or eliminate the measured work), plus the bare
solve_ba at the same windows for the BA share.  This is the number the
driver's `mapping_ms_per_kf` should match.
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
    tr.map, s, tr.frame_id, calib, cfg,
    covis_hint=6)  # fixed small hint: keeps warmup off the big buckets
for i in range(56):  # full orbit: builds the bench's real ~5-KF map
    tr.process(jnp.asarray(grays[i]), jnp.asarray(depths[i]))
st = tr.map
ks = jnp.asarray(tr.last_kf_slot, jnp.int32)
fid = jnp.asarray(tr.frame_id, jnp.int32)
print(f"warm: n_kf={int(st.n_kf)} n_mp={int(st.n_mp)} "
      f"covis={int(local_mapping.covis_kf_count(st, ks))}", flush=True)


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    tot = jnp.zeros((), jnp.float32)
    for l in leaves:
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
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


results = {}
for nf in local_mapping._BA_WINDOW_BUCKETS:
    phases = local_mapping._BA_BUCKET_PHASES[nf]

    # bare solve at this bucket
    prob = local_mapping.build_local_problem(st, ks, cfg, nf, nf)
    force(prob)

    def ba_step(p, phases=phases):
        kf_Tcw, mp_pos, inl = local_mapping.solve_ba_jit(
            p, calib.T_rc, calib.K, calib.bf, phases)
        return p._replace(kf_Tcw=p.kf_Tcw + 1e-30 * kf_Tcw,
                          mp_pos=p.mp_pos + 1e-30 * mp_pos)

    t_ba = amortized(f"solve_ba bucket {nf} {phases}", ba_step, prob, reps=6)

    # full fused mapping stage, state-threaded
    def map_step(s, nf=nf, phases=phases):
        s2 = local_mapping._mapping_stage_fused(
            s, ks, fid, calib, cfg, nf, nf, phases)
        return s._replace(mp_pos=s.mp_pos + 1e-30 * s2.mp_pos,
                          kf_Tcw=s.kf_Tcw + 1e-30 * s2.kf_Tcw)

    t_map = amortized(f"mapping_stage_fused bucket {nf}", map_step, st,
                      reps=5)
    results[nf] = (t_ba, t_map)

import json
print(json.dumps({f"bucket_{k}": {"solve_ba_ms": round(v[0], 2),
                                  "mapping_ms": round(v[1], 2)}
                  for k, v in results.items()}))
