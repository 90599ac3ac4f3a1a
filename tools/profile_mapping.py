"""Per-substage device timing of the mapping stage on the real TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from multi_orb_slam_tpu.config import SlamConfig
    from multi_orb_slam_tpu.frontend import tracking
    from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
    from multi_orb_slam_tpu.io import synthetic
    from multi_orb_slam_tpu.mapping import local_mapping, triangulation, fusion, map_state as ms
    from multi_orb_slam_tpu.ops import orb

    H, W, C = 480, 640, 2
    cfg = SlamConfig(n_cams=C, width=W, height=H, orb=orb.ORBConfig(n_features=1024))
    K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
    Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
    T_rc1 = jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(jnp.asarray([0.161, 0.004, -0.071]))
    T_rc = jnp.stack([jnp.eye(4), T_rc1])
    calib = cam_mod.CameraParams(K=K, dist=jnp.zeros((C, 5)), T_rc=T_rc,
                                 bf=jnp.asarray(40.0), width=W, height=H)
    seq = synthetic.make_sequence(n_frames=30, K=np.asarray(K[0]),
                                  T_rc=np.asarray(T_rc), height=H, width=W,
                                  n_points=4000)
    tr = tracking.Tracker(calib, cfg)
    tr.kf_inserted_cb = lambda s: local_mapping.run_mapping_stage(
        tr.map, s, tr.frame_id, calib, cfg)
    for g, d in zip(seq.grays, seq.depths):
        tr.process(jnp.asarray(g), jnp.asarray(d))
    st = tr.map
    ks = tr.last_kf_slot
    print(f"warm: n_kf={int(st.n_kf)} n_mp={int(st.n_mp)}", flush=True)

    def timeit(name, fn, reps=10):
        out = fn(); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        print(f"{name:34s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

    fid = jnp.asarray(tr.frame_id, jnp.int32)
    timeit("cull_map_points", lambda: local_mapping.cull_map_points(st, fid, cfg))
    timeit("triangulate_new_points (scan5)", lambda: triangulation.triangulate_new_points(st, ks, calib, cfg))
    timeit("fuse_neighbors (scan5+1)", lambda: fusion.fuse_neighbors(st, ks, calib, cfg))
    prob = local_mapping.build_local_problem(st, jnp.asarray(ks, jnp.int32), cfg)
    jax.block_until_ready(prob)
    timeit("build_local_problem", lambda: local_mapping.build_local_problem(st, jnp.asarray(ks, jnp.int32), cfg))
    timeit("solve_ba", lambda: local_mapping.solve_ba_jit(prob, calib.T_rc, calib.K, calib.bf))
    timeit("cull_keyframes", lambda: local_mapping.cull_keyframes(st, jnp.asarray(ks, jnp.int32), cfg))
    timeit("update_point_geometry", lambda: tracking.update_point_geometry(st, cfg))
    t0 = time.perf_counter()
    out = local_mapping.run_mapping_stage(st, ks, tr.frame_id, calib, cfg)
    jax.block_until_ready(out.kf_Tcw)
    print(f"{'run_mapping_stage (1 cold-ish)':34s} {(time.perf_counter()-t0)*1e3:8.2f} ms", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = local_mapping.run_mapping_stage(st, ks, tr.frame_id, calib, cfg)
        jax.block_until_ready(out.kf_Tcw)
    print(f"{'run_mapping_stage (warm x5)':34s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
