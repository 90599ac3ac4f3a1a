"""Per-stage device timing of the tracking hot path on the real TPU.

Times each jitted stage in a loop (post-warmup) so the ~30 ms tunnel sync
amortizes away; prints ms/call per stage.  Usage:
    python tools/profile_stages.py [n_reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np


def timeit(fn, args, reps, name):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    import jax.numpy as jnp

    from multi_orb_slam_tpu.config import SlamConfig
    from multi_orb_slam_tpu.frontend import frame as frame_mod
    from multi_orb_slam_tpu.frontend import tracking
    from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
    from multi_orb_slam_tpu.io import synthetic
    from multi_orb_slam_tpu.ops import orb

    H, W, C = 480, 640, 2
    cfg = SlamConfig(n_cams=C, width=W, height=H,
                     orb=orb.ORBConfig(n_features=1024))
    K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
    Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
    T_rc1 = jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(
        jnp.asarray([0.161, 0.004, -0.071]))
    T_rc = jnp.stack([jnp.eye(4), T_rc1])
    calib = cam_mod.CameraParams(K=K, dist=jnp.zeros((C, 5)), T_rc=T_rc,
                                 bf=jnp.asarray(40.0), width=W, height=H)
    seq = synthetic.make_sequence(n_frames=12, K=np.asarray(K[0]),
                                  T_rc=np.asarray(T_rc), height=H, width=W,
                                  n_points=4000)

    tracker = tracking.Tracker(calib, cfg, pipelined=False)
    frames = []
    for grays, depths in zip(seq.grays, seq.depths):
        g, d = jnp.asarray(grays), jnp.asarray(depths)
        frames.append((g, d))
        fr = frame_mod.build_frame(g, d, calib, cfg.orb)
        tracker.process_frame(fr)
    jax.block_until_ready(tracker.map.kf_Tcw)
    print(f"state after warm: n_kf={int(tracker.map.n_kf)} "
          f"n_mp={int(tracker.map.n_mp)} state={tracker.state}")

    g, d = frames[-1]
    fr = frame_mod.build_frame(g, d, calib, cfg.orb)
    jax.block_until_ready(fr)

    # stage timings
    timeit(lambda g, d: frame_mod.build_frame(g, d, calib, cfg.orb),
           (g, d), reps, "build_frame")
    timeit(lambda im: orb.extract_orb(im, cfg.orb), (g[0],), reps,
           "extract_orb (1 cam)")

    st = tracker.map
    prev = tracker.prev_frame
    prev_mp = tracker.prev_mp
    prev_Tcw = tracker.prev_Tcw
    vel = tracker.velocity

    timeit(lambda: tracking.track_motion_model(
        st, prev, prev_Tcw, prev_mp, vel, fr, calib, cfg), (), reps,
        "track_motion_model")
    lpts = tracking.build_local_points_cache(
        st, jnp.asarray(tracker.last_kf_slot, jnp.int32), cfg)
    timeit(lambda: tracking.track_local_map(
        st, prev_Tcw, fr, prev_mp, lpts, calib, cfg), (), reps,
        "track_local_map")
    timeit(lambda: tracking.insert_keyframe_jit(
        st, fr, prev_Tcw, prev_mp, calib, cfg,
        jnp.asarray(99, jnp.int32)), (), reps, "insert_keyframe")
    tstate = jnp.asarray([0, 100, 0], jnp.int32)
    timeit(lambda: tracking.track_frame_fused(
        st, prev, prev_Tcw, prev_mp, vel, tstate, lpts, fr, calib, cfg,
        jnp.asarray(99, jnp.int32)), (), reps, "track_frame_fused")
    timeit(lambda: tracking.track_frame_fused_images(
        st, prev, prev_Tcw, prev_mp, vel, tstate, lpts, g, d, calib, cfg,
        jnp.asarray(99, jnp.int32)), (), reps, "track_frame_fused_images")

    # sub-stages of extraction
    from multi_orb_slam_tpu.ops import pallas_kernels as pk
    canvas = jnp.zeros((8, H, W), jnp.float32).at[:, :, :].set(
        jnp.broadcast_to(g[0], (8, H, W)))
    timeit(jax.jit(pk.fast_score_pallas), (canvas,), reps,
           "fast_score_pallas [8,480,640]")

    from multi_orb_slam_tpu.optim import pose_opt
    from multi_orb_slam_tpu.config import inv_sigma2_of_level
    F = cfg.orb.n_features
    uvr = jnp.concatenate([fr.xy_und, fr.uright[..., None]], -1)
    cam_idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None],
                               (C, F)).reshape(-1)
    rng = np.random.RandomState(0)
    obs = pose_opt.PoseObs(
        pw=jnp.asarray(rng.uniform(-2, 2, (C * F, 3)).astype(np.float32)),
        uvr=uvr.reshape(C * F, 3),
        cam_idx=cam_idx,
        inv_sigma2=inv_sigma2_of_level(fr.level, cfg).reshape(C * F),
        mask=fr.valid.reshape(C * F),
    )
    timeit(jax.jit(lambda T, o: pose_opt.optimize_pose(
        T, o, calib.T_rc, calib.K, calib.bf)), (prev_Tcw, obs), reps,
        "optimize_pose (4x10 LM)")


if __name__ == "__main__":
    main()
