"""Benchmark: end-to-end dual-camera RGB-D tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (AlterPang/Multi_ORB_SLAM) is a real-time CPU system
driven at 30 fps camera rate with 1000+500 ORB features/frame
(OtherFiles/multi.yaml:23, rgbd_tum.cc:144-152); it publishes no fps numbers
(BASELINE.md), so 30 fps — the rate it must sustain to be "real-time" — is
the baseline. vs_baseline = our frames/s / 30.

The measured path is the full per-frame tracking pipeline (the reference's
Tracking-thread work): dual-camera ORB pyramid extraction, motion-model
projection search, motion-only BA, local-map search, second BA, on
synthetic 640x480 RGB-D frames.  Mapping (local BA etc.) runs on keyframe
insertions, excluded from the per-frame median exactly like the reference's
median tracking-time print (rgbd_tum.cc:160-169).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_orb_slam_tpu.config import SlamConfig
    from multi_orb_slam_tpu.frontend import tracking
    from multi_orb_slam_tpu.geometry import camera as cam_mod
    from multi_orb_slam_tpu.io import synthetic
    from multi_orb_slam_tpu.ops import orb

    H, W = 480, 640
    C = 2
    n_frames = 40
    cfg = SlamConfig(
        n_cams=C, width=W, height=H,
        orb=orb.ORBConfig(n_features=1024),
    )
    K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
    # dual rig ~90 deg apart like the reference's calibration.txt
    from multi_orb_slam_tpu.geometry import se3
    Ry = se3.so3_exp(jnp.asarray([0.0, 0.5, 0.0]))
    T_rc1 = jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(
        jnp.asarray([0.16, 0.004, -0.07]))
    T_rc = jnp.stack([jnp.eye(4), T_rc1])
    calib = cam_mod.CameraParams(
        K=K, dist=jnp.zeros((C, 5)), T_rc=T_rc, bf=jnp.asarray(40.0),
        width=W, height=H)

    seq = synthetic.make_sequence(
        n_frames=n_frames, K=np.asarray(K[0]), T_rc=np.asarray(T_rc),
        height=H, width=W, n_points=4000,
    )

    tracker = tracking.Tracker(calib, cfg, pipelined=True)
    # pre-stage all frames on device (the data-loading path is measured
    # separately; the reference's median likewise excludes image loading)
    dev_frames = []
    for grays, depths in zip(seq.grays, seq.depths):
        dev_frames.append((jnp.asarray(grays), jnp.asarray(depths)))
    jax.block_until_ready(dev_frames)

    warmup = 5
    for i in range(warmup):
        tracker.process(*dev_frames[i])
    jax.block_until_ready(tracker.Tcw)

    times = []
    t_start = time.perf_counter()
    for i in range(warmup, n_frames):
        t0 = time.perf_counter()
        tracker.process(*dev_frames[i])
        times.append(time.perf_counter() - t0)
    jax.block_until_ready(tracker.Tcw)
    tracker._resolve_pending()
    total = time.perf_counter() - t_start

    # throughput over the steady-state segment (pipelined: per-frame wall
    # clock overlaps device compute, like the reference's free-running
    # tracking thread)
    per_frame = total / (n_frames - warmup)
    median = float(np.median(times))
    fps = 1.0 / per_frame
    ok_frames = len(times)
    result = {
        "metric": "tracking_fps_dual_cam_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "median_ms": round(median * 1e3, 2),
        "frames_measured": ok_frames,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
