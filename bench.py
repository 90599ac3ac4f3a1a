"""Benchmark: end-to-end dual-camera RGB-D tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference (AlterPang/Multi_ORB_SLAM) built and run on this
machine (BASELINE_MEASURED.md) sustains 30.1 fps median on the same
synthetic TUM-layout dual-camera sequence with 1000+500 ORB features
(OtherFiles/multi.yaml:23, rgbd_tum.cc:144-152) — which matches the 30 fps
real-time camera budget, so vs_baseline = our frames/s / 30.

The measured path is the FULL pipeline: dual-camera ORB pyramid extraction,
motion-model projection search, motion-only BA, local-map search, second BA,
keyframe insertion, AND the mapping stage (culling, triangulation, fusion,
local BA, KF culling) at every keyframe — unlike the reference's median
tracking time, which hides mapping on a parallel thread, the headline fps
here includes it.  Per-KF mapping latency is reported separately.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np  # noqa: E402

FRAME_CACHE = "/tmp/bench_frames_v2.npz"


def load_frames(n_frames, K, T_rc, H, W):
    """Render (or reload) the synthetic benchmark sequence."""
    from multi_orb_slam_tpu.io import synthetic

    if os.path.exists(FRAME_CACHE):
        try:
            z = np.load(FRAME_CACHE)
            if z["grays"].shape[0] == n_frames:
                return z["grays"], z["depths"]
        except Exception:
            pass
    seq = synthetic.make_sequence(
        n_frames=n_frames, K=np.asarray(K[0]), T_rc=np.asarray(T_rc),
        height=H, width=W, n_points=4000)
    grays = np.stack(seq.grays).astype(np.float32)
    depths = np.stack(seq.depths).astype(np.float32)
    try:
        np.savez(FRAME_CACHE, grays=grays, depths=depths)
    except Exception:
        pass
    return grays, depths


def main():
    import jax
    import jax.numpy as jnp

    from multi_orb_slam_tpu.config import SlamConfig
    from multi_orb_slam_tpu.frontend import tracking
    from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
    from multi_orb_slam_tpu.mapping import local_mapping
    from multi_orb_slam_tpu.ops import orb

    H, W = 480, 640
    C = 2
    n_frames = 60
    warmup = 8
    cfg = SlamConfig(
        n_cams=C, width=W, height=H,
        orb=orb.ORBConfig(n_features=1024),
    )
    K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
    # dual rig ~29 deg apart like the reference's calibration.txt
    Ry = se3.so3_exp(jnp.asarray([0.0, 0.5, 0.0]))
    T_rc1 = jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(
        jnp.asarray([0.16, 0.004, -0.07]))
    T_rc = jnp.stack([jnp.eye(4), T_rc1])
    calib = cam_mod.CameraParams(
        K=K, dist=jnp.zeros((C, 5)), T_rc=T_rc, bf=jnp.asarray(40.0),
        width=W, height=H)

    grays, depths = load_frames(n_frames, K, T_rc, H, W)

    tracker = tracking.Tracker(calib, cfg, pipelined=True, pipeline_depth=3)
    n_kf_mapped = [0]
    covis_pending = [None]

    def kf_cb(kf_slot):
        # async, like the reference's mapping thread: dispatch the mapping
        # work and return the (device-future) map; the tracker's next step
        # chains on it without a host sync.  The adaptive-BA window hint is
        # the previous KF's covisible count (resolved one KF later).
        n_kf_mapped[0] += 1
        hint = (int(covis_pending[0])
                if covis_pending[0] is not None else None)
        m = local_mapping.run_mapping_stage(
            tracker.map, kf_slot, tracker.frame_id, calib, cfg,
            covis_hint=hint)
        if cfg.ba_adaptive:
            covis_pending[0] = local_mapping.covis_kf_count(
                m, jnp.asarray(kf_slot, jnp.int32))
        return m

    tracker.kf_inserted_cb = kf_cb

    # pre-stage all frames on device (the data-loading path is measured
    # separately; the reference's median likewise excludes image loading)
    dev_frames = [(jnp.asarray(grays[i]), jnp.asarray(depths[i]))
                  for i in range(n_frames)]
    jax.block_until_ready(dev_frames)

    for i in range(warmup):
        tracker.process(*dev_frames[i])
    # compile the mapping stage up front so the first real keyframe in the
    # measured window doesn't pay the compile
    _pre = local_mapping.run_mapping_stage(
        tracker.map, 0, tracker.frame_id, calib, cfg)
    float(jnp.sum(_pre.kf_Tcw))  # forced: block_until_ready lies on axon
    del _pre
    n_kf_mapped[0] = 0
    float(jnp.sum(tracker.Tcw))

    times = []
    t_start = time.perf_counter()
    for i in range(warmup, n_frames):
        t0 = time.perf_counter()
        tracker.process(*dev_frames[i])
        times.append(time.perf_counter() - t0)
    tracker._resolve_pending()
    float(jnp.sum(tracker.Tcw))  # forced: true end-of-window barrier
    total = time.perf_counter() - t_start

    # throughput over the steady-state segment, INCLUDING mapping stages
    # (they dispatch asynchronously, but their device time is inside the
    # measured wall-clock window because the final block waits everything)
    per_frame = total / (n_frames - warmup)
    median = float(np.median(times))
    fps = 1.0 / per_frame

    # standalone per-KF mapping-stage latency, measured separately so the
    # throughput path stays async.  Values are FORCED (float of a
    # reduction): block_until_ready on the remote-attached backend returns
    # before the queue drains (NOTES_ROUND2 gotcha #1), which both lets
    # stale queue time leak into this window and under-measures the op.
    float(jnp.sum(tracker.Tcw))  # true barrier: drain everything queued
    t0 = time.perf_counter()
    _m = local_mapping.run_mapping_stage(
        tracker.map, int(tracker.last_kf_slot), tracker.frame_id, calib, cfg)
    float(jnp.sum(_m.kf_Tcw))
    mapping_ms = (time.perf_counter() - t0) * 1e3

    result = {
        "metric": "tracking_fps_dual_cam_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "median_ms": round(median * 1e3, 2),
        "frames_measured": len(times),
        "keyframes_mapped": n_kf_mapped[0],
        "mapping_ms_per_kf": round(mapping_ms, 2),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
