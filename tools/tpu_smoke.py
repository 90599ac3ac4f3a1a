#!/usr/bin/env python3
"""TPU smoke suite: compile + run the hot paths at multiple resolutions.

VERDICT round-2 item 3: every unit test runs these shapes on CPU, so
Mosaic-only breakage (tiling-alignment rejections, scoped-VMEM OOMs) never
surfaced until the judge's bench.  This tool runs, ON THE REAL CHIP:

  - ORB extraction at 240x320 (half-res), 480x640 (flagship),
    376x1241 (KITTI stereo)
  - one fused dual-camera tracking step at the flagship resolution
  - one full mapping stage at the flagship resolution

Each stage also measures WARM latency (VERDICT round-3 item 6: the cold
wall times are compile-dominated, so a 10x warm regression would still
read ok) by re-running the op amortized over several reps with the result
forced through a reduction (`block_until_ready` lies on the axon remote
backend, NOTES_ROUND2 gotcha #1), and FAILS the stage when warm latency
exceeds its per-stage budget.

Prints one JSON line per stage and exits non-zero on any failure.
Run:  python tools/tpu_smoke.py          (~4 min cold, seconds warm-cached)
"""

import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from multi_orb_slam_tpu.config import SlamConfig
    from multi_orb_slam_tpu.frontend import tracking
    from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
    from multi_orb_slam_tpu.mapping import local_mapping
    from multi_orb_slam_tpu.ops import orb

    platform = jax.devices()[0].platform
    failures = 0
    rng = np.random.RandomState(0)
    global _WM_TRACK, _WM_MAP
    _WM_TRACK = _WM_MAP = None

    def force(x):
        """True barrier: reduce every leaf to one forced float."""
        tot = 0.0
        for leaf in jax.tree_util.tree_leaves(x):
            tot += float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))
        return tot

    def warm_ms(run_once, reps=8):
        """Amortized warm latency: reps sequential dispatches, forced once.

        The single trailing force costs one host sync (~30 ms on the
        remote-attached backend); measuring 1 rep and reps+1 reps and
        differencing removes it.
        """
        outs = run_once()
        force(outs)
        t0 = time.perf_counter()
        force(run_once())
        t1 = time.perf_counter()
        o = None
        for _ in range(reps + 1):
            o = run_once()
        force(o)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps * 1e3

    def stage(name, fn, budget_ms=None):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            detail = fn() or {}
            w = detail.get("warm_ms")
            ok = True
            if budget_ms is not None and w is not None and w > budget_ms:
                ok = False
                failures += 1
                detail["error"] = (
                    f"warm {w:.2f} ms exceeds budget {budget_ms} ms")
            detail["budget_ms"] = budget_ms
            print(json.dumps({
                "stage": name, "ok": ok, "platform": platform,
                "wall_s": round(time.perf_counter() - t0, 2),
                **detail}), flush=True)
        except Exception as e:  # noqa: BLE001 — a smoke suite reports all
            failures += 1
            print(json.dumps({
                "stage": name, "ok": False, "platform": platform,
                "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)
            traceback.print_exc(limit=3, file=sys.stderr)

    # warm budgets: extraction <= 8 ms (VERDICT r3 item 6), fused tracking
    # step <= 20 ms, mapping stage <= 300 ms (current ceiling; ratchet down
    # with the perf work)
    for h, w in [(240, 320), (480, 640), (376, 1241)]:
        def ex(h=h, w=w):
            img = jnp.asarray(
                rng.uniform(0, 255, (h, w)).astype(np.float32))
            f = orb.extract_orb(img, orb.ORBConfig(n_features=512))
            n = int(jnp.sum(f.valid))  # forced value = true barrier
            assert n > 100, f"only {n} features"
            wm = warm_ms(lambda: orb.extract_orb(
                img, orb.ORBConfig(n_features=512)).desc)
            return {"h": h, "w": w, "features": n,
                    "warm_ms": round(wm, 2)}
        stage(f"extract_orb_{h}x{w}", ex, budget_ms=8.0)

    def tracked():
        from tools._bench_data import load_bench_frames
        H, W, C = 480, 640, 2
        cfg = SlamConfig(n_cams=C, width=W, height=H,
                         orb=orb.ORBConfig(n_features=1024))
        K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
        Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
        T_rc1 = (jnp.eye(4).at[:3, :3].set(Ry)
                 .at[:3, 3].set(jnp.asarray([0.161, 0.004, -0.071])))
        calib = cam_mod.CameraParams(
            K=K, dist=jnp.zeros((C, 5)), T_rc=jnp.stack([jnp.eye(4), T_rc1]),
            bf=jnp.asarray(40.0), width=W, height=H)
        grays, depths = load_bench_frames(n_frames=16)
        tr = tracking.Tracker(calib, cfg)
        for i in range(14):
            tr.process(jnp.asarray(grays[i]), jnp.asarray(depths[i]))
        assert tr.state == tracking.TrackState.OK

        # warm fused-step latency: replay the last frame against a frozen
        # tracker snapshot (state inputs held, so each rep is identical work)
        g14 = jnp.asarray(grays[14])
        d14 = jnp.asarray(depths[14])
        tstate = jnp.asarray(
            [tr.last_kf_frame, tr.ref_kf_tracked, 0], jnp.int32)
        snap = (tr.map, tr.prev_frame, tr.prev_Tcw, tr.prev_mp, tr.velocity,
                tstate)
        fid = jnp.asarray(tr.frame_id, jnp.int32)
        lpts = tracking.build_local_points_cache(
            tr.map, jnp.asarray(tr.last_kf_slot, jnp.int32), cfg)

        def one_step():
            out = tracking.track_frame_fused_images(
                snap[0], snap[1], snap[2], snap[3], snap[4], snap[5],
                lpts, g14, d14, calib, cfg, fid)
            return out[2]  # Tcw
        wm_track = warm_ms(one_step, reps=6)

        m = local_mapping.run_mapping_stage(
            tr.map, tr.last_kf_slot, tr.frame_id, calib, cfg)
        n_mp = int(m.n_mp)
        assert n_mp > 200

        def one_mapping():
            mm = local_mapping.run_mapping_stage(
                tr.map, tr.last_kf_slot, tr.frame_id, calib, cfg)
            return mm.kf_Tcw
        wm_map = warm_ms(one_mapping, reps=4)
        global _WM_TRACK, _WM_MAP
        _WM_TRACK, _WM_MAP = wm_track, wm_map
        return {"n_kf": int(m.n_kf), "n_mp": n_mp,
                "inliers": tr.last_n_inliers,
                "warm_ms": round(wm_track, 2),
                "warm_mapping_ms": round(wm_map, 2)}
    stage("fused_track_and_mapping_480x640", tracked, budget_ms=20.0)

    # mapping budget asserted as its own stage line so the artifact carries
    # a pass/fail per budget
    def mapping_budget():
        assert _WM_MAP is not None, "tracked stage did not run"
        return {"warm_ms": round(_WM_MAP, 2)}
    stage("mapping_stage_warm_480x640", mapping_budget, budget_ms=300.0)

    print(json.dumps({"stage": "summary", "ok": failures == 0,
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
