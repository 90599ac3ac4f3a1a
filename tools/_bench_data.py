"""Shared benchmark-frame loading for the profiling tools.

The profiling tools and bench.py share one synthetic dual-camera sequence.
bench.py caches its scenes at /tmp/bench_frames_v3_{scene}.npz; this helper
regenerates the orbit scene when absent (ADVICE round-2: tools must not
crash on a fresh machine).  Round 5: the rig is the reference's REAL ~90
deg dual-camera geometry (OtherFiles/calibration.txt:1-4).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FRAME_CACHE = "/tmp/bench_frames_v3_orbit.npz"


def load_bench_frames(n_frames=60, path=None):
    """Return (grays [N, C, H, W], depths [N, C, H, W]) float32."""
    path = path or FRAME_CACHE
    if os.path.exists(path):
        try:
            z = np.load(path)
            if z["grays"].shape[0] >= n_frames:
                return z["grays"][:n_frames], z["depths"][:n_frames]
        except Exception:
            pass
    import jax.numpy as jnp
    from multi_orb_slam_tpu.geometry import se3
    from multi_orb_slam_tpu.io import synthetic

    K = np.asarray([520.9, 521.0, 320.0, 240.0], np.float32)
    Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
    T_rc1 = (jnp.eye(4).at[:3, :3].set(Ry)
             .at[:3, 3].set(jnp.asarray([0.161, 0.004, -0.071])))
    T_rc = np.asarray(jnp.stack([jnp.eye(4), T_rc1]))
    seq = synthetic.make_sequence(
        n_frames=n_frames, K=K, T_rc=T_rc, height=480, width=640,
        n_points=4000)
    grays = np.stack(seq.grays).astype(np.float32)
    depths = np.stack(seq.depths).astype(np.float32)
    try:
        np.savez(path, grays=grays, depths=depths)
    except Exception:
        pass
    return grays, depths
