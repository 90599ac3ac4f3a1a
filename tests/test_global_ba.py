import jax.numpy as jnp
import numpy as np

from multi_orb_slam_tpu.frontend import tracking
from multi_orb_slam_tpu.geometry import align, se3
from multi_orb_slam_tpu.io import synthetic
from multi_orb_slam_tpu.mapping import local_mapping
from multi_orb_slam_tpu.optim import global_ba

from test_tracking import small_calib, small_cfg


def build_map():
    cfg = small_cfg()._replace(max_frames_kf=3)
    calib = small_calib()
    seq = synthetic.make_sequence(
        n_frames=12, K=np.asarray(calib.K[0]), height=240, width=320,
        n_points=2500,
    )
    tracker = tracking.Tracker(calib, cfg)
    tracker.kf_inserted_cb = lambda k: local_mapping.run_mapping_stage(
        tracker.map, k, tracker.frame_id, calib, cfg,
        do_ba=False, do_cull=False,
    )
    for grays, depths in zip(seq.grays, seq.depths):
        tracker.process(grays, depths)
    return tracker, seq, cfg, calib


class TestGlobalBA:
    def test_gba_reduces_perturbation(self):
        tracker, seq, cfg, calib = build_map()
        state = tracker.map
        assert int(state.n_kf) >= 3
        # perturb all KF poses except slot 0 and all points
        rng = np.random.RandomState(0)
        K = state.kf_Tcw.shape[0]
        pert = np.zeros((K, 6), np.float32)
        pert[1:] = rng.randn(K - 1, 6) * 0.05
        Tcw_pert = jnp.asarray(
            np.stack([
                np.asarray(se3.exp(jnp.asarray(pert[k])) @ state.kf_Tcw[k])
                for k in range(K)
            ])
        )
        pos_pert = state.mp_pos + jnp.asarray(
            rng.randn(*state.mp_pos.shape).astype(np.float32) * 0.05
        ) * state.mp_valid[:, None]
        pert_state = state._replace(kf_Tcw=Tcw_pert, mp_pos=pos_pert)

        out = global_ba.run_global_ba(pert_state, calib, cfg, n_outer=8)

        # compare keyframe trajectories against ground truth (Horn-aligned:
        # the map's gauge anchors KF0 at identity, GT has its own frame)
        kf_ids = [k for k in range(K) if bool(state.kf_valid[k])]
        frame_of = {int(state.kf_frame_id[k]): k for k in kf_ids}
        gt_centers = np.stack([
            np.linalg.inv(seq.poses_gt[fid])[:3, 3] for fid in sorted(frame_of)
        ])

        def kf_ate(s):
            est = np.stack([
                np.asarray(se3.camera_center(s.kf_Tcw[frame_of[fid]]))
                for fid in sorted(frame_of)
            ])
            return float(align.ate_rmse(jnp.asarray(est), jnp.asarray(gt_centers)))

        ate_orig = kf_ate(state)
        ate_pert = kf_ate(pert_state)
        ate_after = kf_ate(out)
        assert ate_after < ate_pert, (ate_orig, ate_pert, ate_after)
        assert ate_after < 2.0 * ate_orig + 5e-3, (ate_orig, ate_pert, ate_after)

    def test_gba_keeps_first_kf_fixed(self):
        tracker, seq, cfg, calib = build_map()
        state = tracker.map
        out = global_ba.run_global_ba(state, calib, cfg, n_outer=3)
        np.testing.assert_allclose(
            np.asarray(out.kf_Tcw[0]), np.asarray(state.kf_Tcw[0]), atol=1e-7
        )
