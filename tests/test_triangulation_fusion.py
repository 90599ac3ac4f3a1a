import jax.numpy as jnp
import numpy as np

from multi_orb_slam_tpu.frontend import tracking
from multi_orb_slam_tpu.geometry import align
from multi_orb_slam_tpu.io import synthetic
from multi_orb_slam_tpu.mapping import fusion, local_mapping, map_state as ms, triangulation

from test_tracking import small_calib, small_cfg


def run_sequence_with_mapping(n_frames=15, **mapping_kwargs):
    cfg = small_cfg()._replace(max_frames_kf=4)
    calib = small_calib()
    seq = synthetic.make_sequence(
        n_frames=n_frames, K=np.asarray(calib.K[0]), height=240, width=320,
        n_points=2500,
    )
    tracker = tracking.Tracker(calib, cfg)

    def on_kf(kf_slot):
        return local_mapping.run_mapping_stage(
            tracker.map, kf_slot, tracker.frame_id, calib, cfg, **mapping_kwargs
        )

    tracker.kf_inserted_cb = on_kf
    for grays, depths in zip(seq.grays, seq.depths):
        s = tracker.process(grays, depths)
        assert s != tracking.TrackState.LOST
    return tracker, seq


class TestTriangulation:
    def test_triangulation_creates_points(self):
        tracker, _ = run_sequence_with_mapping(
            do_fuse=False, do_ba=False, do_cull=False
        )
        state = tracker.map
        # some points must have been created by triangulation: their
        # first_kf differs from -1 and they lack depth at creation; just
        # check map grew beyond the pure depth-creation path of a run
        # without triangulation
        tracker2, _ = run_sequence_with_mapping(
            do_triangulate=False, do_fuse=False, do_ba=False, do_cull=False
        )
        assert int(state.n_mp) > int(tracker2.map.n_mp)

    def test_triangulated_points_accurate(self):
        tracker, seq = run_sequence_with_mapping(
            do_fuse=False, do_ba=False, do_cull=False
        )
        est = np.stack([np.linalg.inv(T)[:3, 3] for _, _, T, _ in tracker.absolute_trajectory()])
        gt = np.stack([np.linalg.inv(T)[:3, 3] for T in seq.poses_gt])
        rmse = float(align.ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert rmse < 0.08, f"ATE with triangulation {rmse:.4f}"


class TestFusion:
    def test_fusion_merges_duplicates(self):
        tracker, _ = run_sequence_with_mapping(
            do_ba=False, do_cull=False
        )
        state = tracker.map
        # duplicates merged: every feature slot with a map point id must
        # reference a valid point
        kf_mp = np.asarray(state.kf_mp)
        valid = np.asarray(state.mp_valid)
        referenced = kf_mp[kf_mp >= 0]
        assert valid[referenced].all()

    def test_full_mapping_stage_ate(self):
        tracker, seq = run_sequence_with_mapping()
        est = np.stack([np.linalg.inv(T)[:3, 3] for _, _, T, _ in tracker.absolute_trajectory()])
        gt = np.stack([np.linalg.inv(T)[:3, 3] for T in seq.poses_gt])
        rmse = float(align.ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert rmse < 0.05, f"ATE with full mapping {rmse:.4f}"
        assert int(tracker.map.n_kf) >= 3
