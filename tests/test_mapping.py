import jax.numpy as jnp
import numpy as np

from multi_orb_slam_tpu.frontend import tracking
from multi_orb_slam_tpu.geometry import align
from multi_orb_slam_tpu.io import synthetic
from multi_orb_slam_tpu.mapping import local_mapping

from test_tracking import small_calib, small_cfg


class TestLocalMappingIntegration:
    def test_tracking_with_local_ba(self):
        cfg = small_cfg()._replace(max_frames_kf=4)
        calib = small_calib()
        seq = synthetic.make_sequence(
            n_frames=15, K=np.asarray(calib.K[0]), height=240, width=320,
            n_points=2500,
        )
        tracker = tracking.Tracker(calib, cfg)

        def on_kf(kf_slot):
            m = tracker.map
            if int(m.n_kf) > 2:
                m = local_mapping.run_local_ba(
                    m, kf_slot, calib, cfg, n_free=6, n_fixed=6
                )
                m = local_mapping.cull_map_points(
                    m, jnp.asarray(tracker.frame_id, jnp.int32), cfg
                )
            return m

        tracker.kf_inserted_cb = on_kf
        for grays, depths in zip(seq.grays, seq.depths):
            s = tracker.process(grays, depths)
            assert s != tracking.TrackState.LOST

        assert int(tracker.map.n_kf) >= 3
        est = np.stack([np.linalg.inv(T)[:3, 3] for _, _, T, _ in tracker.absolute_trajectory()])
        gt = np.stack([np.linalg.inv(T)[:3, 3] for T in seq.poses_gt])
        rmse = float(align.ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert rmse < 0.05, f"ATE RMSE with local BA {rmse:.4f} m"

    def test_cull_keyframes_removes_redundant(self):
        # build a tiny map where kf1's points are all seen by 4 other KFs
        from multi_orb_slam_tpu.mapping import map_state as ms
        cfg = small_cfg()
        state = ms.make_empty(8, 1, 16, 128)
        n_pts = 20
        kf_mp = state.kf_mp
        for k in range(5):
            for j in range(n_pts):
                kf_mp = kf_mp.at[k, 0, j].set(j)
        state = state._replace(
            kf_mp=kf_mp,
            kf_valid=state.kf_valid.at[:5].set(True),
            kf_feat_valid=state.kf_feat_valid.at[:5].set(True),
            mp_valid=state.mp_valid.at[:n_pts].set(True),
            n_kf=jnp.asarray(5, jnp.int32),
        )
        out = local_mapping.cull_keyframes(state, jnp.asarray(4, jnp.int32), cfg)
        # one redundant KF culled (not slot 0, not center 4)
        assert int(out.n_kf) == 4
        assert bool(out.kf_valid[0]) and bool(out.kf_valid[4])


class TestAdaptiveWindow:
    def test_covis_kf_count_matches_covisibility_row(self):
        from multi_orb_slam_tpu.mapping import map_state as ms
        rng = np.random.RandomState(3)
        state = ms.make_empty(8, 1, 32, 256)
        kf_mp = np.full((8, 1, 32), -1, np.int32)
        # kf0 shares 20 points with kf1, 15 with kf2, 5 with kf3
        kf_mp[0, 0, :25] = np.arange(25)
        kf_mp[1, 0, :20] = np.arange(20)
        kf_mp[2, 0, :15] = np.arange(15)
        kf_mp[3, 0, :5] = np.arange(5)
        state = state._replace(
            kf_mp=jnp.asarray(kf_mp),
            kf_valid=state.kf_valid.at[:4].set(True),
            kf_feat_valid=state.kf_feat_valid.at[:4].set(True),
            mp_valid=state.mp_valid.at[:25].set(True),
            n_kf=jnp.asarray(4, jnp.int32),
        )
        n = int(local_mapping.covis_kf_count(state, jnp.asarray(0, jnp.int32)))
        W = np.asarray(ms.covisibility(state))
        expect = int(np.sum(W[0] >= 15))
        assert n == expect == 2

    def test_adaptive_mapping_stage_tracks(self):
        # same scenario as test_tracking_with_local_ba but through the full
        # adaptive mapping stage (bucketed window selection)
        cfg = small_cfg()._replace(max_frames_kf=4, ba_adaptive=True)
        calib = small_calib()
        seq = synthetic.make_sequence(
            n_frames=12, K=np.asarray(calib.K[0]), height=240, width=320,
            n_points=2500,
        )
        tracker = tracking.Tracker(calib, cfg)
        tracker.kf_inserted_cb = lambda kf_slot: local_mapping.run_mapping_stage(
            tracker.map, kf_slot, tracker.frame_id, calib, cfg)
        for grays, depths in zip(seq.grays, seq.depths):
            s = tracker.process(grays, depths)
            assert s != tracking.TrackState.LOST
        est = np.stack([np.linalg.inv(T)[:3, 3]
                        for _, _, T, _ in tracker.absolute_trajectory()])
        gt = np.stack([np.linalg.inv(T)[:3, 3] for T in seq.poses_gt])
        rmse = float(align.ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert rmse < 0.05, f"adaptive-window ATE {rmse:.4f} m"
