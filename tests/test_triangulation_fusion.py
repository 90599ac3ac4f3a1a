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

    def test_batched_fuse_matches_sequential(self):
        """fuse_into_kfs over N slots == N sequential fuse_into_kf calls.

        The deferred-merge machinery (_fuse_step / _finalize_merges, table
        composition, path compression) must reproduce the per-target
        finalize semantics: identical merge count, identical mp_valid /
        n_mp, identical landmark SET per (KF, camera) row (when a merge
        leaves two duplicate features on one landmark, WHICH feature
        survives dedupe is a tie-break that may differ between per-step
        and end-of-group finalization — same landmark, different pixel),
        and identical mp_replaced after chain resolution (sequential
        finalizes leave one-hop pointers a->b then b->c; the batched table
        is already path-compressed a->c — both resolve to the same live
        landmark).
        """
        tracker, _ = run_sequence_with_mapping(
            do_fuse=False, do_ba=False, do_cull=False
        )
        state = tracker.map
        cfg = small_cfg()._replace(max_frames_kf=4)
        calib = small_calib()
        M = cfg.max_mp
        K = state.kf_mp.shape[0]
        kf = int(tracker.last_kf_slot)
        own = np.asarray(state.kf_mp[kf]).reshape(-1)
        mask = np.zeros(M, bool)
        mask[own[own >= 0]] = True
        W = np.asarray(ms.covisibility(state))
        nbrs = np.argsort(-W[kf])[:3]
        nbrs = [int(n) for n in nbrs if W[kf][n] > 0]
        assert nbrs, "scenario must have covisible neighbors"
        slots = np.full(4, K - 1, np.int32)
        slots[: len(nbrs)] = nbrs

        batched, n_b = fusion.fuse_into_kfs(
            state, jnp.asarray(mask), jnp.asarray(slots), cfg, calib)

        seq_state = state
        n_s = 0
        for s in slots:
            seq_state, n = fusion.fuse_into_kf(
                seq_state, jnp.asarray(mask), jnp.asarray(int(s)), cfg, calib)
            n_s += int(n)

        assert int(n_b) == n_s and n_s > 0, (int(n_b), n_s)
        bk = np.asarray(batched.kf_mp).reshape(-1, batched.kf_mp.shape[-1])
        sk = np.asarray(seq_state.kf_mp).reshape(bk.shape)
        for r in range(bk.shape[0]):
            sb = set(bk[r][bk[r] >= 0].tolist())
            ss = set(sk[r][sk[r] >= 0].tolist())
            assert sb == ss, (r, sb ^ ss)
        np.testing.assert_array_equal(
            np.asarray(batched.mp_valid), np.asarray(seq_state.mp_valid))
        assert int(batched.n_mp) == int(seq_state.n_mp)

        def resolve(rep):
            rep = np.asarray(rep).copy()
            idx = np.arange(len(rep))
            out = np.where(rep >= 0, rep, idx)
            for _ in range(8):
                out = np.where(out >= 0, out[out], out)
            return np.where(rep >= 0, out, -1)

        np.testing.assert_array_equal(
            resolve(batched.mp_replaced), resolve(seq_state.mp_replaced))

    def test_full_mapping_stage_ate(self):
        tracker, seq = run_sequence_with_mapping()
        est = np.stack([np.linalg.inv(T)[:3, 3] for _, _, T, _ in tracker.absolute_trajectory()])
        gt = np.stack([np.linalg.inv(T)[:3, 3] for T in seq.poses_gt])
        rmse = float(align.ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert rmse < 0.05, f"ATE with full mapping {rmse:.4f}"
        assert int(tracker.map.n_kf) >= 3
