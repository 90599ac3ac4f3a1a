"""System facade — the public API.

Re-designs the reference `System` class (src/System.cc, include/System.h):
construction from settings + calibration files, `TrackRGBD`, localization
mode switching, reset, shutdown, trajectory savers.  The reference's three
free-running threads become a deterministic staged pipeline: the tracking
step runs inline; the mapping stage runs at each keyframe insertion; loop
detection runs after mapping (loop/ module).

Additions over the reference: map checkpoint save/load (the reference's
SaveMap/LoadMap are TODO stubs, include/System.h:119-121).
"""

from __future__ import annotations

import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .frontend import tracking
from .geometry import camera as cam_mod, se3
from .io import config_io, tum
from .mapping import local_mapping, map_state as ms
from .ops import orb
from .utils import metrics as metrics_mod


class Sensor:
    RGBD = "rgbd"
    DUAL_RGBD = "dual_rgbd"
    STEREO = "stereo"


class System:
    def __init__(
        self,
        settings_path: Optional[str] = None,
        calibration_path: Optional[str] = None,
        sensor: str = Sensor.DUAL_RGBD,
        calib: Optional[cam_mod.CameraParams] = None,
        cfg: Optional[SlamConfig] = None,
        enable_mapping: bool = True,
        enable_loop_closing: bool = True,
        pipelined: bool = False,
        pipeline_depth: int = 1,
    ):
        n_cams = 2 if sensor == Sensor.DUAL_RGBD else 1
        if calib is None or cfg is None:
            assert settings_path is not None
            st = config_io.load_settings(settings_path, n_cams=n_cams)
            T12 = (config_io.load_calibration(calibration_path)
                   if calibration_path else None)
            calib = config_io.camera_params_from(st, T12, n_cams)
            # ThDepth scaled to meters as mbf*ThDepth/fx (Tracking.cc:162)
            th_depth_m = st.bf * st.th_depth / float(st.K[0][0])
            cfg = SlamConfig(
                n_cams=n_cams,
                max_feat=st.n_features,
                width=st.width, height=st.height,
                scale_factor=st.scale_factor,
                n_levels=st.n_levels,
                th_depth=th_depth_m,
                max_frames_kf=int(st.fps),
                orb=config_io.orb_config_from(st),
            )
            self.depth_map_factor = st.depth_map_factor
        else:
            self.depth_map_factor = 1.0
        self.calib = calib
        self.cfg = cfg
        self.sensor = sensor
        self.enable_mapping = enable_mapping
        self.enable_loop_closing = enable_loop_closing
        self.tracker = tracking.Tracker(calib, cfg, pipelined=pipelined,
                                        pipeline_depth=pipeline_depth)
        self.loop_closer = None
        if enable_loop_closing:
            from .loop import loop_closing
            self.loop_closer = loop_closing.LoopCloser(calib, cfg)
        if enable_mapping:
            self.tracker.kf_inserted_cb = self._on_keyframe
        self.tracker.reloc_cb = self._relocalize
        self.tracker.reset_cb = (
            self.loop_closer.reset if self.loop_closer is not None else None)
        self.tracker.reloc_ready_fn = (
            lambda: self.loop_closer is not None
            and self.loop_closer.voc is not None)
        self._reset_requested = False
        self._covis_pending = None  # async covis-count for ba_adaptive
        self.metrics = metrics_mod.Metrics()

    # ------------------------------------------------------------------
    # Pipeline hooks
    # ------------------------------------------------------------------

    def _on_keyframe(self, kf_slot: int):
        # adaptive-window hint: the PREVIOUS keyframe's covisible count,
        # dispatched async below and resolved here one KF later (by which
        # time the device has finished it — no pipeline stall)
        hint = (int(self._covis_pending)
                if self._covis_pending is not None else None)
        with self.metrics.span("mapping_stage"):
            m = local_mapping.run_mapping_stage(
                self.tracker.map, kf_slot, self.tracker.frame_id,
                self.calib, self.cfg, covis_hint=hint,
            )
        if self.cfg.ba_adaptive:
            self._covis_pending = local_mapping.covis_kf_count(
                m, jnp.asarray(kf_slot, jnp.int32))
        if self.loop_closer is not None:
            n_loops_before = self.loop_closer.n_loops_closed
            pose_mid = m.kf_Tcw[kf_slot]
            with self.metrics.span("loop_stage"):
                m = self.loop_closer.process_keyframe(m, kf_slot)
            if self.loop_closer.n_loops_closed > n_loops_before:
                # a loop correction JUMPED the newest keyframe; the live
                # tracking pose rigidly attached to it must follow or the
                # next frame searches the corrected map from the
                # uncorrected pose and drops to LOST (observed on the
                # circuit at the loop-closure frame).  Local-BA nudges are
                # deliberately NOT propagated: the tracker re-anchors to
                # the optimized map through matching every frame (as the
                # reference's does), and per-KF micro-jumps measurably
                # destabilize tracking on degraded-scale input.
                self.tracker.queue_pose_correction(
                    se3.inverse(pose_mid) @ m.kf_Tcw[kf_slot])
        self.metrics.count("keyframes_inserted")
        return m

    def _relocalize(self, fr):
        """Tracking-lost recovery (reference Tracking::Relocalization)."""
        if self.loop_closer is None or self.loop_closer.voc is None:
            return False, None, None, 0
        from .reloc import relocalization
        return relocalization.relocalize(
            self.tracker.map, fr, self.loop_closer.voc,
            self.loop_closer.db, self.calib, self.cfg)

    # ------------------------------------------------------------------
    # Public API (reference include/System.h:63-127)
    # ------------------------------------------------------------------

    def track_rgbd(self, im1, depth1, im2=None, depth2=None,
                   timestamp: Optional[float] = None):
        """TrackRGBD (reference src/System.cc:183-243).  Images are
        grayscale float arrays; depth in meters (DepthMapFactor already
        applied by the caller or `track_rgbd_raw`)."""
        if self._reset_requested:
            self._do_reset()
        if self.sensor == Sensor.DUAL_RGBD:
            assert im2 is not None and depth2 is not None
            grays = np.stack([im1, im2]).astype(np.float32)
            depths = np.stack([depth1, depth2]).astype(np.float32)
        else:
            grays = np.asarray(im1, np.float32)[None]
            depths = np.asarray(depth1, np.float32)[None]
        with self.metrics.span("track_frame"):
            self.tracker.process(grays, depths, timestamp)
        return np.asarray(self.tracker.Tcw)

    def timing_report(self) -> str:
        """Per-stage timing summary (the reference's chrono prints,
        structured; SURVEY.md §5)."""
        return self.metrics.report()

    def track_stereo(self, im_left, im_right, timestamp: Optional[float] = None):
        """TrackStereo (the reference keeps this entry point though its
        stereo build is disabled, src/System.cc:132-181): depth from
        left<->right ORB matching, then the RGB-D pipeline."""
        from .frontend import frame as frame_mod
        if self._reset_requested:
            self._do_reset()
        fr = frame_mod.build_frame_stereo(
            jnp.asarray(np.asarray(im_left, np.float32)),
            jnp.asarray(np.asarray(im_right, np.float32)),
            self.calib, self.cfg.orb)
        self.tracker.process_frame(fr, timestamp)
        return np.asarray(self.tracker.Tcw)

    def activate_localization_mode(self):
        """Track against the frozen map; no new keyframes
        (reference System::ActivateLocalizationMode, System.cc:298-303)."""
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        self.tracker.only_tracking = False

    def reset(self):
        self._reset_requested = True

    def _do_reset(self):
        """Reset tracker AND loop closer together (the reference's
        System::Reset signals Tracking::Reset, which in turn requests
        LocalMapping/LoopClosing resets, src/Tracking.cc:2160-2206).
        Without the loop-closer half, a GBA dispatched against the
        pre-reset map would merge into the fresh map."""
        self.tracker.reset()
        if self.loop_closer is not None:
            self.loop_closer.reset()
        self._covis_pending = None
        self._reset_requested = False

    def shutdown(self):
        """Fold in any still-pending asynchronous GBA (the reference's
        Shutdown waits on isRunningGBA, System.cc:343-347); no free-running
        threads to join in this design."""
        self._flush_gba()

    def _flush_gba(self):
        if self.loop_closer is not None:
            self.tracker.map = self.loop_closer.merge_pending_gba(
                self.tracker.map)
            self.tracker.invalidate_local_cache()

    def get_tracking_state(self) -> int:
        return self.tracker.state

    def get_tracked_map_points(self) -> int:
        return self.tracker.last_n_inliers

    def get_tracked_keypoints_un(self):
        """Undistorted keypoints of the last frame with their match mask
        (reference System::GetTrackedKeyPointsUn, System.h:126)."""
        if self.tracker.prev_frame is None:
            return np.zeros((0, 2), np.float32), np.zeros((0,), bool)
        fr = self.tracker.prev_frame
        xy = np.asarray(fr.xy_und).reshape(-1, 2)
        matched = np.asarray(self.tracker.prev_mp).reshape(-1) >= 0
        valid = np.asarray(fr.valid).reshape(-1)
        return xy[valid], matched[valid]

    def change_calibration(self, settings_path: str,
                           calibration_path: Optional[str] = None):
        """Re-load camera settings (reference Tracking::ChangeCalibration,
        src/Tracking.cc:2208-2239).  Capacities (the static SlamConfig) are
        unchanged; intrinsics/distortion/rig extrinsics are replaced."""
        n_cams = self.cfg.n_cams
        st = config_io.load_settings(settings_path, n_cams=n_cams)
        T12 = (config_io.load_calibration(calibration_path)
               if calibration_path else None)
        self.calib = config_io.camera_params_from(st, T12, n_cams)
        self.depth_map_factor = st.depth_map_factor
        self.tracker.calib = self.calib
        if self.loop_closer is not None:
            self.loop_closer.calib = self.calib

    @property
    def map(self) -> ms.MapState:
        return self.tracker.map

    # ------------------------------------------------------------------
    # Trajectory export (reference src/System.cc:353-503)
    # ------------------------------------------------------------------

    def save_trajectory_tum(self, path: str):
        self._flush_gba()
        frames = [
            (ts, Tcw) for _, ts, Tcw, lost in self.tracker.absolute_trajectory()
            if not lost
        ]
        tum.write_trajectory_tum(path, frames)

    def save_keyframe_trajectory_tum(self, path: str):
        self._flush_gba()
        state = self.map
        rows = []
        for k in range(state.kf_valid.shape[0]):
            if bool(state.kf_valid[k]):
                fid = int(state.kf_frame_id[k])
                ts = self._ts_of_frame(fid)
                rows.append((fid, ts, np.asarray(state.kf_Tcw[k])))
        rows.sort()
        tum.write_trajectory_tum(path, [(ts, T) for _, ts, T in rows])

    def save_trajectory_kitti(self, path: str):
        self._flush_gba()
        poses = [Tcw for _, _, Tcw, lost in self.tracker.absolute_trajectory()
                 if not lost]
        tum.write_trajectory_kitti(path, poses)

    def _ts_of_frame(self, fid: int) -> float:
        for f, ts, _, _, _ in self.tracker.trajectory:
            if f == fid:
                return ts
        return fid / 30.0

    # ------------------------------------------------------------------
    # Map checkpointing (beyond the reference)
    # ------------------------------------------------------------------

    def save_map(self, path: str):
        state = jax.device_get(self.tracker.map)
        payload = {
            "map": {f: np.asarray(getattr(state, f)) for f in state._fields},
            "trajectory": self.tracker.trajectory,
            "frame_id": self.tracker.frame_id,
            "last_kf_slot": self.tracker.last_kf_slot,
            "last_kf_frame": self.tracker.last_kf_frame,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_map(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        arrays = {k: jnp.asarray(v) for k, v in payload["map"].items()}
        self.tracker.map = ms.MapState(**arrays)
        self.tracker.invalidate_local_cache()
        self.tracker.trajectory = payload["trajectory"]
        self.tracker.frame_id = payload["frame_id"]
        self.tracker.last_kf_slot = payload["last_kf_slot"]
        self.tracker.last_kf_frame = payload["last_kf_frame"]
        self.tracker.state = tracking.TrackState.LOST  # must relocalize
