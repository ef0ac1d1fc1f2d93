"""Robustness failsafes: timestamp anomalies and bad-IMU forced reset.

Parity targets:
  * backwards timestamp => CreateMapInAtlas (archive + fresh map),
    anomalous frame dropped (reference src/Tracking.cc:383-390);
  * > mImageTimeout (3 s) image gap => LOST -> reset (young map) or
    new-map-in-atlas (mature map) (reference src/Tracking.cc:391-395 +
    the LOST branch, mImageTimeout=3.0 at src/Tracking.cc:53);
  * inertial init never converges within resetTimeThresh => forced map
    reset (reference mbBadImu, src/LocalMapping.cc:122-126 +
    src/Tracking.cc:368-373).
"""
import numpy as np
import pytest

from orbslam3_tpu.pipeline import inertial_system, system as slam_system
from test_inertial_pipeline import FPS, G, IMU_HZ, camera_path_smooth
from test_pipeline_e2e import HW, K4, SyntheticWorld, camera_path


def run_frames(sys_, world, poses, ts_list, start=0):
    for i, ts in enumerate(ts_list):
        R_cw, t_cw, _ = poses[start + i]
        ff = world.frame(R_cw, t_cw)
        sys_.track_monocular(None, ts=ts, features=ff)


class TestTimestampAnomalies:
    def _booted_system(self, n_warm=12, **cfg_kw):
        world = SyntheticWorld(seed=2)
        poses = camera_path(60)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            ba_caps=(24, 4096, 16384), **cfg_kw)
        sys_ = slam_system.System(cfg)
        run_frames(sys_, world, poses, [i * 0.05 for i in range(n_warm)])
        assert sys_.state == slam_system.OK
        return sys_, world, poses

    def test_backwards_timestamp_creates_map_in_atlas(self):
        sys_, world, poses = self._booted_system()
        n_sessions = len(sys_.atlas.sessions)
        traj_len = len(sys_.trajectory)
        # a frame OLDER than its predecessor
        R_cw, t_cw, _ = poses[12]
        st, pose = sys_.track_monocular(
            None, ts=0.2, features=world.frame(R_cw, t_cw))
        assert pose is None                      # anomalous frame dropped
        assert sys_.n_map_switches == 1
        assert sys_.n_resets == 0                # not a tracking failure
        assert len(sys_.atlas.sessions) == n_sessions + 1
        assert sys_.state == slam_system.NO_IMAGES_YET
        # the archived session kept the trajectory
        assert len(sys_.atlas.sessions[-1].trajectory) == traj_len
        # recovery: normal frames re-initialize a fresh map
        run_frames(sys_, world, poses,
                   [0.65 + i * 0.05 for i in range(10)], start=13)
        assert sys_.state == slam_system.OK
        assert sys_.n_resets == 0

    def test_long_gap_young_map_resets(self):
        sys_, world, poses = self._booted_system()   # 12 frames -> 2-3 KFs
        assert sys_.n_kf_host <= 10
        R_cw, t_cw, _ = poses[13]
        st, pose = sys_.track_monocular(
            None, ts=12 * 0.05 + 5.0, features=world.frame(R_cw, t_cw))
        assert pose is None
        assert sys_.n_resets == 1
        assert sys_.state == slam_system.NO_IMAGES_YET

    def test_long_gap_mature_map_archives(self):
        # every frame a KF -> mature map quickly
        sys_, world, poses = self._booted_system(
            n_warm=14, max_frames_between_kf=1)
        assert sys_.n_kf_host > 10
        n_sessions = len(sys_.atlas.sessions)
        R_cw, t_cw, _ = poses[15]
        st, pose = sys_.track_monocular(
            None, ts=14 * 0.05 + 5.0, features=world.frame(R_cw, t_cw))
        assert pose is None
        assert sys_.n_resets == 0                # archived, not reset
        assert sys_.n_map_switches == 1
        assert len(sys_.atlas.sessions) == n_sessions + 1

    def test_small_gap_is_not_an_anomaly(self):
        sys_, world, poses = self._booted_system()
        R_cw, t_cw, _ = poses[13]
        st, pose = sys_.track_monocular(
            None, ts=12 * 0.05 + 2.0, features=world.frame(R_cw, t_cw))
        # 2 s < image_timeout: frame processed normally (may or may not
        # track depending on motion model, but no archive/reset fires)
        assert sys_.n_map_switches == 0
        assert sys_.n_resets == 0


class TestBadImuFailsafe:
    def test_init_never_converges_forces_reset(self):
        """If the inertial init keeps failing (degenerate IMU/motion),
        the map must be force-reset after reset_time_thresh of KF time."""
        world = SyntheticWorld(seed=3)
        n_frames = 80
        frames, pos, vel, acc, rot, rot_rate = camera_path_smooth(n_frames)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384))
        icfg = inertial_system.InertialConfig(
            imu_freq=IMU_HZ, init_time_s=0.8, init_min_kfs=4,
            reset_time_thresh=2.0)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
        # simulate a permanently-degenerate init (scale always rejected)
        sys_._initialize_imu = lambda **kw: False

        dt_f = 1.0 / FPS
        dt_i = 1.0 / IMU_HZ
        for i in range(n_frames):
            t_frame = i * dt_f
            if i > 0:
                t0 = (i - 1) * dt_f
                k = 1
                while t0 + k * dt_i <= t_frame + 1e-9:
                    tm = t0 + k * dt_i
                    Rb = rot(tm - 0.5 * dt_i)
                    sys_.grab_imu(tm, rot_rate(tm - 0.5 * dt_i),
                                  Rb.T @ (acc(tm - 0.5 * dt_i) - G))
                    k += 1
            R_cw, t_cw, twc, Rwc = frames[i]
            sys_.track_monocular(None, ts=t_frame,
                                 features=world.frame(R_cw, t_cw))
            if sys_.n_resets:
                break
        assert sys_.n_resets >= 1, \
            "bad-IMU failsafe never fired despite init never converging"
        assert not sys_.imu_initialized
        assert sys_.preints == [] and sys_.kf_time0 is None


class TestInertialTimestampAnomaly:
    def test_backwards_ts_clears_imu_queue(self):
        """Timestamp regression on an inertial system must clear the IMU
        queue with the map switch (reference src/Tracking.cc:385-388
        clears mlQueueImuData before CreateMapInAtlas): queued samples
        straddling the discontinuity would poison the next
        preintegration."""
        world = SyntheticWorld(seed=5)
        n_frames = 30
        frames, pos, vel, acc, rot, rot_rate = camera_path_smooth(60)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384))
        icfg = inertial_system.InertialConfig(imu_freq=IMU_HZ)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
        dt_f, dt_i = 1.0 / FPS, 1.0 / IMU_HZ
        for i in range(n_frames):
            t_frame = i * dt_f
            if i > 0:
                t0 = (i - 1) * dt_f
                k = 1
                while t0 + k * dt_i <= t_frame + 1e-9:
                    tm = t0 + k * dt_i
                    Rb = rot(tm - 0.5 * dt_i)
                    sys_.grab_imu(tm, rot_rate(tm - 0.5 * dt_i),
                                  Rb.T @ (acc(tm - 0.5 * dt_i) - G))
                    k += 1
            R_cw, t_cw, _, _ = frames[i]
            sys_.track_monocular(None, ts=t_frame,
                                 features=world.frame(R_cw, t_cw))
        assert sys_.state == slam_system.OK
        # queue some extra samples, then feed a BACKWARDS frame
        for k in range(5):
            sys_.grab_imu(n_frames * dt_f + k * dt_i,
                          np.zeros(3), np.array([0.0, 0, 9.81]))
        assert len(sys_.imu_queue) > 0
        R_cw, t_cw, _, _ = frames[n_frames]
        st, pose = sys_.track_monocular(
            None, ts=0.1, features=world.frame(R_cw, t_cw))
        assert pose is None
        assert sys_.n_map_switches == 1
        assert sys_.imu_queue == [], "IMU queue not cleared on ts anomaly"
        assert sys_.preints == [] and not sys_.imu_initialized
