"""Stereo-inertial end-to-end: metric from stereo, gravity from IMU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import align, lie
from orbslam3_tpu.pipeline import (inertial_system, stereo_inertial_system,
                                   stereo_system, system as base_sys)
from test_inertial_pipeline import FPS, G, IMU_HZ, camera_path_smooth
from test_pipeline_e2e import HW, K4
from test_stereo import BASELINE, StereoWorld


@pytest.mark.slow
class TestStereoInertial:
    def test_metric_and_gravity_aligned(self):
        world = StereoWorld(seed=21)
        n_frames = 100
        frames, pos, vel, acc, rot, rot_rate = camera_path_smooth(n_frames)
        cfg = base_sys.SlamConfig(
            cam_params=K4, image_hw=HW, max_frames_between_kf=6,
            ba_caps=(24, 4096, 16384), stereo_bf=K4[0] * BASELINE)
        icfg = inertial_system.InertialConfig(
            imu_freq=IMU_HZ, init_time_s=1.2, init_min_kfs=4)
        scfg = stereo_system.StereoConfig(baseline=BASELINE)
        sys_ = stereo_inertial_system.StereoInertialSystem(cfg, icfg, scfg)

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
            fl, fr, _ = world.stereo_frame(R_cw, t_cw, noise_px=0.2)
            st, pose = sys_.track_stereo(None, None, ts=t_frame,
                                         features_l=fl, features_r=fr)
        assert sys_.n_resets == 0, sys_.n_resets
        assert sys_.state == base_sys.OK
        assert sys_.imu_initialized
        est = np.stack([p[2] for p in sys_.trajectory])
        gt = np.stack([pos(t) for t, _, _ in sys_.trajectory])
        # stereo-inertial is metric AND gravity aligned: compare without
        # scale; rotation alignment absorbs the initial yaw only
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt),
                                       with_scale=False)
        assert float(rmse) < 0.05, float(rmse)
        _, s2, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert abs(float(s2) - 1.0) < 0.02, float(s2)
