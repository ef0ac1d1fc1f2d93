"""Fisheye-stereo-inertial e2e FROM PIXELS (the TUM-VI configuration
shape): raw KB8 fisheye pair -> calibration-derived rectification maps ->
real ORB front-end -> StereoInertialSystem with fixed-scale inertial init.

This is the launchability + numerics test for config.tumvi_stereo_inertial
(reference parity: Settings::precomputeRectificationMaps,
include/Settings.h:32-94, + stereo-inertial bFixedScale init,
src/Optimizer.cc:2964).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.features.extractor import OrbParams
from orbslam3_tpu.io import euroc as euroc_io
from orbslam3_tpu.io import rectify
from orbslam3_tpu.ops import align, lie
from orbslam3_tpu.pipeline import (inertial_system, stereo_inertial_system,
                                   stereo_system, system as base_sys)
from orbslam3_tpu.utils import synth_render as sr

HW = (384, 384)
KB8 = (160.0, 160.0, 192.0, 192.0,
       0.0035, 0.0007, -0.002, 0.0002)   # TUM-VI-like fisheye
BASELINE = 0.2
G_W = np.array([0.0, 0.0, 9.81])         # +z is "down" toward the plane
FPS, IMU_HZ = 10.0, 200.0


def rig():
    """Right camera +BASELINE along x of the left frame, slight rotation.
    Returns (R, t) with x_right = R @ x_left + t (rectify convention)."""
    R = np.asarray(lie.exp_so3(jnp.asarray([0.004, -0.006, 0.003])))
    t = -R @ np.array([BASELINE, 0.0, 0.0])
    return R.astype(np.float64), t.astype(np.float64)


@pytest.mark.slow
class TestFisheyeStereoInertial:
    def test_pixels_to_metric_trajectory(self):
        rng = np.random.default_rng(12)
        tex = sr.block_texture(rng, block=10)
        # shallow mesas: keep stereo depths in 1.8-3.0 m at 3 m altitude
        mesas = tuple((x0, x0 + w, y0, y0 + h, -z)
                      for x0, y0, w, h, z in
                      zip(rng.uniform(-2, 5, 10), rng.uniform(-2, 4, 10),
                          rng.uniform(0.8, 1.6, 10),
                          rng.uniform(0.8, 1.6, 10),
                          rng.uniform(0.4, 1.0, 10)))

        R_rel, t_rel = rig()
        map0, map1, new_k4, baseline, R1, _ = rectify.stereo_rectify(
            KB8[:4], KB8[4:], KB8[:4], KB8[4:], R_rel, t_rel, HW,
            model="kb8")
        np.testing.assert_allclose(baseline, BASELINE, rtol=1e-6)

        cfg = base_sys.SlamConfig(
            cam_model="pinhole", cam_params=tuple(float(v) for v in new_k4),
            image_hw=HW,
            orb=OrbParams(n_features=800, n_levels=8),
            max_frames_between_kf=6, min_init_matches=60,
            ba_caps=(24, 4096, 16384),
            stereo_bf=float(new_k4[0]) * baseline)
        # body = RAW left camera frame; Tbc maps rectified-left coords
        # into it (exactly what config.tumvi_stereo_inertial composes)
        Tbc = np.eye(4)
        Tbc[:3, :3] = np.asarray(R1, np.float64).T
        icfg = inertial_system.InertialConfig(
            imu_freq=IMU_HZ, init_time_s=1.2, init_min_kfs=4,
            Tbc=tuple(Tbc.reshape(-1).tolist()))
        scfg = stereo_system.StereoConfig(baseline=baseline)
        sys_ = stereo_inertial_system.StereoInertialSystem(cfg, icfg, scfg)

        # smooth accelerating path 3 m above the plane, fixed look-down
        # orientation (gyro = 0; gravity direction solved by the init)
        def pos(t):
            return np.array([0.22 * t + 0.35 * np.sin(0.7 * t),
                             0.30 * np.sin(1.1 * t),
                             -3.0 + 0.12 * np.sin(0.9 * t)])

        def acc_w(t):
            return np.array([-0.35 * 0.49 * np.sin(0.7 * t),
                             -0.30 * 1.21 * np.sin(1.1 * t),
                             -0.12 * 0.81 * np.sin(0.9 * t)])

        R_cw = np.eye(3, dtype=np.float64)        # raw-left cam = body
        rays_l = sr.kb8_rays(KB8, HW)
        rays_r = sr.kb8_rays(KB8, HW)

        n_frames = 70
        dt_f, dt_i = 1.0 / FPS, 1.0 / IMU_HZ
        states = []
        for i in range(n_frames):
            t_frame = i * dt_f
            if i > 0:
                t0 = (i - 1) * dt_f
                k = 1
                while t0 + k * dt_i <= t_frame + 1e-9:
                    tm = t0 + k * dt_i
                    a_body = R_cw @ (acc_w(tm - 0.5 * dt_i) - G_W)
                    sys_.grab_imu(tm, np.zeros(3), a_body)
                    k += 1
            t_cw_l = -R_cw @ pos(t_frame)
            R_cw_r = R_rel @ R_cw
            t_cw_r = R_rel @ t_cw_l + t_rel
            img_l = sr.render_plane(R_cw, t_cw_l, KB8[:4], HW, tex,
                                    tex_scale=60.0, mesas=mesas,
                                    rays=rays_l)
            img_r = sr.render_plane(R_cw_r, t_cw_r, KB8[:4], HW, tex,
                                    tex_scale=60.0, mesas=mesas,
                                    rays=rays_r)
            img_l = euroc_io.apply_undistort(img_l, map0)
            img_r = euroc_io.apply_undistort(img_r, map1)
            st, pose = sys_.track_stereo(jnp.asarray(img_l),
                                         jnp.asarray(img_r), ts=t_frame)
            states.append(st)

        assert sys_.n_resets == 0, sys_.n_resets
        assert sys_.state == base_sys.OK, states[-20:]
        assert sys_.imu_initialized
        est = np.stack([p[2] for p in sys_.trajectory])
        gt = np.stack([pos(t) for t, _, _ in sys_.trajectory])
        # the SLAM world is the RECTIFIED left cam frame of frame 0 =
        # R1 @ (raw frame); rotation alignment in ate_rmse absorbs it.
        # Metric: compare WITHOUT scale.
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt),
                                       with_scale=False)
        assert float(rmse) < 0.08, float(rmse)
        _, s2, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert abs(float(s2) - 1.0) < 0.05, float(s2)

    def test_tumvi_preset_constructs(self):
        """config.tumvi_stereo_inertial wires a launchable system."""
        from orbslam3_tpu import config as presets
        cfg, icfg, scfg, map0, map1 = presets.tumvi_stereo_inertial()
        assert cfg.cam_model == "pinhole" and cfg.stereo_bf > 0
        assert map0.shape == (512, 512, 2) and map1.shape == (512, 512, 2)
        # baseline ~10.1 cm (published TUM-VI rig)
        assert abs(scfg.baseline - 0.101) < 0.002, scfg.baseline
        # Tbc composed with the rectifying rotation stays a rigid motion
        Tbc = np.asarray(icfg.Tbc).reshape(4, 4)
        np.testing.assert_allclose(Tbc[:3, :3] @ Tbc[:3, :3].T, np.eye(3),
                                   atol=1e-6)
        sys_ = stereo_inertial_system.StereoInertialSystem(cfg, icfg, scfg)
        assert sys_.imu_fix_scale
