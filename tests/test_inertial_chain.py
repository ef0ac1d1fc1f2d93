"""Inertial-chain maintenance: MergePrevious on KF culling, the
frame-to-frame ConstraintPoseImu prior chain, and noisy-IMU tracking.

Parity targets: reference IMU::Preintegrated::MergePrevious
(src/ImuTypes.cc:239), PoseInertialOptimizationLastFrame + Marginalize
(src/Optimizer.cc:3846-4276, :2882-2963).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import align, imu as imu_ops, lie
from orbslam3_tpu.pipeline import inertial_system, system as base_sys
from orbslam3_tpu.slam_map import state as mapstate
from orbslam3_tpu.solver import inertial as inertial_solver
from orbslam3_tpu.solver import vi_pose_opt as vpo

from test_pipeline_e2e import HW, K4, SyntheticWorld
from test_inertial_pipeline import FPS, G, IMU_HZ, camera_path_smooth


def _mk_system():
    cfg = base_sys.SlamConfig(cam_params=K4, image_hw=HW,
                              ba_caps=(24, 4096, 16384))
    icfg = inertial_system.InertialConfig(imu_freq=IMU_HZ)
    return inertial_system.InertialSystem(cfg, icfg)


class TestMergePrevious:
    def test_cull_merges_factor_chain(self):
        sys_ = _mk_system()
        # three KFs with two spanning factors 0->1->2
        m = mapstate.empty_map(sys_.cfg.map_capacity)
        for k in range(3):
            m, _ = mapstate.add_keyframe(m, jnp.eye(3),
                                         jnp.zeros(3), float(k), k)
        sys_.map = m
        rng = np.random.default_rng(0)
        for (i, j) in [(0, 1), (1, 2)]:
            n = 40
            acc = rng.normal(0, 0.1, (n, 3)).astype(np.float32) + \
                np.array([0, 0, 9.81], np.float32)
            gyr = rng.normal(0, 0.01, (n, 3)).astype(np.float32)
            dts = np.full(n, 1.0 / IMU_HZ, np.float32)
            sys_.preints.append(sys_._preint_raw(acc, gyr, dts, sys_.bias))
            sys_.preint_kf_pairs.append((i, j))
            sys_.preint_raw.append((acc, gyr, dts))
        dT0 = float(sys_.preints[0].dT) + float(sys_.preints[1].dT)

        sys_._cull_keyframe(1)

        assert sys_.preint_kf_pairs == [(0, 2)], sys_.preint_kf_pairs
        assert len(sys_.preints) == 1
        # merged factor spans the full interval
        assert abs(float(sys_.preints[0].dT) - dT0) < 1e-5
        # culled KF is gone from the map
        assert not bool(sys_.map.kf_valid[1])

    def test_cull_endpoint_drops_single_factor(self):
        sys_ = _mk_system()
        m = mapstate.empty_map(sys_.cfg.map_capacity)
        for k in range(2):
            m, _ = mapstate.add_keyframe(m, jnp.eye(3),
                                         jnp.zeros(3), float(k), k)
        sys_.map = m
        n = 16
        acc = np.tile(np.array([0, 0, 9.81], np.float32), (n, 1))
        gyr = np.zeros((n, 3), np.float32)
        dts = np.full(n, 1.0 / IMU_HZ, np.float32)
        sys_.preints.append(sys_._preint_raw(acc, gyr, dts, sys_.bias))
        sys_.preint_kf_pairs.append((0, 1))
        sys_.preint_raw.append((acc, gyr, dts))
        sys_._cull_keyframe(1)
        assert sys_.preint_kf_pairs == []
        assert sys_.preints == []


class TestLastFramePrior:
    def test_converges_and_tightens_prior(self):
        """Two body states under constant acceleration; the LastFrame
        optimizer must recover the current state from a perturbed guess
        and produce a PSD marginal prior."""
        rng = np.random.default_rng(1)
        dt = 0.05
        g = np.asarray(imu_ops.GRAVITY)
        # prev state at rest at origin; true acceleration a_w
        a_w = np.array([0.4, -0.2, 0.1])
        Rp = np.eye(3, dtype=np.float32)
        pp = np.zeros(3, np.float32)
        vp = np.array([0.3, 0.0, 0.1], np.float32)
        # integrate 10 IMU samples
        n = 10
        dti = dt / n
        acc_body = (a_w - g).astype(np.float32)   # R = I
        acc = np.tile(acc_body, (n, 1))
        gyr = np.zeros((n, 3), np.float32)
        dts = np.full(n, dti, np.float32)
        calib = imu_ops.ImuCalib.create(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)
        pre = imu_ops.preintegrate(jnp.asarray(acc), jnp.asarray(gyr),
                                   jnp.asarray(dts),
                                   jnp.ones(n, bool), calib, jnp.zeros(6))
        f1 = inertial_solver.stack_preints([pre], [0], [1], capacity=1)
        # true current state
        pc = pp + vp * dt + 0.5 * a_w * dt * dt
        vc = vp + a_w * dt
        Rc = np.eye(3, dtype=np.float32)

        # visual observations of the current frame: points at depth ~4
        n_pt = 60
        X = rng.normal(0, 1.0, (n_pt, 3)).astype(np.float32)
        X[:, 2] = 4.0 + rng.uniform(0, 2, n_pt)
        X = X + pc
        from orbslam3_tpu.ops import cameras
        Xc = (X - pc) @ np.eye(3)       # body == camera (Rcb = I)
        uv = np.asarray(cameras.project("pinhole", jnp.asarray(K4),
                                        jnp.asarray(Xc)))
        prior = vpo.VIPosePrior(
            Rwb=jnp.asarray(Rp), pwb=jnp.asarray(pp), vel=jnp.asarray(vp),
            bias=jnp.zeros(6), H=jnp.eye(15) * 1e4)
        res, new_prior = vpo.vi_pose_optimization_last_frame(
            jnp.asarray(Rc), jnp.asarray(pc + 0.05), jnp.asarray(vc + 0.1),
            jnp.zeros(6), prior, f1,
            jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(n_pt), jnp.ones(n_pt, bool),
            "pinhole", jnp.asarray(K4),
            jnp.eye(3), jnp.zeros(3), imu_ops.GRAVITY)
        assert int(res.n_inliers) >= 50
        np.testing.assert_allclose(np.asarray(res.pwb), pc, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.vel), vc, atol=5e-2)
        # marginal prior must be symmetric PSD and informative
        Hm = np.asarray(new_prior.H)
        np.testing.assert_allclose(Hm, Hm.T, atol=1e-3)
        w = np.linalg.eigvalsh(Hm)
        assert w.min() > -1e-2, w.min()
        assert w.max() > 1.0


@pytest.mark.slow
class TestNoisyImuDrive:
    def test_vi_pose_opt_with_imu_noise(self):
        """Mono-inertial drive with REALISTIC IMU noise and the full
        chain on (FIBA at init, LastFrame prior): the map must still be
        metric and the second-half ATE small (VERDICT r1 item 3: the VI
        pose opt must improve, not fight, under noise)."""
        world = SyntheticWorld(seed=5)
        n_frames = 120
        frames, pos, vel, acc, rot, rot_rate = camera_path_smooth(n_frames)
        cfg = base_sys.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384))
        icfg = inertial_system.InertialConfig(
            imu_freq=IMU_HZ, init_time_s=1.5, init_min_kfs=5,
            use_vi_pose_opt=True)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
        rng = np.random.default_rng(7)
        sg = 1.7e-4 * np.sqrt(IMU_HZ) * 10   # EuRoC-class gyro noise x10
        sa = 2.0e-3 * np.sqrt(IMU_HZ) * 10

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
                    a_body = Rb.T @ (acc(tm - 0.5 * dt_i) - G) + \
                        rng.normal(0, sa, 3)
                    w_body = rot_rate(tm - 0.5 * dt_i) + rng.normal(0, sg, 3)
                    sys_.grab_imu(tm, w_body, a_body)
                    k += 1
            R_cw, t_cw, twc, Rwc = frames[i]
            ff = world.frame(R_cw, t_cw)
            sys_.track_monocular(None, ts=t_frame, features=ff)
        assert sys_.n_resets == 0, sys_.n_resets
        assert sys_.imu_initialized
        est = np.stack([p[2] for p in sys_.trajectory])
        ts_used = [p[0] for p in sys_.trajectory]
        gt = np.stack([pos(t) for t in ts_used])
        n_half = len(est) // 2
        rmse_s, s, _, _ = align.ate_rmse(jnp.asarray(est[n_half:]),
                                         jnp.asarray(gt[n_half:]),
                                         with_scale=True)
        assert abs(float(s) - 1.0) < 0.15, \
            f"map scale not metric under IMU noise: {float(s)}"
        assert float(rmse_s) < 0.12, float(rmse_s)
