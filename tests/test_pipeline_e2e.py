"""End-to-end monocular SLAM on a synthetic feature sequence.

A camera flies through a random landmark field; each frame's FeatureFrame
is synthesized by projecting landmarks (stable per-landmark descriptors +
pixel noise + per-frame dropout).  This exercises init -> tracking -> KF
insertion -> triangulation -> local BA -> trajectory, and checks ATE.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.features.extractor import FeatureFrame
from orbslam3_tpu.ops import align, cameras, lie
from orbslam3_tpu.pipeline import system as slam_system

K4 = (458.654, 457.296, 367.215, 248.375)
HW = (480, 752)
N_KP = 512  # feature capacity per synthetic frame


class SyntheticWorld:
    def __init__(self, seed=0, n_landmarks=3000):
        rng = np.random.default_rng(seed)
        # landmark field in a corridor along +x
        self.X = np.stack([
            rng.uniform(-2, 22, n_landmarks),
            rng.uniform(-4, 4, n_landmarks),
            rng.uniform(2.0, 10.0, n_landmarks)], axis=1).astype(np.float32)
        self.desc = rng.integers(0, 2 ** 32, (n_landmarks, 8),
                                 dtype=np.uint32)
        self.rng = rng

    def frame(self, R_cw, t_cw, noise_px=0.4, dropout=0.15, flip_bits=4):
        Xc = self.X @ np.asarray(R_cw).T + np.asarray(t_cw)
        z = Xc[:, 2]
        uv = np.stack([K4[0] * Xc[:, 0] / np.maximum(z, 1e-6) + K4[2],
                       K4[1] * Xc[:, 1] / np.maximum(z, 1e-6) + K4[3]], 1)
        vis = (z > 0.3) & (uv[:, 0] > 10) & (uv[:, 0] < HW[1] - 10) & \
              (uv[:, 1] > 10) & (uv[:, 1] < HW[0] - 10)
        vis &= self.rng.random(len(z)) > dropout
        idx = np.nonzero(vis)[0]
        self.rng.shuffle(idx)
        idx = idx[:N_KP]
        n = len(idx)
        xy = uv[idx] + noise_px * self.rng.standard_normal((n, 2))
        desc = self.desc[idx].copy()
        # flip a few bits to emulate descriptor noise
        for _ in range(flip_bits):
            w = self.rng.integers(0, 8, n)
            b = self.rng.integers(0, 32, n)
            desc[np.arange(n), w] ^= (np.uint32(1) << b.astype(np.uint32))
        pad = N_KP - n
        return FeatureFrame(
            xy=jnp.asarray(np.concatenate([xy, np.zeros((pad, 2))]).astype(np.float32)),
            response=jnp.ones(N_KP),
            octave=jnp.zeros(N_KP, jnp.int32),
            angle=jnp.zeros(N_KP),
            desc=jnp.asarray(np.concatenate([desc, np.zeros((pad, 8), np.uint32)])),
            valid=jnp.asarray(np.arange(N_KP) < n))


def camera_path(n_frames, speed=0.06):
    """Forward motion with gentle yaw — world-to-camera poses."""
    poses = []
    for i in range(n_frames):
        yaw = 0.1 * np.sin(i * 0.05)
        Rwc = np.asarray(lie.exp_so3(jnp.array([0.0, yaw, 0.0])))
        twc = np.array([speed * i, 0.3 * np.sin(i * 0.08), 0.0])
        R_cw = Rwc.T
        t_cw = -R_cw @ twc
        poses.append((R_cw.astype(np.float32), t_cw.astype(np.float32), twc))
    return poses


@pytest.mark.slow
class TestEndToEnd:
    def test_mono_synthetic_sequence(self):
        world = SyntheticWorld(seed=1)
        n_frames = 60
        poses = camera_path(n_frames)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW,
            min_init_matches=80,
            max_frames_between_kf=8,
            ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        for i, (R_cw, t_cw, _) in enumerate(poses):
            ff = world.frame(R_cw, t_cw)
            state, pose = sys_.track_monocular(None, ts=i * 0.05, features=ff)
        assert sys_.state == slam_system.OK, f"state={sys_.state}"
        assert sys_.n_resets == 0
        assert len(sys_.trajectory) > n_frames * 0.8
        # ATE vs ground truth (mono => align with scale)
        est = np.stack([p[2] for p in sys_.trajectory])
        ts_used = [p[0] for p in sys_.trajectory]
        gt = np.stack([poses[int(round(t / 0.05))][2] for t in ts_used])
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        rmse = float(rmse)
        # trajectory length ~3.5 m; sub-3cm ATE expected on clean synthetic
        assert rmse < 0.05, f"ATE {rmse}"
        n_kf = int(sys_.map.n_kf)
        n_pt = int(sys_.map.n_pt)
        assert n_kf >= 5, n_kf
        assert n_pt > 300, n_pt

    def test_recovers_from_short_occlusion_without_reset(self):
        """A brief total occlusion must route OK -> RECENTLY_LOST -> OK via
        the wide-radius re-search (reference Tracking::Track flips mState
        back to OK when matching succeeds again) — NOT park in
        RECENTLY_LOST and NOT reset the map."""
        world = SyntheticWorld(seed=21)
        n = 60
        poses = camera_path(n, speed=0.05)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        blank = FeatureFrame(
            xy=jnp.zeros((N_KP, 2)), response=jnp.zeros(N_KP),
            octave=jnp.zeros(N_KP, jnp.int32), angle=jnp.zeros(N_KP),
            desc=jnp.zeros((N_KP, 8), jnp.uint32),
            valid=jnp.zeros(N_KP, bool))
        states = []
        for i, (R_cw, t_cw, _) in enumerate(poses):
            ff = blank if i in (30, 31) else world.frame(R_cw, t_cw)
            state, _ = sys_.track_monocular(None, ts=i * 0.05, features=ff)
            states.append(state)
        assert sys_.n_resets == 0
        assert slam_system.RECENTLY_LOST in states[30:34]
        assert sys_.state == slam_system.OK, f"state={sys_.state}"
        # trajectory resumes after the occlusion gap
        assert len(sys_.trajectory) > (n - 4) * 0.8
        est = np.stack([p[2] for p in sys_.trajectory])
        ts_used = [p[0] for p in sys_.trajectory]
        gt = np.stack([poses[int(round(t / 0.05))][2] for t in ts_used])
        rmse, _, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert float(rmse) < 0.05, float(rmse)


class TestSystemApi:
    def test_localization_mode_and_exports(self):
        """Reference System API parity: ActivateLocalizationMode (no
        keyframes while active, tracking continues), GetTrackingState,
        SaveKeyFrameTrajectoryTUM, Shutdown."""
        world = SyntheticWorld(seed=4)
        poses = camera_path(60)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        for i in range(24):
            R_cw, t_cw, _ = poses[i]
            sys_.track_monocular(None, ts=i * 0.05,
                                 features=world.frame(R_cw, t_cw))
        assert sys_.tracking_state == slam_system.OK
        nk = sys_.n_kf_host
        sys_.activate_localization_mode()
        for i in range(24, 48):
            R_cw, t_cw, _ = poses[i]
            st, _ = sys_.track_monocular(None, ts=i * 0.05,
                                         features=world.frame(R_cw, t_cw))
        assert sys_.state == slam_system.OK
        assert sys_.n_kf_host == nk, "KF inserted in localization mode"
        sys_.deactivate_localization_mode()
        for i in range(48, 56):
            R_cw, t_cw, _ = poses[i]
            sys_.track_monocular(None, ts=i * 0.05,
                                 features=world.frame(R_cw, t_cw))
        assert sys_.n_kf_host > nk, "mapping did not resume"
        # keyframe trajectory export
        kf_tum = sys_.keyframe_trajectory_tum()
        rows = [r for r in kf_tum.splitlines() if r]
        assert len(rows) == int(jnp.sum(sys_.map.kf_valid))
        assert len(rows[0].split()) == 8
        sys_.shutdown()
        assert sys_._pending is None
