"""Fisheye (Kannala-Brandt) monocular pipeline end-to-end (TUM-VI class)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.features.extractor import FeatureFrame
from orbslam3_tpu.ops import align, cameras, lie
from orbslam3_tpu.pipeline import system as slam_system

KB8 = (190.97847715128717, 190.9733070521226,
       254.93170605935475, 256.8974428996504,
       0.0034823894022493434, 0.0007150348452162257,
       -0.0020532361418706202, 0.00020293673591811182)
HW = (512, 512)
N_KP = 512


class FisheyeWorld:
    def __init__(self, seed=0, n_landmarks=1600):
        rng = np.random.default_rng(seed)
        # wide dome of landmarks (fisheye sees ~180 deg); kept dense enough
        # that consecutive frames share most of their sampled features
        self.X = np.stack([
            rng.uniform(-5, 9, n_landmarks),
            rng.uniform(-5, 5, n_landmarks),
            rng.uniform(2.0, 9.0, n_landmarks)], axis=1).astype(np.float32)
        self.desc = rng.integers(0, 2 ** 32, (n_landmarks, 8),
                                 dtype=np.uint32)
        # persistent per-landmark response: a real front-end picks the
        # same strong corners every frame, so selection is deterministic
        self.response = rng.random(n_landmarks)
        self.rng = rng
        self.kb8 = jnp.asarray(KB8)

    def frame(self, R_cw, t_cw, noise_px=0.3):
        Xc = self.X @ np.asarray(R_cw).T + np.asarray(t_cw)
        z = Xc[:, 2]
        uv = np.asarray(cameras.kb8_project(self.kb8, jnp.asarray(Xc)))
        vis = (z > 0.2) & (uv[:, 0] > 15) & (uv[:, 0] < HW[1] - 15) & \
              (uv[:, 1] > 15) & (uv[:, 1] < HW[0] - 15)
        vis &= self.rng.random(len(z)) > 0.1   # small per-frame dropout
        idx = np.nonzero(vis)[0]
        idx = idx[np.argsort(-self.response[idx])][:N_KP]
        n = len(idx)
        xy = uv[idx] + noise_px * self.rng.standard_normal((n, 2))
        pad = N_KP - n
        return FeatureFrame(
            xy=jnp.asarray(np.concatenate([xy, np.zeros((pad, 2))]),
                           jnp.float32),
            response=jnp.ones(N_KP),
            octave=jnp.zeros(N_KP, jnp.int32),
            angle=jnp.zeros(N_KP),
            desc=jnp.asarray(np.concatenate(
                [self.desc[idx], np.zeros((pad, 8), np.uint32)])),
            valid=jnp.asarray(np.arange(N_KP) < n))


@pytest.mark.slow
class TestKB8Pipeline:
    def test_fisheye_mono_sequence(self):
        world = FisheyeWorld(seed=5)
        n_frames = 50
        poses = []
        for i in range(n_frames):
            yaw = 0.08 * np.sin(i * 0.06)
            Rwc = np.asarray(lie.exp_so3(jnp.array([0.0, yaw, 0.0])))
            twc = np.array([0.06 * i, 0.2 * np.sin(i * 0.1), 0.0])
            R_cw = Rwc.T.astype(np.float32)
            poses.append((R_cw, (-R_cw @ twc).astype(np.float32), twc))
        cfg = slam_system.SlamConfig(
            cam_model="kb8", cam_params=KB8, image_hw=HW,
            min_init_matches=80, max_frames_between_kf=8,
            ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        for i, (R_cw, t_cw, _) in enumerate(poses):
            ff = world.frame(R_cw, t_cw)
            st, pose = sys_.track_monocular(None, ts=i * 0.05, features=ff)
        assert sys_.n_resets == 0, sys_.n_resets
        assert sys_.state == slam_system.OK
        est = np.stack([p[2] for p in sys_.trajectory])
        gt = np.stack([poses[int(round(t / 0.05))][2]
                       for t, _, _ in sys_.trajectory])
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert float(rmse) < 0.06, float(rmse)
