"""Long-run regression: full circular lap with revisit (ring world).

Validates sustained tracking over 270 frames / ~40 keyframes, keyframe
culling in steady state, and seamless re-association with old map points
on revisit (at low drift no loop correction is needed — matching the
reference's behavior; explicit loop closure is covered by
test_loop_integration with injected drift).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import align, lie
from orbslam3_tpu.pipeline import system as slam_system
from test_loop_integration import make_ff
from test_pipeline_e2e import HW, K4, N_KP


class RingWorld:
    def __init__(self, seed=31, n=6000, R=8.0):
        rng = np.random.default_rng(seed)
        th = rng.uniform(0, 2 * np.pi, n)
        r = rng.uniform(R + 2, R + 8, n)
        self.X = np.stack([r * np.cos(th), rng.uniform(-2, 2, n),
                           r * np.sin(th)], 1).astype(np.float32)
        self.desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
        self.response = rng.random(n)
        self.rng = rng

    def frame(self, R_cw, t_cw, noise_px=0.3):
        Xc = self.X @ np.asarray(R_cw).T + np.asarray(t_cw)
        z = Xc[:, 2]
        uv = np.stack([K4[0] * Xc[:, 0] / np.maximum(z, 1e-6) + K4[2],
                       K4[1] * Xc[:, 1] / np.maximum(z, 1e-6) + K4[3]], 1)
        vis = (z > 1.0) & (z < 14) & (uv[:, 0] > 10) & \
            (uv[:, 0] < HW[1] - 10) & (uv[:, 1] > 10) & (uv[:, 1] < HW[0] - 10)
        vis &= self.rng.random(len(z)) > 0.1
        idx = np.nonzero(vis)[0]
        idx = idx[np.argsort(-self.response[idx])][:N_KP]
        xy = uv[idx] + noise_px * self.rng.standard_normal((len(idx), 2))
        return make_ff(xy.astype(np.float32), self.desc[idx], N_KP)


@pytest.mark.slow
class TestLongRun:
    def test_full_lap_with_revisit(self):
        world = RingWorld()
        lap, n_frames = 240, 270
        poses = []
        for i in range(n_frames):
            phi = 2 * np.pi * i / lap
            c = np.array([8.0 * np.cos(phi), 0.0, 8.0 * np.sin(phi)])
            Rwc = np.asarray(lie.exp_so3(
                jnp.asarray([0.0, -phi + np.pi / 2, 0.0], jnp.float32)))
            R_cw = Rwc.T.astype(np.float32)
            poses.append((R_cw, (-R_cw @ c).astype(np.float32), c))
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384),
            enable_loop_closing=True)
        sys_ = slam_system.System(cfg)
        for i, (R_cw, t_cw, _) in enumerate(poses):
            sys_.track_monocular(None, ts=i * 0.05,
                                 features=world.frame(R_cw, t_cw))
        assert sys_.n_resets == 0
        assert sys_.state == slam_system.OK
        est = np.stack([p[2] for p in sys_.trajectory])
        gt = np.stack([poses[int(round(t / 0.05))][2]
                       for t, _, _ in sys_.trajectory])
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert float(rmse) < 0.04, float(rmse)
