"""Stereo matching + stereo SLAM pipeline tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.features import stereo
from orbslam3_tpu.ops import align
from orbslam3_tpu.pipeline import stereo_system, system as base_sys
from test_pipeline_e2e import HW, K4, N_KP, SyntheticWorld, camera_path
from test_loop_integration import make_ff

FX = K4[0]
BASELINE = 0.11


class StereoWorld(SyntheticWorld):
    """Synthetic world emitting rectified left/right feature frames."""

    def stereo_frame(self, R_cw, t_cw, noise_px=0.3):
        Xc = self.X @ np.asarray(R_cw).T + np.asarray(t_cw)
        z = Xc[:, 2]
        ul = K4[0] * Xc[:, 0] / np.maximum(z, 1e-6) + K4[2]
        v = K4[1] * Xc[:, 1] / np.maximum(z, 1e-6) + K4[3]
        disp = K4[0] * BASELINE / np.maximum(z, 1e-6)
        ur = ul - disp
        vis = (z > 0.3) & (ul > 10) & (ul < HW[1] - 10) & \
              (v > 10) & (v < HW[0] - 10) & (ur > 5)
        vis &= self.rng.random(len(z)) > 0.15
        idx = np.nonzero(vis)[0]
        self.rng.shuffle(idx)
        idx = idx[:N_KP]
        n = len(idx)
        noise = lambda k: noise_px * self.rng.standard_normal(k)
        xy_l = np.stack([ul[idx] + noise(n), v[idx] + noise(n)], 1)
        xy_r = np.stack([ur[idx] + noise(n), v[idx] + noise(n)], 1)
        desc = self.desc[idx]
        return make_ff(xy_l.astype(np.float32), desc, N_KP), \
            make_ff(xy_r.astype(np.float32), desc, N_KP), idx[:n]


class TestStereoMatch:
    def test_recovers_depth(self):
        w = StereoWorld(seed=11)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        fl, fr, idx = w.stereo_frame(R, t, noise_px=0.2)
        d = stereo.stereo_match(fl, fr, FX, BASELINE)
        ok = np.asarray(d.valid)
        assert ok.mean() > 0.7, ok.mean()
        z_true = w.X[idx][:, 2]
        z_est = np.asarray(d.depth)[:len(idx)]
        rel = np.abs(z_est[ok[:len(idx)]] - z_true[ok[:len(idx)]]) / \
            z_true[ok[:len(idx)]]
        assert np.median(rel) < 0.05, np.median(rel)


@pytest.mark.slow
class TestStereoPipeline:
    def test_metric_trajectory_without_scale_alignment(self):
        w = StereoWorld(seed=12)
        n_frames = 50
        poses = camera_path(n_frames, speed=0.06)
        cfg = base_sys.SlamConfig(
            cam_params=K4, image_hw=HW, max_frames_between_kf=8,
            ba_caps=(24, 4096, 16384), stereo_bf=K4[0] * BASELINE)
        sys_ = stereo_system.StereoSystem(
            cfg, stereo_system.StereoConfig(baseline=BASELINE))
        for i, (R_cw, t_cw, _) in enumerate(poses):
            # 0.2 px ~ subpixel-refined stereo localization noise
            fl, fr, _ = w.stereo_frame(R_cw, t_cw, noise_px=0.2)
            st, pose = sys_.track_stereo(None, None, ts=i * 0.05,
                                         features_l=fl, features_r=fr)
        assert sys_.n_resets == 0
        assert sys_.state == base_sys.OK
        est = np.stack([p[2] for p in sys_.trajectory])
        gt = np.stack([poses[int(round(t / 0.05))][2]
                       for t, _, _ in sys_.trajectory])
        # stereo is metric: evaluate WITHOUT scale alignment
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt),
                                       with_scale=False)
        assert float(rmse) < 0.02, float(rmse)
        # also verify the recovered scale is ~1 when allowed to float
        _, s2, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        # stereo (uR) BA residuals anchor the metric scale continuously
        assert abs(float(s2) - 1.0) < 0.01, float(s2)
