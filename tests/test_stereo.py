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


class TestSubpixelRefinement:
    def test_recovers_fractional_disparity(self):
        """A right image that is the left shifted by a FRACTIONAL number
        of pixels: integer keypoint matching quantizes the disparity; the
        SAD parabola must recover the fraction (reference
        Frame::ComputeStereoMatches subpixel stage)."""
        import numpy as np
        from orbslam3_tpu.features import stereo as st
        from orbslam3_tpu.features.extractor import FeatureFrame

        rng = np.random.default_rng(3)
        h, w = 64, 128
        big = rng.uniform(0, 255, (h, w + 8)).astype(np.float64)
        # smooth it so subpixel interpolation is well-posed
        for _ in range(2):
            big = 0.25 * (np.roll(big, 1, 1) + np.roll(big, -1, 1)
                          + np.roll(big, 1, 0) + np.roll(big, -1, 0))
        true_disp = 4.6
        xs = np.arange(w) + true_disp
        x0 = xs.astype(int)
        f = xs - x0
        img_l = jnp.asarray(big[:, :w].astype(np.float32))
        img_r = jnp.asarray(
            (big[:, :w] * 0).astype(np.float32))
        img_r = jnp.asarray(
            ((1 - f) * big[:, x0] + f * big[:, x0 + 1]).astype(np.float32))

        n = 12
        xy = np.stack([rng.uniform(20, w - 20, n),
                       rng.uniform(10, h - 10, n)], 1).astype(np.float32)
        # integer-quantized initial match: ur = x - round(true_disp)
        ur0 = np.round(xy[:, 0]) - round(true_disp)
        d0 = st.StereoDepth(ur=jnp.asarray(ur0, jnp.float32),
                            depth=jnp.ones(n), valid=jnp.ones(n, bool))
        d1 = st.refine_disparity(img_l, img_r, jnp.asarray(xy), d0,
                                 fx=100.0, baseline=0.1)
        disp = np.round(xy[:, 0]) - np.asarray(d1.ur)
        err = np.abs(disp - true_disp)
        # parabola-on-sampled-cost keeps a small residual bias (the
        # reference's SAD sweep has the same class of error); it must
        # still clearly beat the 0.4 px integer-quantization error here
        assert np.median(err) < 0.25, (np.median(err), disp[:6])
