"""RGB-D sensor mode: depth image -> virtual right coordinate -> the
stereo pipeline (reference System RGBD sensor, include/System.h:61-68;
Frame::ComputeStereoFromRGBD upstream)."""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import align
from orbslam3_tpu.pipeline import rgbd_system, stereo_system, system as base_sys
from test_loop_integration import make_ff
from test_pipeline_e2e import HW, K4, N_KP

FX = K4[0]
BASELINE = 0.11
PLANE_Z = 6.0


def small_rot(yaw, pitch):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return (Ry @ Rx).astype(np.float64)


class PlaneWorld:
    """Textured plane z = PLANE_Z viewed by a translating camera.
    A plane admits an exact dense depth image (ray-plane intersection),
    which is what an RGB-D sensor delivers."""

    def __init__(self, seed=0, n_pts=3000):
        self.rng = np.random.default_rng(seed)
        x = self.rng.uniform(-5.0, 9.0, n_pts)
        y = self.rng.uniform(-4.0, 4.0, n_pts)
        self.X = np.stack([x, y, np.full(n_pts, PLANE_Z)], 1)
        self.desc = self.rng.integers(0, 2 ** 32, (n_pts, 8),
                                      dtype=np.uint32)
        # constant pixel-ray grid K^-1 [u, v, 1]
        u, v = np.meshgrid(np.arange(HW[1]), np.arange(HW[0]))
        self.rays = np.stack([(u - K4[2]) / K4[0],
                              (v - K4[3]) / K4[1],
                              np.ones_like(u, np.float64)], -1)

    def frame(self, R_cw, t_cw, noise_px=0.3):
        Xc = self.X @ np.asarray(R_cw).T + np.asarray(t_cw)
        z = Xc[:, 2]
        u = K4[0] * Xc[:, 0] / np.maximum(z, 1e-6) + K4[2]
        v = K4[1] * Xc[:, 1] / np.maximum(z, 1e-6) + K4[3]
        vis = (z > 0.3) & (u > 10) & (u < HW[1] - 10) & \
              (v > 10) & (v < HW[0] - 10)
        vis &= self.rng.random(len(z)) > 0.15
        idx = np.nonzero(vis)[0]
        self.rng.shuffle(idx)
        idx = idx[:N_KP]
        n = len(idx)
        xy = np.stack([u[idx] + noise_px * self.rng.standard_normal(n),
                       v[idx] + noise_px * self.rng.standard_normal(n)], 1)
        ff = make_ff(xy.astype(np.float32), self.desc[idx], N_KP)

        # exact dense depth: camera center O_w and per-pixel world ray
        R_wc = np.asarray(R_cw).T
        O_w = -R_wc @ np.asarray(t_cw)
        d_w = np.einsum("ij,hwj->hwi", R_wc, self.rays)
        lam = (PLANE_Z - O_w[2]) / np.maximum(d_w[..., 2], 1e-9)
        depth = np.where(d_w[..., 2] > 1e-6, lam, 0.0).astype(np.float32)
        return ff, depth


class TestRGBDDepthSampling:
    def test_virtual_ur_matches_projection(self):
        """ur sampled from the depth image must equal the true right-
        camera projection of the same point (the stereo identity
        ur = u - fx*b/z, Frame::ComputeStereoFromRGBD)."""
        w = PlaneWorld(seed=3)
        R = small_rot(0.04, -0.03)
        t = np.array([0.2, -0.1, 0.0])
        ff, depth = w.frame(R, t, noise_px=0.0)
        cfg = base_sys.SlamConfig(
            cam_params=K4, image_hw=HW, stereo_bf=FX * BASELINE)
        sys_ = rgbd_system.RGBDSystem(
            cfg, stereo_system.StereoConfig(baseline=BASELINE))
        d = sys_._rgbd_depth_jit(ff, jnp.asarray(depth))
        ok = np.asarray(d.valid)
        assert ok.sum() > 200
        # true depth of each keypoint from the plane geometry
        xy = np.asarray(ff.xy)[ok]
        rays = np.stack([(xy[:, 0] - K4[2]) / K4[0],
                         (xy[:, 1] - K4[3]) / K4[1],
                         np.ones(len(xy))], 1)
        R_wc = R.T
        O_w = -R_wc @ t
        d_w = rays @ R_wc.T
        z_true = (PLANE_Z - O_w[2]) / d_w[:, 2]
        ur_true = xy[:, 0] - FX * BASELINE / z_true
        # nearest-pixel sampling of a smooth depth field: sub-pixel error
        err = np.abs(np.asarray(d.ur)[ok] - ur_true)
        assert np.median(err) < 0.5, np.median(err)
        assert np.all(np.asarray(d.depth)[ok] > 0)


@pytest.mark.slow
class TestRGBDPipeline:
    def test_metric_trajectory_without_scale_alignment(self):
        w = PlaneWorld(seed=4)
        n_frames = 40
        cfg = base_sys.SlamConfig(
            cam_params=K4, image_hw=HW, max_frames_between_kf=8,
            ba_caps=(24, 4096, 16384), stereo_bf=FX * BASELINE)
        sys_ = rgbd_system.RGBDSystem(
            cfg, stereo_system.StereoConfig(baseline=BASELINE))
        poses = []
        for i in range(n_frames):
            R_cw = small_rot(0.03 * np.sin(0.25 * i),
                             0.02 * np.sin(0.17 * i))
            O_w = np.array([0.06 * i, 0.02 * np.sin(0.3 * i), 0.0])
            t_cw = -R_cw @ O_w
            poses.append((R_cw, t_cw, O_w))
            ff, depth = w.frame(R_cw, t_cw, noise_px=0.3)
            st, pose = sys_.track_rgbd(None, depth, ts=i * 0.05,
                                       features=ff)
        assert sys_.n_resets == 0
        assert sys_.state == base_sys.OK
        est = np.stack([p[2] for p in sys_.trajectory])
        gt = np.stack([poses[int(round(t / 0.05))][2]
                       for t, _, _ in sys_.trajectory])
        # RGB-D is metric: evaluate WITHOUT scale alignment
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt),
                                       with_scale=False)
        assert float(rmse) < 0.02, float(rmse)
        _, s2, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert abs(float(s2) - 1.0) < 0.01, float(s2)
