import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.geometry import twoview
from orbslam3_tpu.ops import cameras, lie

K4 = jnp.array([458.654, 457.296, 367.215, 248.375])


def make_pair(key, n=300, planar=False, noise=0.5, baseline=0.5):
    keys = jax.random.split(key, 3)
    if planar:
        uvz = jax.random.uniform(keys[0], (n, 2), minval=-2, maxval=2)
        X = jnp.concatenate([uvz, jnp.zeros((n, 1))], axis=1)
        # strongly tilted plane: a mild tilt leaves the Faugeras two-fold
        # ambiguity unresolved by cheirality and the (reference-parity)
        # secondBest<0.75*best gate correctly defers initialization
        Rp = lie.exp_so3(jnp.array([0.8, 0.3, 0.0]))
        X = X @ Rp.T + jnp.array([0.0, 0.0, 3.5])
        baseline = 1.5
    else:
        X = jax.random.normal(keys[0], (n, 3)) * jnp.array([2.0, 2.0, 1.5]) \
            + jnp.array([0.0, 0.0, 6.0])
    R21 = lie.exp_so3(jnp.array([0.02, -0.08, 0.01]))
    t21 = jnp.array([-baseline, 0.02, 0.03])
    x1 = X
    x2 = lie.se3_apply(R21, t21, X)
    uv1 = cameras.pinhole_project(K4, x1) + noise * jax.random.normal(keys[1], (n, 2))
    uv2 = cameras.pinhole_project(K4, x2) + noise * jax.random.normal(keys[2], (n, 2))
    inb = (uv1 > 0).all(1) & (uv1 < jnp.array([752.0, 480.0])).all(1) & \
          (uv2 > 0).all(1) & (uv2 < jnp.array([752.0, 480.0])).all(1) & (x1[:, 2] > 0.1)
    return uv1, uv2, inb, X, R21, t21


def check_pose(res, R21, t21, atol_rot=0.02, atol_dir=0.05):
    err_rot = float(jnp.linalg.norm(lie.log_so3(res.R21.T @ R21)))
    t_est = res.t21 / (jnp.linalg.norm(res.t21) + 1e-12)
    t_gt = t21 / jnp.linalg.norm(t21)
    err_dir = float(jnp.linalg.norm(t_est - t_gt))
    assert err_rot < atol_rot, err_rot
    assert err_dir < atol_dir, err_dir


class TestTwoView:
    def test_general_scene_uses_F(self):
        uv1, uv2, valid, X, R21, t21 = make_pair(jax.random.PRNGKey(0))
        res = twoview.reconstruct(uv1, uv2, valid, K4, jax.random.PRNGKey(1))
        assert bool(res.success)
        assert not bool(res.used_homography)
        check_pose(res, R21, t21)
        assert int(jnp.sum(res.triangulated)) > 100

    def test_planar_scene_uses_H(self):
        uv1, uv2, valid, X, R21, t21 = make_pair(jax.random.PRNGKey(2),
                                                 planar=True, noise=0.3)
        res = twoview.reconstruct(uv1, uv2, valid, K4, jax.random.PRNGKey(3))
        assert bool(res.success)
        assert bool(res.used_homography)
        check_pose(res, R21, t21, atol_rot=0.05, atol_dir=0.1)

    def test_outliers_rejected(self):
        uv1, uv2, valid, X, R21, t21 = make_pair(jax.random.PRNGKey(4))
        n = uv1.shape[0]
        # 15%: at 20% enough random outliers fall near epipolar lines to
        # inflate N_inl past the (reference-parity) maxGood >= 0.9*N gate
        n_bad = n * 3 // 20
        uv2 = uv2.at[:n_bad].set(
            jax.random.uniform(jax.random.PRNGKey(5), (n_bad, 2),
                               minval=0, maxval=400))
        res = twoview.reconstruct(uv1, uv2, valid, K4, jax.random.PRNGKey(6))
        assert bool(res.success)
        check_pose(res, R21, t21, atol_rot=0.03, atol_dir=0.08)
        tri = np.asarray(res.triangulated)
        assert tri[:n_bad].mean() < 0.1

    def test_pure_rotation_fails(self):
        """No baseline -> no parallax -> must reject initialization."""
        uv1, uv2, valid, X, R21, t21 = make_pair(jax.random.PRNGKey(7),
                                                 baseline=0.0, noise=0.2)
        res = twoview.reconstruct(uv1, uv2, valid, K4, jax.random.PRNGKey(8))
        assert not bool(res.success)

    def test_triangulated_points_match_gt(self):
        uv1, uv2, valid, X, R21, t21 = make_pair(jax.random.PRNGKey(9),
                                                 noise=0.2)
        res = twoview.reconstruct(uv1, uv2, valid, K4, jax.random.PRNGKey(10))
        assert bool(res.success)
        tri = np.asarray(res.triangulated)
        Xr = np.asarray(res.points3d)[tri]
        Xg = np.asarray(X)[tri]
        # reconstruction is up to scale: estimate scale from medians
        s = np.median(np.linalg.norm(Xg, axis=1)) / \
            np.median(np.linalg.norm(Xr, axis=1))
        err = np.linalg.norm(Xr * s - Xg, axis=1)
        assert np.median(err) < 0.1, np.median(err)
