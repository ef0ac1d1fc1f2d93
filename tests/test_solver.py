"""LM solver tests vs synthetic ground truth (SURVEY §4: 'LM solver vs
small dense problems')."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import cameras, lie
from orbslam3_tpu.solver import ba, pose_opt

K_EUROC = jnp.array([458.654, 457.296, 367.215, 248.375])


def synth_scene(key, n_pts=200, n_cams=5, noise_px=0.5, spread=2.0):
    keys = jax.random.split(key, 4)
    X = jax.random.normal(keys[0], (n_pts, 3)) * jnp.array([spread, spread, 1.0]) \
        + jnp.array([0.0, 0.0, 6.0])
    poses = []
    for i in range(n_cams):
        w = 0.05 * jax.random.normal(jax.random.fold_in(keys[1], i), (3,))
        R = lie.exp_so3(w)
        t = jnp.array([0.3 * i, 0.0, 0.0]) + \
            0.05 * jax.random.normal(jax.random.fold_in(keys[2], i), (3,))
        poses.append((R, t))
    R = jnp.stack([p[0] for p in poses])
    t = jnp.stack([p[1] for p in poses])
    uv = jax.vmap(lambda Ri, ti: cameras.pinhole_project(
        K_EUROC, lie.se3_apply(Ri, ti, X)))(R, t)  # (C, N, 2)
    uv = uv + noise_px * jax.random.normal(keys[3], uv.shape)
    return X, R, t, uv


class TestPoseOpt:
    def test_recovers_pose_from_perturbation(self):
        key = jax.random.PRNGKey(0)
        X, R, t, uv = synth_scene(key, n_cams=1, noise_px=0.3)
        R0, t0 = R[0], t[0]
        # perturb
        dR, dt = lie.se3_exp(jnp.array([0.05, -0.03, 0.02, 0.02, -0.01, 0.03]))
        Rp, tp = lie.se3_compose(dR, dt, R0, t0)
        n = X.shape[0]
        res = pose_opt.pose_optimization(
            Rp, tp, X, uv[0], jnp.ones(n), jnp.ones(n, bool),
            "pinhole", K_EUROC)
        err_rot = float(jnp.linalg.norm(lie.log_so3(res.R.T @ R0)))
        err_t = float(jnp.linalg.norm(res.t - t0))
        assert err_rot < 1e-3, err_rot
        assert err_t < 5e-3, err_t
        assert int(res.n_inliers) > 190

    def test_outlier_rejection(self):
        key = jax.random.PRNGKey(1)
        X, R, t, uv = synth_scene(key, n_cams=1, noise_px=0.3)
        n = X.shape[0]
        # corrupt 20% of observations badly
        n_bad = n // 5
        uv0 = uv[0].at[:n_bad].add(
            50.0 * jax.random.normal(jax.random.PRNGKey(2), (n_bad, 2)))
        dR, dt = lie.se3_exp(jnp.array([0.02, 0.01, -0.02, 0.01, 0.02, -0.01]))
        Rp, tp = lie.se3_compose(dR, dt, R[0], t[0])
        res = pose_opt.pose_optimization(
            Rp, tp, X, uv0, jnp.ones(n), jnp.ones(n, bool),
            "pinhole", K_EUROC)
        inl = np.asarray(res.inliers)
        assert inl[:n_bad].mean() < 0.2   # outliers rejected
        assert inl[n_bad:].mean() > 0.9   # inliers kept
        err_t = float(jnp.linalg.norm(res.t - t[0]))
        assert err_t < 1e-2, err_t


def make_ba_problem(X, R, t, uv, fix_first=True, pt_noise=0.0, key=None):
    n_cams, n_pts = R.shape[0], X.shape[0]
    obs_cam = jnp.repeat(jnp.arange(n_cams), n_pts)
    obs_pt = jnp.tile(jnp.arange(n_pts), n_cams)
    obs_uv = uv.reshape(-1, 2)
    Xn = X + (pt_noise * jax.random.normal(key, X.shape) if pt_noise else 0.0)
    fixed = jnp.zeros(n_cams, bool).at[0].set(fix_first)
    if n_cams > 1 and fix_first:
        fixed = fixed.at[1].set(True)  # fix 2 cams to pin gauge + scale
    return ba.BAProblem(
        R=R, t=t, cam_fixed=fixed, cam_valid=jnp.ones(n_cams, bool),
        X=Xn, pt_valid=jnp.ones(n_pts, bool),
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
        obs_inv_sigma2=jnp.ones(obs_uv.shape[0]),
        obs_valid=jnp.ones(obs_uv.shape[0], bool))


class TestBA:
    def test_refines_noisy_points_and_poses(self):
        key = jax.random.PRNGKey(3)
        X, R, t, uv = synth_scene(key, n_pts=120, n_cams=5, noise_px=0.0)
        # perturb non-fixed poses and all points
        keyp = jax.random.PRNGKey(4)
        dxi = 0.01 * jax.random.normal(keyp, (5, 6))
        dxi = dxi.at[0].set(0.0).at[1].set(0.0)
        dR, dt = lie.se3_exp(dxi)
        Rp, tp = lie.se3_compose(dR, dt, R, t)
        prob = make_ba_problem(X, Rp, tp, uv, pt_noise=0.05,
                               key=jax.random.PRNGKey(5))
        res = ba.bundle_adjust(prob, "pinhole", K_EUROC, iterations=15)
        # reprojection error should collapse to ~0 (no obs noise)
        rms = float(jnp.sqrt(jnp.mean(res.obs_chi2)))
        assert rms < 0.1, rms
        # absolute pose recovery (gauge fixed by 2 cams)
        err_t = float(jnp.max(jnp.linalg.norm(res.t - t, axis=-1)))
        assert err_t < 5e-3, err_t
        err_X = float(jnp.mean(jnp.linalg.norm(res.X - X, axis=-1)))
        assert err_X < 5e-3, err_X

    def test_fixed_cameras_stay_fixed(self):
        key = jax.random.PRNGKey(6)
        X, R, t, uv = synth_scene(key, n_pts=80, n_cams=3, noise_px=0.2)
        prob = make_ba_problem(X, R, t, uv, pt_noise=0.02,
                               key=jax.random.PRNGKey(7))
        res = ba.bundle_adjust(prob, "pinhole", K_EUROC, iterations=5)
        np.testing.assert_allclose(res.R[0], R[0], atol=1e-7)
        np.testing.assert_allclose(res.t[0], t[0], atol=1e-7)

    def test_masked_padding_is_inert(self):
        """Padded cameras/points/observations must not affect the solve."""
        key = jax.random.PRNGKey(8)
        X, R, t, uv = synth_scene(key, n_pts=50, n_cams=3, noise_px=0.1)
        prob = make_ba_problem(X, R, t, uv, pt_noise=0.02,
                               key=jax.random.PRNGKey(9))
        res1 = ba.bundle_adjust(prob, "pinhole", K_EUROC, iterations=6)
        # pad with garbage
        padC, padP, padO = 2, 20, 40
        prob2 = ba.BAProblem(
            R=jnp.concatenate([prob.R, jnp.tile(jnp.eye(3), (padC, 1, 1))]),
            t=jnp.concatenate([prob.t, jnp.full((padC, 3), 9.0)]),
            cam_fixed=jnp.concatenate([prob.cam_fixed, jnp.zeros(padC, bool)]),
            cam_valid=jnp.concatenate([prob.cam_valid, jnp.zeros(padC, bool)]),
            X=jnp.concatenate([prob.X, jnp.full((padP, 3), 77.0)]),
            pt_valid=jnp.concatenate([prob.pt_valid, jnp.zeros(padP, bool)]),
            obs_cam=jnp.concatenate([prob.obs_cam, jnp.full(padO, 3, jnp.int32)]),
            obs_pt=jnp.concatenate([prob.obs_pt, jnp.full(padO, 55, jnp.int32)]),
            obs_uv=jnp.concatenate([prob.obs_uv, jnp.full((padO, 2), 1e4)]),
            obs_inv_sigma2=jnp.concatenate([prob.obs_inv_sigma2, jnp.ones(padO)]),
            obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(padO, bool)]))
        res2 = ba.bundle_adjust(prob2, "pinhole", K_EUROC, iterations=6)
        np.testing.assert_allclose(res1.t, res2.t[:3], atol=1e-5)
        np.testing.assert_allclose(res1.X, res2.X[:50], atol=1e-4)
