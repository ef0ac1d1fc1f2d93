"""VI frame pose optimization vs simulated ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import cameras, imu, lie
from orbslam3_tpu.solver import inertial, vi_pose_opt
from test_inertial import CALIB, G, make_factors, simulate

K4 = jnp.array([458.654, 457.296, 367.215, 248.375])


class TestVIPoseOpt:
    def test_refines_frame_state(self):
        Rs, ps, vs, accs, gyrs, dt = simulate(n_kf=3, kf_dt=0.3, seed=4)
        f_all = make_factors(accs, gyrs, dt)
        # single factor KF0 -> frame(=KF1)
        f1 = jax.tree.map(lambda a: a[:1], f_all)
        f1 = f1._replace(kf_i=jnp.zeros(1, jnp.int32),
                         kf_j=jnp.ones(1, jnp.int32),
                         valid=jnp.ones(1, bool))
        rng = np.random.default_rng(0)
        n = 150
        X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                      rng.uniform(6, 12, n)], 1).astype(np.float32)
        # camera == body
        Rwb1, pwb1 = jnp.asarray(Rs[1]), jnp.asarray(ps[1])
        Xc = (jnp.asarray(X) - pwb1) @ Rwb1
        uv = cameras.pinhole_project(K4, Xc)
        uv = uv + 0.3 * jax.random.normal(jax.random.PRNGKey(1), uv.shape)
        vis = Xc[:, 2] > 0.5

        # perturbed initial state
        d = jnp.concatenate([
            jnp.asarray([0.02, -0.015, 0.01, 0.05, -0.04, 0.06]),
            jnp.asarray([0.2, -0.15, 0.1]), jnp.zeros(6)])
        R0, p0, v0, b0 = vi_pose_opt.apply_delta(
            Rwb1, pwb1, jnp.asarray(vs[1]), jnp.zeros(6), d)
        res = vi_pose_opt.vi_pose_optimization(
            R0, p0, v0, b0,
            jnp.asarray(Rs[0]), jnp.asarray(ps[0]), jnp.asarray(vs[0]),
            jnp.zeros(6), f1,
            jnp.asarray(X), uv, jnp.ones(n), vis,
            "pinhole", K4, jnp.eye(3), jnp.zeros(3), G)
        err_p = float(jnp.linalg.norm(res.pwb - pwb1))
        err_v = float(jnp.linalg.norm(res.vel - jnp.asarray(vs[1])))
        err_r = float(jnp.linalg.norm(lie.log_so3(res.Rwb.T @ Rwb1)))
        assert err_p < 5e-3, err_p
        assert err_r < 2e-3, err_r
        assert err_v < 0.05, err_v
        assert int(res.n_inliers) > 100
        # the returned Hessian must be PSD (usable as the next frame prior)
        eig = np.linalg.eigvalsh(np.asarray(res.H))
        assert eig.min() > -1e-3

    def test_inertial_edge_constrains_without_vision(self):
        """With no visual inliers the IMU edge alone pins the state to the
        prediction (RECENTLY_LOST behavior)."""
        Rs, ps, vs, accs, gyrs, dt = simulate(n_kf=3, kf_dt=0.3, seed=5)
        f_all = make_factors(accs, gyrs, dt)
        f1 = jax.tree.map(lambda a: a[:1], f_all)
        f1 = f1._replace(kf_i=jnp.zeros(1, jnp.int32),
                         kf_j=jnp.ones(1, jnp.int32),
                         valid=jnp.ones(1, bool))
        n = 50
        X = jnp.zeros((n, 3))
        uv = jnp.zeros((n, 2))
        res = vi_pose_opt.vi_pose_optimization(
            jnp.asarray(Rs[1]), jnp.asarray(ps[1]) + 0.05,
            jnp.asarray(vs[1]), jnp.zeros(6),
            jnp.asarray(Rs[0]), jnp.asarray(ps[0]), jnp.asarray(vs[0]),
            jnp.zeros(6), f1,
            X, uv, jnp.ones(n), jnp.zeros(n, bool),
            "pinhole", K4, jnp.eye(3), jnp.zeros(3), G)
        err_p = float(jnp.linalg.norm(res.pwb - jnp.asarray(ps[1])))
        assert err_p < 0.02, err_p
