import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.geometry import pnp
from orbslam3_tpu.ops import cameras, lie

K4 = jnp.array([458.654, 457.296, 367.215, 248.375])


def scene(key, n=120, noise=0.4):
    keys = jax.random.split(key, 3)
    X = jax.random.normal(keys[0], (n, 3)) * jnp.array([2.0, 2.0, 1.2]) \
        + jnp.array([0.0, 0.0, 6.0])
    R = lie.exp_so3(jnp.array([0.2, -0.3, 0.1]))
    t = jnp.array([0.4, -0.2, 0.3])
    uv = cameras.pinhole_project(K4, lie.se3_apply(R, t, X))
    uv = uv + noise * jax.random.normal(keys[1], uv.shape)
    return X, uv, R, t


class TestPnP:
    def test_recovers_pose_no_prior(self):
        X, uv, R, t = scene(jax.random.PRNGKey(0))
        res = pnp.solve_pnp(X, uv, jnp.ones(X.shape[0], bool),
                            "pinhole", K4, jax.random.PRNGKey(1))
        assert bool(res.success), int(res.n_inliers)
        assert float(jnp.linalg.norm(lie.log_so3(res.R.T @ R))) < 5e-3
        assert float(jnp.linalg.norm(res.t - t)) < 2e-2

    def test_outlier_robust(self):
        X, uv, R, t = scene(jax.random.PRNGKey(2))
        n = X.shape[0]
        nb = n // 3
        uv = uv.at[:nb].set(jax.random.uniform(
            jax.random.PRNGKey(3), (nb, 2), minval=0, maxval=700))
        res = pnp.solve_pnp(X, uv, jnp.ones(n, bool),
                            "pinhole", K4, jax.random.PRNGKey(4))
        assert bool(res.success)
        assert float(jnp.linalg.norm(res.t - t)) < 3e-2
        inl = np.asarray(res.inliers)
        assert inl[:nb].mean() < 0.15

    def test_degenerate_few_points(self):
        X, uv, R, t = scene(jax.random.PRNGKey(5))
        valid = jnp.zeros(X.shape[0], bool).at[:8].set(True)
        res = pnp.solve_pnp(X, uv, valid, "pinhole", K4,
                            jax.random.PRNGKey(6), min_inliers=30)
        assert not bool(res.success)  # under min_inliers => reject
