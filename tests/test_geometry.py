import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import align, cameras, lie, triangulate

EUROC_PINHOLE = jnp.array([458.654, 457.296, 367.215, 248.375])
TUMVI_KB8 = jnp.array([190.97847715128717, 190.9733070521226,
                       254.93170605935475, 256.8974428996504,
                       0.0034823894022493434, 0.0007150348452162257,
                       -0.0020532361418706202, 0.00020293673591811182])


class TestPinhole:
    def test_project_unproject(self):
        key = jax.random.PRNGKey(0)
        xc = jax.random.normal(key, (100, 3)) * jnp.array([1.0, 1.0, 0.1]) \
            + jnp.array([0.0, 0.0, 3.0])
        uv = cameras.pinhole_project(EUROC_PINHOLE, xc)
        rays = cameras.pinhole_unproject(EUROC_PINHOLE, uv)
        # rays should be parallel to xc
        xc_n = xc / xc[..., 2:3]
        np.testing.assert_allclose(rays, xc_n, atol=1e-4)

    def test_jacobian_matches_ad(self):
        xc = jnp.array([[0.3, -0.2, 2.0], [1.0, 1.0, 5.0]])
        J = cameras.pinhole_project_jac(EUROC_PINHOLE, xc)
        J_ad = jax.vmap(jax.jacfwd(
            lambda p: cameras.pinhole_project(EUROC_PINHOLE, p)))(xc)
        np.testing.assert_allclose(J, J_ad, atol=1e-4, rtol=1e-4)


class TestKB8:
    def test_project_unproject(self):
        key = jax.random.PRNGKey(1)
        # wide-angle points (fisheye covers > 90 deg)
        dirs = jax.random.normal(key, (200, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.where(dirs[..., 2:3] < 0.2, dirs * jnp.array([1, 1, -1.0]), dirs)
        dirs = dirs.at[..., 2].set(jnp.abs(dirs[..., 2]) + 0.2)
        uv = cameras.kb8_project(TUMVI_KB8, dirs)
        b = cameras.kb8_unproject(TUMVI_KB8, uv)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        np.testing.assert_allclose(b, d, atol=1e-3)

    def test_on_axis(self):
        uv = cameras.kb8_project(TUMVI_KB8, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(uv, TUMVI_KB8[2:4], atol=1e-5)


class TestTriangulate:
    def test_dlt_exact(self):
        key = jax.random.PRNGKey(2)
        X = jax.random.normal(key, (50, 3)) + jnp.array([0.0, 0.0, 5.0])
        R1, t1 = jnp.eye(3), jnp.zeros(3)
        R2 = lie.exp_so3(jnp.array([0.0, 0.1, 0.0]))
        t2 = jnp.array([-1.0, 0.0, 0.0])
        x1 = lie.se3_apply(R1, t1, X)
        x2 = lie.se3_apply(R2, t2, X)
        ray1 = x1 / x1[..., 2:3]
        ray2 = x2 / x2[..., 2:3]
        Xh = triangulate.triangulate_dlt(
            ray1, ray2,
            jnp.broadcast_to(R1, (50, 3, 3)), jnp.broadcast_to(t1, (50, 3)),
            jnp.broadcast_to(R2, (50, 3, 3)), jnp.broadcast_to(t2, (50, 3)))
        np.testing.assert_allclose(Xh, X, atol=1e-3)


class TestAlign:
    def test_umeyama_recovers_sim3(self):
        key = jax.random.PRNGKey(3)
        src = jax.random.normal(key, (40, 3))
        R = lie.exp_so3(jnp.array([0.4, -0.2, 0.9]))
        s = 2.3
        t = jnp.array([1.0, 2.0, -0.5])
        dst = s * src @ R.T + t
        R2, t2, s2 = align.umeyama_alignment(src, dst)
        np.testing.assert_allclose(R2, R, atol=1e-4)
        np.testing.assert_allclose(t2, t, atol=1e-4)
        np.testing.assert_allclose(s2, s, atol=1e-4)

    def test_ate_zero_for_identical(self):
        key = jax.random.PRNGKey(4)
        traj = jnp.cumsum(jax.random.normal(key, (100, 3)) * 0.1, axis=0)
        rmse, s, _, _ = align.ate_rmse(traj * 3.0, traj)
        assert float(rmse) < 1e-4
        np.testing.assert_allclose(float(s), 1 / 3.0, atol=1e-4)
