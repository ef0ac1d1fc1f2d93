import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import lie


def rand_w(key, n=64, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_is_rotation(self):
        w = rand_w(jax.random.PRNGKey(0))
        R = lie.exp_so3(w)
        I = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2),
                                   jnp.broadcast_to(I, R.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(1), scale=1.0)
        # restrict to principal domain |w| < pi where log is the inverse
        w = w / (1.0 + jnp.linalg.norm(w, axis=-1, keepdims=True) / jnp.pi)
        w2 = lie.log_so3(lie.exp_so3(w))
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_exp_log_rotation_consistency(self):
        # beyond the principal domain, Exp(Log(R)) must still equal R
        w = rand_w(jax.random.PRNGKey(10), scale=3.0)
        R = lie.exp_so3(w)
        R2 = lie.exp_so3(lie.log_so3(R))
        np.testing.assert_allclose(R, R2, atol=1e-3)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = lie.exp_so3(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(R)))

    def test_log_near_pi(self):
        axis = np.array([0.3, -0.5, 0.8])
        axis /= np.linalg.norm(axis)
        for theta in [np.pi - 1e-4, np.pi - 1e-2]:
            w = jnp.asarray(axis * theta, dtype=jnp.float32)
            w2 = lie.log_so3(lie.exp_so3(w))
            np.testing.assert_allclose(np.asarray(w2), axis * theta, atol=2e-3)

    def test_right_jacobian_fd(self):
        """Exp(w + dw) ~= Exp(w) Exp(Jr(w) dw)."""
        w = jnp.array([0.3, -0.2, 0.5])
        Jr = lie.right_jacobian_so3(w)
        eps = 1e-4
        for k in range(3):
            dw = jnp.zeros(3).at[k].set(eps)
            lhs = lie.exp_so3(w + dw)
            rhs = lie.exp_so3(w) @ lie.exp_so3(Jr @ dw)
            np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_inv_right_jacobian(self):
        w = rand_w(jax.random.PRNGKey(2), n=16, scale=1.5)
        J = lie.right_jacobian_so3(w)
        Jinv = lie.inv_right_jacobian_so3(w)
        I = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, I, atol=1e-4)

    def test_normalize_rotation(self):
        R = lie.exp_so3(jnp.array([0.2, 0.4, -0.1]))
        noisy = R + 0.01 * jax.random.normal(jax.random.PRNGKey(3), (3, 3))
        Rn = lie.normalize_rotation(noisy)
        np.testing.assert_allclose(Rn @ Rn.T, jnp.eye(3), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(Rn), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(4)
        xi = jax.random.normal(key, (32, 6))
        # keep rotation in the principal domain |phi| < pi
        phi = xi[:, 3:]
        xi = xi.at[:, 3:].set(
            phi / (1.0 + jnp.linalg.norm(phi, axis=-1, keepdims=True) / jnp.pi))
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (8, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(tc, jnp.zeros_like(tc), atol=1e-5)

    def test_apply(self):
        R = lie.exp_so3(jnp.array([0.0, 0.0, jnp.pi / 2]))
        t = jnp.array([1.0, 0.0, 0.0])
        x = jnp.array([1.0, 0.0, 0.0])
        y = lie.se3_apply(R, t, x)
        np.testing.assert_allclose(y, jnp.array([1.0, 1.0, 0.0]), atol=1e-6)


class TestSim3:
    def test_compose_inverse(self):
        key = jax.random.PRNGKey(6)
        R = lie.exp_so3(jax.random.normal(key, (4, 3)))
        t = jax.random.normal(jax.random.PRNGKey(7), (4, 3))
        s = jnp.exp(jax.random.normal(jax.random.PRNGKey(8), (4,)) * 0.3)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(tc, jnp.zeros_like(tc), atol=1e-5)
        np.testing.assert_allclose(sc, jnp.ones_like(sc), atol=1e-5)

    def test_apply_roundtrip(self):
        R = lie.exp_so3(jnp.array([0.1, 0.2, 0.3]))
        t = jnp.array([1.0, -2.0, 0.5])
        s = jnp.array(2.5)
        x = jnp.array([[0.3, 0.4, 1.2], [0.0, 0.0, 0.0]])
        y = lie.sim3_apply(R, t, s, x)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        x2 = lie.sim3_apply(Ri, ti, si, y)
        np.testing.assert_allclose(x, x2, atol=1e-5)


class TestQuat:
    def test_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(9), n=128, scale=2.5)
        R = lie.exp_so3(w)
        q = lie.rot_to_quat(R)
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)
