"""Preintegration vs analytic constant-motion oracles (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import imu, lie

CALIB = imu.ImuCalib.create(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)


def integrate_ref(acc, gyro, dts, bias):
    """NumPy oracle: sequential preintegration, direct transcription of the
    update order (position, velocity, then rotation)."""
    bg, ba = bias[:3], bias[3:]
    dR = np.eye(3)
    dV = np.zeros(3)
    dP = np.zeros(3)
    for a_m, w_m, dt in zip(acc, gyro, dts):
        a = a_m - ba
        w = w_m - bg
        dP = dP + dV * dt + 0.5 * dR @ a * dt * dt
        dV = dV + dR @ a * dt
        th = w * dt
        dR = dR @ np.asarray(lie.exp_so3(jnp.asarray(th, jnp.float32)))
    return dR, dV, dP


class TestPreintegration:
    def test_static_gravity(self):
        """Static IMU measuring only gravity reaction: dV = R*(a)*t."""
        n = 100
        acc = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (n, 1))
        gyro = jnp.zeros((n, 3))
        dt = jnp.full(n, 0.005)
        st = imu.preintegrate(acc, gyro, dt, jnp.ones(n, bool), CALIB)
        T = 0.5
        np.testing.assert_allclose(st.dT, T, atol=1e-6)
        np.testing.assert_allclose(st.dR, jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(st.dV, jnp.array([0, 0, 9.81 * T]), rtol=1e-4)
        np.testing.assert_allclose(st.dP, jnp.array([0, 0, 0.5 * 9.81 * T**2]),
                                   rtol=1e-3)

    def test_constant_rotation(self):
        """Pure constant gyro rate: dR = Exp(w T)."""
        n = 200
        w = jnp.array([0.0, 0.0, 1.2])
        acc = jnp.zeros((n, 3))
        gyro = jnp.tile(w, (n, 1))
        dt = jnp.full(n, 0.005)
        st = imu.preintegrate(acc, gyro, dt, jnp.ones(n, bool), CALIB)
        np.testing.assert_allclose(st.dR, lie.exp_so3(w * 1.0), atol=1e-4)

    def test_vs_numpy_oracle(self):
        key = jax.random.PRNGKey(0)
        n = 50
        acc = jax.random.normal(key, (n, 3)) * 2 + jnp.array([0, 0, 9.8])
        gyro = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.3
        dt = jnp.full(n, 0.005)
        bias = jnp.array([0.01, -0.02, 0.005, 0.1, -0.05, 0.2])
        st = imu.preintegrate(acc, gyro, dt, jnp.ones(n, bool), CALIB, bias)
        dR, dV, dP = integrate_ref(np.asarray(acc), np.asarray(gyro),
                                   np.asarray(dt), np.asarray(bias))
        np.testing.assert_allclose(st.dR, dR, atol=1e-4)
        np.testing.assert_allclose(st.dV, dV, atol=1e-4)
        np.testing.assert_allclose(st.dP, dP, atol=1e-4)

    def test_mask_padding_noop(self):
        """Padded (masked) samples must not change the result."""
        key = jax.random.PRNGKey(2)
        n = 30
        acc = jax.random.normal(key, (n, 3))
        gyro = jax.random.normal(jax.random.PRNGKey(3), (n, 3)) * 0.2
        dt = jnp.full(n, 0.01)
        st1 = imu.preintegrate(acc, gyro, dt, jnp.ones(n, bool), CALIB)
        pad = 10
        acc2 = jnp.concatenate([acc, jnp.full((pad, 3), 123.0)])
        gyro2 = jnp.concatenate([gyro, jnp.full((pad, 3), -55.0)])
        dt2 = jnp.concatenate([dt, jnp.full(pad, 1.0)])
        mask2 = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
        st2 = imu.preintegrate(acc2, gyro2, dt2, mask2, CALIB)
        for a, b in zip(st1, st2):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_bias_jacobian_first_order(self):
        """Bias-corrected getters ~= reintegration at perturbed bias."""
        key = jax.random.PRNGKey(4)
        n = 80
        acc = jax.random.normal(key, (n, 3)) + jnp.array([0, 0, 9.8])
        gyro = jax.random.normal(jax.random.PRNGKey(5), (n, 3)) * 0.4
        dt = jnp.full(n, 0.005)
        mask = jnp.ones(n, bool)
        b0 = jnp.zeros(6)
        st = imu.preintegrate(acc, gyro, dt, mask, CALIB, b0)
        db = jnp.array([0.002, -0.001, 0.003, 0.01, 0.02, -0.015])
        st_new = imu.preintegrate(acc, gyro, dt, mask, CALIB, b0 + db)
        np.testing.assert_allclose(imu.delta_rotation(st, b0 + db), st_new.dR,
                                   atol=5e-4)
        np.testing.assert_allclose(imu.delta_velocity(st, b0 + db), st_new.dV,
                                   atol=5e-3)
        np.testing.assert_allclose(imu.delta_position(st, b0 + db), st_new.dP,
                                   atol=5e-3)

    def test_covariance_psd_and_growth(self):
        n = 100
        acc = jnp.tile(jnp.array([0.1, 0.0, 9.81]), (n, 1))
        gyro = jnp.tile(jnp.array([0.0, 0.05, 0.0]), (n, 1))
        dt = jnp.full(n, 0.005)
        st = imu.preintegrate(acc, gyro, dt, jnp.ones(n, bool), CALIB)
        C = np.asarray(st.C)
        np.testing.assert_allclose(C, C.T, atol=1e-10)
        eig = np.linalg.eigvalsh(C)
        assert eig.min() > -1e-12
        assert eig.max() > 0

    def test_predict_state_static(self):
        """Static body: prediction must return the same pose."""
        n = 100
        acc = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (n, 1))
        gyro = jnp.zeros((n, 3))
        dt = jnp.full(n, 0.005)
        st = imu.preintegrate(acc, gyro, dt, jnp.ones(n, bool), CALIB)
        R1, t1, v1 = jnp.eye(3), jnp.zeros(3), jnp.zeros(3)
        R2, t2, v2 = imu.predict_state(R1, t1, v1, jnp.zeros(6), st)
        np.testing.assert_allclose(R2, R1, atol=1e-5)
        np.testing.assert_allclose(t2, t1, atol=1e-3)
        np.testing.assert_allclose(v2, v1, atol=1e-3)
