"""Inertial-only initialization vs simulated trajectory ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import imu, lie
from orbslam3_tpu.solver import inertial

CALIB = imu.ImuCalib.create(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)
G = jnp.array([0.0, 0.0, -9.81])


def simulate(n_kf=12, kf_dt=0.5, hz=200, seed=0, bias=None,
             g_world=G, excitation=1.0):
    """Body on a smooth 3D trajectory; returns true poses/velocities and
    per-interval IMU measurements.  `excitation` scales the trajectory
    frequencies (scale observability needs acceleration excitation)."""
    rng = np.random.default_rng(seed)
    if bias is None:
        bias = np.zeros(6, np.float32)
    w_traj = np.array([0.05, 0.3, 0.1])  # slow attitude change
    # position spline: sum of sines
    amp = np.array([2.0, 1.0, 0.5])
    freq = np.array([0.3, 0.5, 0.7]) * excitation
    ph = rng.uniform(0, 2 * np.pi, 3)

    def pos(t):
        return amp * np.sin(freq * t + ph) + np.array([0.5, 0, 0]) * t

    def vel(t):
        return amp * freq * np.cos(freq * t + ph) + np.array([0.5, 0, 0])

    def acc_w(t):
        return -amp * freq * freq * np.sin(freq * t + ph)

    def rot(t):
        return np.asarray(lie.exp_so3(jnp.asarray(w_traj * t, jnp.float32)))

    n_per = int(kf_dt * hz)
    dt = 1.0 / hz
    Rs, ps, vs = [], [], []
    accs, gyrs = [], []
    for k in range(n_kf):
        t = k * kf_dt
        Rs.append(rot(t))
        ps.append(pos(t))
        vs.append(vel(t))
        if k < n_kf - 1:
            a_list, w_list = [], []
            for i in range(n_per):
                tm = t + (i + 0.5) * dt
                Rb = rot(tm)
                a_body = Rb.T @ (acc_w(tm) - np.asarray(g_world))
                a_list.append(a_body + bias[3:])
                w_list.append(w_traj + bias[:3])
            accs.append(np.asarray(a_list, np.float32))
            gyrs.append(np.asarray(w_list, np.float32))
    return (np.asarray(Rs, np.float32), np.asarray(ps, np.float32),
            np.asarray(vs, np.float32), accs, gyrs, dt)


def make_factors(accs, gyrs, dt):
    preints, ki, kj = [], [], []
    for k, (a, w) in enumerate(zip(accs, gyrs)):
        n = a.shape[0]
        st = imu.preintegrate(jnp.asarray(a), jnp.asarray(w),
                              jnp.full(n, dt), jnp.ones(n, bool), CALIB)
        preints.append(st)
        ki.append(k)
        kj.append(k + 1)
    return inertial.stack_preints(preints, ki, kj, capacity=len(preints))


class TestReferenceImuSteps:
    """Endpoint-interpolation parity with reference
    Tracking::PreintegrateIMU (src/Tracking.cc:243-283)."""

    def _signal(self, t):
        # linear vector signals: midpoint rule integrates these EXACTLY
        a = np.stack([2.0 * t + 1.0, -0.5 * t, 0.3 * t + 4.0])
        g = np.stack([0.1 * t, 0.2 * t - 1.0, -0.05 * t])
        return g.astype(np.float32), a.astype(np.float32)

    def _exact(self, t0, t1):
        # integral of the linear signal over [t0, t1]
        def I(k, c):
            return k * (t1 ** 2 - t0 ** 2) / 2 + c * (t1 - t0)
        a = np.array([I(2.0, 1.0), I(-0.5, 0.0), I(0.3, 4.0)])
        g = np.array([I(0.1, 0.0), I(0.2, -1.0), I(-0.05, 0.0)])
        return g, a

    def test_nonuniform_times_exact_for_linear_signal(self):
        from orbslam3_tpu.pipeline.inertial_system import reference_imu_steps
        rng = np.random.default_rng(3)
        t0, t1 = 0.1234, 0.8311
        # non-uniform interior times + one sample beyond t1
        times = np.sort(rng.uniform(t0 + 1e-3, t1, 9))
        t_next = t1 + 0.0137
        take = [(float(t), *self._signal(t)) for t in times]
        nxt = (float(t_next), *self._signal(t_next))
        acc, gyr, dts = reference_imu_steps(take, t0, t1, nxt)
        np.testing.assert_allclose(float(np.sum(dts)), t1 - t0, rtol=1e-6)
        g_exact, a_exact = self._exact(t0, t1)
        np.testing.assert_allclose(acc.T @ dts, a_exact, rtol=1e-4)
        np.testing.assert_allclose(gyr.T @ dts, g_exact, rtol=1e-4)

    def test_no_next_sample_extrapolates(self):
        from orbslam3_tpu.pipeline.inertial_system import reference_imu_steps
        rng = np.random.default_rng(4)
        t0, t1 = 0.0, 1.0
        times = np.sort(rng.uniform(0.01, 0.97, 8))
        take = [(float(t), *self._signal(t)) for t in times]
        acc, gyr, dts = reference_imu_steps(take, t0, t1, None)
        np.testing.assert_allclose(float(np.sum(dts)), t1 - t0, rtol=1e-6)
        g_exact, a_exact = self._exact(t0, t1)
        # linear extrapolation of the final segment keeps exactness
        np.testing.assert_allclose(acc.T @ dts, a_exact, rtol=1e-3)
        np.testing.assert_allclose(gyr.T @ dts, g_exact, rtol=1e-3)

    def test_degenerate_counts(self):
        from orbslam3_tpu.pipeline.inertial_system import reference_imu_steps
        assert reference_imu_steps([], 0.0, 0.1, None) is None
        g, a = self._signal(0.05)
        acc, gyr, dts = reference_imu_steps([(0.05, g, a)], 0.0, 0.1, None)
        # single sample: raw value over the whole interval (i==0==n-1)
        np.testing.assert_allclose(dts, [0.1], rtol=1e-6)
        np.testing.assert_allclose(acc[0], a, rtol=1e-6)


class TestInertialResidual:
    def test_zero_at_ground_truth(self):
        Rs, ps, vs, accs, gyrs, dt = simulate()
        f = make_factors(accs, gyrs, dt)
        for k in range(3):
            r = inertial.inertial_residual(
                f, k, jnp.asarray(Rs[k]), jnp.asarray(ps[k]), jnp.asarray(vs[k]),
                jnp.asarray(Rs[k + 1]), jnp.asarray(ps[k + 1]),
                jnp.asarray(vs[k + 1]), jnp.zeros(6), G)
            assert float(jnp.max(jnp.abs(r))) < 2e-2, (k, np.asarray(r))


class TestInertialInit:
    def test_recovers_scale_gravity_velocity(self):
        Rs, ps, vs, accs, gyrs, dt = simulate(seed=1)
        f = make_factors(accs, gyrs, dt)
        # mono SLAM frame: scale off by 1/s_true, gravity rotated by Rwg_true
        s_true = 3.7
        wg = jnp.array([0.15, -0.1, 0.0])
        Rwg_true = lie.exp_so3(wg)   # world = Rwg @ slam
        # slam poses: p_slam = Rwg^T p_world / s;  R_slam = Rwg^T R_world
        Rwb = jnp.einsum("ij,kjl->kil", Rwg_true.T, jnp.asarray(Rs))
        pwb = jnp.einsum("ij,kj->ki", Rwg_true.T, jnp.asarray(ps)) / s_true
        res = inertial.inertial_only_init(
            f, Rwb, pwb, jnp.ones(Rs.shape[0], bool), iterations=80)
        assert abs(float(res.scale) - s_true) / s_true < 0.05, float(res.scale)
        # recovered gravity in slam frame must match Rwg_true^T g_world
        g_est = res.Rwg @ jnp.array([0.0, 0.0, -9.81])
        g_true = Rwg_true.T @ jnp.array([0.0, 0.0, -9.81])
        cos = float(jnp.dot(g_est, g_true) /
                    (jnp.linalg.norm(g_est) * jnp.linalg.norm(g_true)))
        assert cos > 0.999, cos
        # velocities (slam frame, unscaled*s = world): v_slam = Rwg^T v_world
        v_true = jnp.einsum("ij,kj->ki", Rwg_true.T, jnp.asarray(vs))
        err = float(jnp.mean(jnp.linalg.norm(res.vel - v_true, axis=-1)))
        assert err < 0.1, err

    def test_recovers_gyro_bias(self):
        bias = np.array([0.02, -0.015, 0.01, 0.15, -0.1, 0.2], np.float32)
        Rs, ps, vs, accs, gyrs, dt = simulate(seed=2, bias=bias)
        f = make_factors(accs, gyrs, dt)
        res = inertial.inertial_only_init(
            f, jnp.asarray(Rs), jnp.asarray(ps),
            jnp.ones(Rs.shape[0], bool), iterations=80,
            prior_a=1e2, fix_scale=True)
        np.testing.assert_allclose(np.asarray(res.bias[:3]), bias[:3],
                                   atol=5e-3)
        # acc bias is weakly observable in short windows; loose check
        np.testing.assert_allclose(np.asarray(res.bias[3:]), bias[3:],
                                   atol=0.15)
